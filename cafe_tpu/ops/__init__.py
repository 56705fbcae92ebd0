from .sparse import coalesce, sparse_sgd, sparse_adagrad, segment_rows

__all__ = ["coalesce", "sparse_sgd", "sparse_adagrad", "segment_rows"]
