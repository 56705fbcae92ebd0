#!/usr/bin/env python
"""CLI driver — flag-compatible with ArtifactEvaluation/main.py.

Examples:
  python main.py --dataset synthetic --embedding_dim 16 \
      --compress_method cafe --compress_rate 0.01 --nepochs 1
  python main.py --dataset criteo --data_path /data/criteo \
      --embedding_dim 16 --compress_method cafe --compress_rate 0.001 \
      --cafe_sketch_threshold 500 --cafe_hash_rate 0.5 --learning_rate 0.1 \
      --mini_batch_size 128 --test_freq 30000
"""

from cafe_tpu.config import parse_args
from cafe_tpu.train.loop import run


def main():
    cfg = parse_args()
    run(cfg)


if __name__ == "__main__":
    main()
