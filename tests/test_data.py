"""Data layer tests: binary format round-trip, split semantics, batching."""

import numpy as np
import pytest

from cafe_tpu.data import (
    batch_iterator,
    load_dataset,
    make_synthetic_arrays,
    num_batches,
    write_synthetic_dataset,
)
from cafe_tpu.data.datasets import generate_hot_features
from cafe_tpu.data.preprocess import StreamingEncoder


def test_synthetic_shapes():
    a = make_synthetic_arrays(rows=1000, fields=5, vocab=50, dense=3, seed=1)
    assert a.sparse.shape == (1000, 5)
    assert a.dense.shape == (1000, 3)
    assert a.label.shape == (1000,)
    assert (a.counts == 50).all()
    assert a.sparse.max() < 50 and a.sparse.min() >= 0
    assert set(np.unique(a.label)) <= {0, 1}


def test_synthetic_is_skewed():
    a = make_synthetic_arrays(rows=20000, fields=1, vocab=1000, zipf=1.3)
    counts = np.bincount(a.sparse[:, 0], minlength=1000)
    top = np.sort(counts)[-10:].sum()
    assert top > 0.3 * counts.sum()  # top-1% of ids dominate


def test_roundtrip_and_criteo_split(tmp_path):
    path = str(tmp_path / "ds")
    a = write_synthetic_dataset(path, rows=700, fields=26, vocab=100,
                                dense=13, seed=2)
    train = load_dataset("criteo", path, "train")
    test = load_dataset("criteo", path, "test")
    assert len(train) == 700 * 6 // 7
    assert len(train) + len(test) == 700
    np.testing.assert_array_equal(np.asarray(train.sparse[0]), a.sparse[0])
    np.testing.assert_array_equal(np.asarray(test.label),
                                  a.label[700 * 6 // 7:])


def test_kdd12_split_disjoint(tmp_path):
    path = str(tmp_path / "ds")
    write_synthetic_dataset(path, rows=500, fields=11, vocab=40, dense=0)
    train = load_dataset("kdd12", path, "train")
    test = load_dataset("kdd12", path, "test")
    assert len(test) == 50
    assert len(train) == 450
    assert not (set(train.index.tolist()) & set(test.index.tolist()))


def test_batch_iterator_padding(tmp_path):
    path = str(tmp_path / "ds")
    write_synthetic_dataset(path, rows=700, fields=4, vocab=30, dense=2)
    data = load_dataset("criteo", path, "train") if False else None
    a = make_synthetic_arrays(rows=130, fields=4, vocab=30, dense=2)
    batches = list(batch_iterator(a, 64))
    assert len(batches) == num_batches(a, 64) == 3
    dense, sparse, label, valid = batches[-1]
    assert sparse.shape == (64, 4) and dense.shape == (64, 2)
    assert valid == 130 - 128
    total = sum(v for _, _, _, v in batches)
    assert total == 130


def test_batch_iterator_drop_last():
    a = make_synthetic_arrays(rows=130, fields=4, vocab=30, dense=0)
    batches = list(batch_iterator(a, 64, drop_last=True))
    assert len(batches) == 2
    assert all(v == 64 for _, _, _, v in batches)
    assert batches[0][0] is None  # no dense


def test_hot_features_offline(tmp_path):
    path = str(tmp_path / "ds")
    write_synthetic_dataset(path, rows=5000, fields=3, vocab=200, dense=0,
                            zipf=1.3)
    data = load_dataset("criteo", path, "train") if False else None
    from cafe_tpu.data.datasets import CTRArrays
    a = make_synthetic_arrays(rows=5000, fields=3, vocab=200, dense=0,
                              zipf=1.3)
    a_path = str(tmp_path / "hot")
    import os
    os.makedirs(a_path, exist_ok=True)
    hot = generate_hot_features(a, a_path, threshold=10,
                                compress_rate=0.2, hash_rate=0.5)
    total_hot = sum((h >= 0).sum() for h in hot.values())
    expect = int(3 * 200 * 0.2 * 0.5)
    assert total_hot == expect
    # hot ids should be the most frequent ones per field overall
    counts0 = np.bincount(a.sparse[:, 0], minlength=200)
    hot0 = np.nonzero(hot[0] >= 0)[0]
    if len(hot0):
        assert counts0[hot0].min() >= np.sort(counts0)[-len(hot0) * 3]


def test_streaming_encoder(tmp_path):
    raw = tmp_path / "raw.tsv"
    rows = [
        "1\t3\t\tfoo\tbar",
        "0\t\t2\tfoo\tbaz",
        "1\t1\t5\tqux\tbar",
    ]
    raw.write_text("\n".join(rows) + "\n")
    enc = StreamingEncoder(num_dense=2, num_sparse=2, sep="\t")
    enc.collect(str(raw))
    out = str(tmp_path / "out")
    enc.encode([str(raw)], out)
    sparse = np.fromfile(out + "/processed_sparse_sep.bin",
                         dtype=np.int32).reshape(3, 2)
    dense = np.fromfile(out + "/processed_dense.bin",
                        dtype=np.float32).reshape(3, 2)
    label = np.fromfile(out + "/processed_label.bin", dtype=np.int32)
    counts = np.fromfile(out + "/processed_count.bin", dtype=np.int32)
    assert label.tolist() == [1, 0, 1]
    assert counts.tolist() == [2, 2]
    # sklearn-LabelEncoder parity: ids in SORTED unique-value order
    # field0 uniques sorted: [foo, qux]; field1: [bar, baz]
    assert sparse[0].tolist() == [0, 0]   # foo, bar
    assert sparse[1].tolist() == [0, 1]   # foo, baz
    assert sparse[2].tolist() == [1, 0]   # qux, bar
    assert dense[0, 0] == pytest.approx(np.log1p(3.0))
    assert dense[0, 1] == 0.0  # missing -> 0


def test_streaming_encoder_missing_sparse_is_string_zero(tmp_path):
    """Missing sparse cells encode as the string "0" (pandas
    fillna("0"), process_data.py:79), merging with a real "0" value."""
    raw = tmp_path / "raw.tsv"
    raw.write_text("1\t1\t0\n0\t1\t\n0\t1\tz\n")
    enc = StreamingEncoder(num_dense=1, num_sparse=1, sep="\t")
    enc.collect(str(raw))
    out = str(tmp_path / "out")
    enc.encode([str(raw)], out)
    sparse = np.fromfile(out + "/processed_sparse_sep.bin", dtype=np.int32)
    counts = np.fromfile(out + "/processed_count.bin", dtype=np.int32)
    assert counts.tolist() == [2]            # {"0", "z"}
    assert sparse.tolist() == [0, 0, 1]       # missing == "0"


def test_preprocess_cli_criteotb_day_files(tmp_path):
    """--dataset criteotb produces the per-day binary layout with a global
    vocabulary, loadable by _load_criteotb's file naming."""
    from cafe_tpu.data.preprocess import main as pp_main
    rng = np.random.default_rng(0)
    days = []
    for d in range(2):
        p = tmp_path / f"day_{d}.txt"
        with open(p, "w") as f:
            for _ in range(50):
                label = str(rng.integers(0, 2))
                dense = [str(int(rng.integers(0, 9))) for _ in range(13)]
                cats = [format(int(rng.integers(0, 20)), "x")
                        for _ in range(26)]
                f.write("\t".join([label] + dense + cats) + "\n")
        days.append(str(p))
    out = tmp_path / "bin"
    pp_main(["--dataset", "criteotb", "--input", *days,
             "--output", str(out)])
    counts = np.fromfile(out / "processed_count.bin", dtype=np.int32)
    assert counts.shape == (26,)
    for d in range(2):
        sp = np.fromfile(out / f"sparse_{d}_sep.bin", dtype=np.int32)
        assert sp.shape == (50 * 26,)
        # global vocab: every id under its field's count
        assert (sp.reshape(50, 26) < counts[None, :]).all()
        assert np.fromfile(out / f"label_{d}.bin", dtype=np.int32).shape \
            == (50,)
        assert np.fromfile(out / f"dense_{d}.bin",
                           dtype=np.float32).shape == (50 * 13,)


def test_preprocess_cli_rejects_multi_input_for_single_file_sets(tmp_path):
    from cafe_tpu.data.preprocess import main as pp_main
    a = tmp_path / "a.txt"
    a.write_text("0\t1\t2\n")
    with pytest.raises(SystemExit):
        pp_main(["--dataset", "criteo", "--input", str(a), str(a),
                 "--output", str(tmp_path / "o")])


def test_process_batch_iterator_matches_global_slices():
    """process_batch_iterator (per-process memmap reads) must reproduce
    batch_iterator's global batches sliced by process — including the
    padded tail batch, whose padding repeats the GLOBAL batch's first
    row."""
    from cafe_tpu.data import make_synthetic_arrays
    from cafe_tpu.data.datasets import batch_iterator, process_batch_iterator
    data = make_synthetic_arrays(rows=1000, fields=3, vocab=500,
                                 dense=5, seed=7)
    B, nproc = 128, 4
    globals_ = list(batch_iterator(data, B))
    for pid in range(nproc):
        locals_ = list(process_batch_iterator(data, B, pid, nproc))
        assert len(locals_) == len(globals_)
        per = B // nproc
        for (gd, gs, gl, gv), (ld, ls, ll, lv) in zip(globals_, locals_):
            assert lv == gv
            lo, hi = pid * per, (pid + 1) * per
            np.testing.assert_array_equal(ls, gs[lo:hi])
            np.testing.assert_array_equal(ll, gl[lo:hi])
            np.testing.assert_array_equal(ld, gd[lo:hi])


def test_process_batch_iterator_with_index_and_mod_range():
    """The per-process iterator must honor the dataset's OWN access path:
    index permutation splits (kdd12) and --max_ind_range hashing."""
    from cafe_tpu.data import make_synthetic_arrays
    from cafe_tpu.data.datasets import (CTRArrays, batch_iterator,
                                        process_batch_iterator)
    base = make_synthetic_arrays(rows=600, fields=3, vocab=700, dense=4,
                                 seed=11)
    rng = np.random.default_rng(3)
    perm = rng.permutation(600)
    data = CTRArrays(base.sparse, base.dense, base.label, base.counts,
                     index=perm, mod_range=127)
    B, nproc = 64, 2
    globals_ = list(batch_iterator(data, B))
    for pid in range(nproc):
        locals_ = list(process_batch_iterator(data, B, pid, nproc))
        per = B // nproc
        assert len(locals_) == len(globals_)
        for (gd, gs, gl, gv), (ld, ls, ll, lv) in zip(globals_, locals_):
            assert lv == gv
            lo, hi = pid * per, (pid + 1) * per
            np.testing.assert_array_equal(ls, gs[lo:hi])
            np.testing.assert_array_equal(ll, gl[lo:hi])
            np.testing.assert_array_equal(ld, gd[lo:hi])
            assert ls.max() < 127


def test_process_batch_iterator_multifile_fully_padded_slice():
    """Multi-file (criteotb-style) datasets must survive a process whose
    tail slice falls ENTIRELY in the global batch's padding: read_rows is
    then asked for an empty range and must return typed 0-row arrays
    (regression: IndexError at the last batch of every multi-host epoch)."""
    from cafe_tpu.data import make_synthetic_arrays
    from cafe_tpu.data.datasets import (_MultiFileCTRArrays, batch_iterator,
                                        process_batch_iterator)
    base = make_synthetic_arrays(rows=10, fields=3, vocab=50, dense=4,
                                 seed=5)
    data = _MultiFileCTRArrays(
        [base.sparse[:6], base.sparse[6:]],
        [base.dense[:6], base.dense[6:]],
        [base.label[:6], base.label[6:]],
        base.counts, max_ind_range=-1)
    B, nproc = 8, 4  # final batch: glo=8, valid=2 -> pids 1..3 all-padding
    globals_ = list(batch_iterator(data, B))
    per = B // nproc
    for pid in range(nproc):
        locals_ = list(process_batch_iterator(data, B, pid, nproc))
        assert len(locals_) == len(globals_)
        for (gd, gs, gl, gv), (ld, ls, ll, lv) in zip(globals_, locals_):
            assert lv == gv
            lo, hi = pid * per, (pid + 1) * per
            np.testing.assert_array_equal(ls, gs[lo:hi])
            np.testing.assert_array_equal(ll, gl[lo:hi])
            np.testing.assert_array_equal(ld, gd[lo:hi])
