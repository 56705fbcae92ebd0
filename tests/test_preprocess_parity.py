"""Byte-for-byte parity of cafe_tpu.data.preprocess with the reference
encoder (ArtifactEvaluation/datasets/process_data.py) on the Criteo
one-shot path.

Strategy (round-3 verdict item 5): build a Kaggle-format raw fixture,
run the REFERENCE CriteoDataset.process_data (pandas + sklearn, no
torch) and our streaming encoder on the same file, and assert the four
output binaries are identical bytes. This converts "format-compatible by
construction" into a test — the strongest real-data statement available
in a dataset-less environment.

Skips when /root/reference (or pandas/sklearn) is absent.
"""

import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/ArtifactEvaluation/datasets"
REF_SCRIPT = osp.join(REF_DIR, "process_data.py")

pytestmark = pytest.mark.skipif(
    not osp.exists(REF_SCRIPT), reason="reference checkout not present")


def _load_reference_module():
    pytest.importorskip("pandas")
    pytest.importorskip("sklearn")
    spec = importlib.util.spec_from_file_location("ref_process_data",
                                                  REF_SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_process_data"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_fixture(path, rows=20000, seed=0):
    """Kaggle-format TSV: label \t 13 dense \t 26 hex categoricals, with
    missing cells in both dense and sparse columns (the reference maps
    dense NaN -> 0 and sparse NaN -> "0"). Sparse values carry a leading
    letter so pandas keeps the columns dtype=object (str), where sklearn's
    sorted-order encoding and ours agree — the Criteo-hex regime."""
    rng = np.random.default_rng(seed)
    vocab_sizes = [3, 50, 1000, 7, 200] * 5 + [30]
    with open(path, "w") as f:
        for _ in range(rows):
            cols = [str(rng.integers(0, 2))]
            for j in range(13):
                if rng.random() < 0.1:
                    cols.append("")                      # missing dense
                else:
                    # ints like the real dataset; includes 0 and negatives
                    cols.append(str(int(rng.integers(-2, 1000))))
            for v in vocab_sizes:
                if rng.random() < 0.05:
                    cols.append("")                      # missing sparse
                else:
                    cols.append("f" + format(int(rng.integers(0, v)), "07x"))
            f.write("\t".join(cols) + "\n")


def test_criteo_bytes_match_reference(tmp_path):
    raw = tmp_path / "ref" / "train.txt"
    raw.parent.mkdir()
    (tmp_path / "ours").mkdir()
    _write_fixture(str(raw))

    # reference encoder writes next to its input path
    ref = _load_reference_module()
    ds = ref.CriteoDataset(str(raw.parent))
    ds.process_data()

    from cafe_tpu.data.preprocess import process_criteo
    process_criteo(str(raw), str(tmp_path / "ours"))

    for name in ("processed_count.bin", "processed_label.bin",
                 "processed_sparse_sep.bin", "processed_dense.bin"):
        ref_bytes = (raw.parent / name).read_bytes()
        our_bytes = (tmp_path / "ours" / name).read_bytes()
        assert ref_bytes == our_bytes, (
            f"{name}: {len(ref_bytes)} vs {len(our_bytes)} bytes, "
            f"first diff at "
            f"{next((i for i, (a, b) in enumerate(zip(ref_bytes, our_bytes)) if a != b), -1)}")

    # sanity: the fixture actually exercised the interesting branches
    counts = np.fromfile(tmp_path / "ours" / "processed_count.bin",
                         dtype=np.int32)
    assert counts.shape == (26,) and (counts > 1).all()
    dense = np.fromfile(tmp_path / "ours" / "processed_dense.bin",
                        dtype=np.float32)
    assert (dense == 0).any() and (dense > 0).any()
