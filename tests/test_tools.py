"""Tools: task-grid flattening, CU sketch, board reader, plots."""

import json
import os
import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from cafe_tpu.sketch.cu_sketch import (CUSketchConfig, cu_insert, cu_query,
                                       init_cu)
from cafe_tpu.tools.job_scheduler import load_tasks
from cafe_tpu.tools.visualization import (collect_method_runs,
                                          plot_metric_cr, run_summary)


class TestScheduler:
    def test_flatten_paired_lists(self, tmp_path):
        grid = {
            "base": {"dataset": "criteo", "embedding_dim": 16},
            "full": {"tensor_board_filename": "b/full"},
            "cafe": {
                "compress_method": "cafe",
                "tensor_board_filename": "b/cafe",
                "compress_rate": [0.1, 0.01],
                "cafe_sketch_threshold": [20, 100],
                "cafe_hash_rate": [0.5, 0.3],
            },
        }
        p = tmp_path / "g.json"
        p.write_text(json.dumps(grid))
        tasks = load_tasks(str(p))
        assert len(tasks) == 3
        assert tasks[0]["tensor_board_filename"] == "b/full"
        assert tasks[1]["compress_rate"] == 0.1
        assert tasks[1]["cafe_sketch_threshold"] == 20
        assert tasks[1]["cafe_hash_rate"] == 0.5
        assert tasks[1]["tensor_board_filename"] == "b/cafe0.1"
        assert tasks[2]["cafe_sketch_threshold"] == 100

    def test_generated_grids_load(self):
        root = osp.dirname(osp.dirname(osp.abspath(__file__)))
        tasks = load_tasks(osp.join(root, "tasks", "criteo.json"))
        # 1 full + 12 hash + 8 qr + 2 ada + 3 mde + 12 cafe + 4 off
        assert len(tasks) == 42
        cafes = [t for t in tasks if t.get("compress_method") == "cafe"]
        assert len(cafes) == 12
        # paired schedule: threshold rises as cr falls
        lowest = min(cafes, key=lambda t: t["compress_rate"])
        assert lowest["cafe_sketch_threshold"] == 500


class TestCUSketch:
    def test_frequency_estimation(self):
        cfg = CUSketchConfig(rows=4, width=512)
        st = init_cu(cfg)
        rng = np.random.default_rng(0)
        stream = rng.zipf(1.5, 20000).astype(np.int32) % 1000
        for lo in range(0, len(stream), 1000):
            st = cu_insert(cfg, st, jnp.asarray(stream[lo:lo + 1000]))
        true = np.bincount(stream, minlength=1000)
        top = np.argsort(-true)[:20]
        est = np.asarray(cu_query(cfg, st, jnp.asarray(top.astype(
            np.int32))))
        # CM/CU never underestimates; overestimate bounded on hot ids
        assert (est >= true[top] - 1e-5).all()
        rel = (est - true[top]) / np.maximum(true[top], 1)
        assert rel.mean() < 0.5

    def test_duplicates_in_batch(self):
        cfg = CUSketchConfig(rows=2, width=64)
        st = init_cu(cfg)
        st = cu_insert(cfg, st, jnp.asarray([7, 7, 7], jnp.int32))
        assert float(cu_query(cfg, st, jnp.asarray([7]))[0]) == \
            pytest.approx(3.0)


class TestBoardReader:
    def _write_run(self, d, aucs, losses):
        os.makedirs(d, exist_ok=True)
        with open(osp.join(d, "scalars.jsonl"), "w") as f:
            for i, a in enumerate(aucs):
                f.write(json.dumps({"tag": "roc_auc", "value": a,
                                    "step": (i + 1) * 100}) + "\n")
            for i, l in enumerate(losses):
                f.write(json.dumps({"tag": "Train/Loss", "value": l,
                                    "step": (i + 1) * 50}) + "\n")

    def test_summary_conventions(self, tmp_path):
        d = str(tmp_path / "cafe0.1")
        self._write_run(d, [0.7, 0.75, 0.74], [1.0, 0.6])
        s = run_summary(d)
        assert s["auc"] == 0.75       # second-to-last (board_reader.py:28)
        assert s["loss"] == pytest.approx(0.8)  # iteration-weighted

    def test_collect_and_plot(self, tmp_path):
        board = str(tmp_path / "board")
        for cr, auc in [(0.1, 0.74), (0.01, 0.72)]:
            self._write_run(osp.join(board, f"cafe{cr}"), [auc, auc],
                            [0.5])
        self._write_run(osp.join(board, "hash0.1"), [0.70, 0.70], [0.5])
        runs = collect_method_runs(board, "cafe")
        assert set(runs) == {0.1, 0.01}
        out = str(tmp_path / "fig.png")
        plot_metric_cr(board, out)
        assert osp.exists(out) and os.path.getsize(out) > 1000


class TestPallasGather:
    def test_matches_xla_gather_interpret(self):
        from cafe_tpu.ops.pallas_gather import pallas_gather
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(0, 1, (500, 16)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 500, 512).astype(np.int32))
        out = pallas_gather(table, ids, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]))


class TestExport:
    def test_export_roundtrip(self, tmp_path):
        from cafe_tpu.config import Config
        from cafe_tpu.data import make_synthetic_arrays
        from cafe_tpu.train.loop import build_all
        from cafe_tpu.tools.export_model import (export_eval_step,
                                                 load_and_run)
        data = make_synthetic_arrays(rows=2000, fields=4, vocab=500,
                                     dense=4)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.1, embedding_dim=8,
                     cafe_sketch_threshold=5)
        model, embed, state, _, eval_step = build_all(cfg, data)
        out = str(tmp_path / "model.stablehlo")
        n = export_eval_step(model, embed, state, 16, 4, 4, out)
        assert n > 1000
        rng = np.random.default_rng(0)
        dense = jnp.asarray(rng.normal(0, 1, (16, 4)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 500, (16, 4)).astype(np.int32))
        served = load_and_run(out, dense, ids)
        direct = eval_step(state, dense, ids)
        np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                                   atol=1e-5)
