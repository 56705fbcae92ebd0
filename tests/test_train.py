"""End-to-end training tests: learning, CAFE > hash at low memory,
checkpoint round-trip, all models, metric parity with sklearn."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from cafe_tpu.config import Config
from cafe_tpu.data import make_synthetic_arrays, batch_iterator
from cafe_tpu.data.datasets import CTRArrays
from cafe_tpu.embeddings import build_embedding_layer
from cafe_tpu.models import MODELS
from cafe_tpu.train import (
    binary_metrics,
    build_eval_step,
    build_train_step,
    init_state,
    roc_auc,
)
from cafe_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from cafe_tpu.train.loop import build_all, get_dataset, inference, model_arch


def _split(data, frac=6 / 7):
    cut = int(len(data) * frac)
    dense = data.dense
    return (
        CTRArrays(data.sparse[:cut],
                  None if dense is None else dense[:cut],
                  data.label[:cut], data.counts),
        CTRArrays(data.sparse[cut:],
                  None if dense is None else dense[cut:],
                  data.label[cut:], data.counts),
    )


def _train_eval(cfg, train, test, epochs=2, batch=256):
    model, embed, state, train_step, eval_step = build_all(cfg, train)
    for _ in range(epochs):
        for dense, sparse, label, valid in batch_iterator(
                train, batch, drop_last=True):
            dx = None if dense is None else jnp.asarray(dense)
            state, m = train_step(state, dx, jnp.asarray(sparse),
                                  jnp.asarray(label), valid)
    metrics, _ = inference(cfg, eval_step, state, test)
    return metrics, state


@pytest.fixture(scope="module")
def skewed_data():
    return make_synthetic_arrays(rows=30000, fields=4, vocab=20000,
                                 dense=4, zipf=1.3, seed=7)


class TestLearning:
    def test_full_embedding_learns(self, skewed_data):
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method=None,
                     embedding_dim=8, learning_rate=0.1,
                     test_mini_batch_size=4096)
        metrics, _ = _train_eval(cfg, train, test, epochs=6)
        assert metrics["roc_auc"] > 0.65

    def test_cafe_beats_hash_at_low_memory(self):
        """The headline claim (SIGMOD'24 metric-vs-cr figures): under a
        tight memory budget, routing hot ids to exclusive rows recovers
        quality that plain hashing loses to collisions. Config found by
        tools/sweep_cafe_vs_hash.py: delta +0.012..+0.015 across seeds."""
        data = make_synthetic_arrays(rows=60000, fields=4, vocab=20000,
                                     dense=4, zipf=1.2, seed=7)
        train, test = _split(data)
        base = Config(dataset="synthetic", embedding_dim=16,
                      learning_rate=0.1, compress_rate=0.003,
                      cafe_sketch_threshold=20.0, cafe_hash_rate=0.3,
                      test_mini_batch_size=4096)
        hash_cfg = dataclasses.replace(base, compress_method="hash")
        cafe_cfg = dataclasses.replace(base, compress_method="cafe")
        m_hash, _ = _train_eval(hash_cfg, train, test, epochs=8)
        m_cafe, st = _train_eval(cafe_cfg, train, test, epochs=8)
        assert m_cafe["roc_auc"] > m_hash["roc_auc"] + 0.005
        sk = st.embed["part0"]["sketch"]
        assert int((np.asarray(sk.dic) != 0).sum()) > 0  # hot pool in use

    def test_all_models_step(self, skewed_data):
        train, test = _split(skewed_data)
        for name in ["dlrm", "wdl", "dcn"]:
            cfg = Config(dataset="synthetic", model=name, embedding_dim=8,
                         learning_rate=0.05, compress_method=None)
            model, embed, state, train_step, _ = build_all(cfg, train)
            for dense, sparse, label, valid in batch_iterator(
                    train, 128, drop_last=True):
                state, m = train_step(state, jnp.asarray(dense),
                                      jnp.asarray(sparse),
                                      jnp.asarray(label), valid)
                break
            assert np.isfinite(float(m["loss"]))

    def test_adagrad_optimizer(self, skewed_data):
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", optimizer="adagrad",
                     embedding_dim=8, learning_rate=0.05,
                     compress_method="cafe", compress_rate=0.01,
                     cafe_sketch_threshold=20.0, test_mini_batch_size=4096)
        metrics, _ = _train_eval(cfg, train, test, epochs=1)
        assert np.isfinite(metrics["roc_auc"])

    def test_adam_optimizer(self, skewed_data):
        """Adam end-to-end: dense towers get dense Adam, the CAFE table
        rows-Adam (ops/sparse.py sparse_adam). Reference graphrec trains
        with Adam (PinSAGE/model.py:133); CTR drivers gain it as an extra
        beyond the reference's sgd/adagrad surface (main.py:268-275)."""
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", optimizer="adam",
                     embedding_dim=8, learning_rate=0.003,
                     compress_method="cafe", compress_rate=0.01,
                     cafe_sketch_threshold=20.0, test_mini_batch_size=4096)
        metrics, state = _train_eval(cfg, train, test, epochs=1)
        assert np.isfinite(metrics["roc_auc"])
        part = state.embed["part0"]
        assert int(part["table_t"]) > 0
        assert float(jnp.abs(part["table_m"]).max()) > 0.0


class TestAdamCheckpoint:
    def test_roundtrip_preserves_moments(self, tmp_path, skewed_data):
        """Adam slots (m/v/t on tables, (m,v,t) tree on towers) survive
        an orbax save/restore; predictions and the next step match."""
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.02, embedding_dim=8,
                     cafe_sketch_threshold=10.0, optimizer="adam",
                     learning_rate=0.003, test_mini_batch_size=4096)
        model, embed, state, train_step, eval_step = build_all(cfg, train)
        batches = list(batch_iterator(train, 256, drop_last=True))
        for i, (dense, sparse, label, valid) in enumerate(batches):
            state, _ = train_step(state, jnp.asarray(dense),
                                  jnp.asarray(sparse), jnp.asarray(label),
                                  valid)
            if i == 10:
                break
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, {"test_acc": 0.5, "epoch": 0,
                                      "iter": 11})
        _, _, fresh, step2, eval2 = build_all(cfg, train)
        restored, _ = load_checkpoint(path, fresh)
        assert int(restored.embed["part0"]["table_t"]) == 11
        np.testing.assert_array_equal(
            np.asarray(state.embed["part0"]["table_m"]),
            np.asarray(restored.embed["part0"]["table_m"]))
        # one more step from each must match exactly (moments intact)
        dense, sparse, label, valid = batches[11]
        s1, m1 = train_step(state, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), valid)
        s2, m2 = step2(restored, jnp.asarray(dense), jnp.asarray(sparse),
                       jnp.asarray(label), valid)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  abs=1e-7)
        np.testing.assert_allclose(
            np.asarray(s1.embed["part0"]["table"]),
            np.asarray(s2.embed["part0"]["table"]), atol=1e-7)


class TestRowsAdamMath:
    def test_matches_dense_adam_on_touched_rows(self):
        """sparse_adam == dense Adam restricted to touched rows (with
        table-global step count for bias correction)."""
        from cafe_tpu.ops.sparse import init_slots, sparse_adam
        rng = np.random.default_rng(0)
        N, D, lr, b1, b2, eps = 12, 4, 0.01, 0.9, 0.999, 1e-8
        table = rng.normal(size=(N, D)).astype(np.float32)
        t0 = jnp.asarray(table)
        sl = init_slots(t0, "adam")
        m, v, t = sl["m"], sl["v"], sl["t"]
        ref, rm, rv = table.copy(), np.zeros_like(table), np.zeros_like(table)
        for step in range(1, 5):
            idx = rng.integers(0, N, size=7).astype(np.int32)
            grad = rng.normal(size=(7, D)).astype(np.float32)
            t0, m, v, t = sparse_adam(t0, m, v, t, jnp.asarray(idx),
                                      jnp.asarray(grad), lr)
            coalesced = {}
            for i, g in zip(idx, grad):
                coalesced[int(i)] = coalesced.get(int(i), 0) + g
            for i, g in coalesced.items():
                rm[i] = b1 * rm[i] + (1 - b1) * g
                rv[i] = b2 * rv[i] + (1 - b2) * g * g
                ref[i] -= lr * (rm[i] / (1 - b1 ** step)) / (
                    np.sqrt(rv[i] / (1 - b2 ** step)) + eps)
        assert int(t) == 4
        np.testing.assert_allclose(np.asarray(t0), ref, atol=2e-6)

    def test_untouched_rows_frozen(self):
        from cafe_tpu.ops.sparse import init_slots, sparse_adam
        t0 = jnp.ones((8, 3), jnp.float32)
        sl = init_slots(t0, "adam")
        idx = jnp.asarray([2, 2, 5], jnp.int32)
        g = jnp.ones((3, 3), jnp.float32)
        t1, m, v, t = sparse_adam(t0, sl["m"], sl["v"], sl["t"], idx, g,
                                  0.1)
        changed = np.abs(np.asarray(t1 - t0)).sum(axis=1) > 0
        assert changed.tolist() == [False, False, True, False, False,
                                    True, False, False]
        assert np.abs(np.asarray(m)[[0, 1, 3, 4, 6, 7]]).max() == 0.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, skewed_data):
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.02, embedding_dim=8,
                     cafe_sketch_threshold=10.0, learning_rate=0.1,
                     test_mini_batch_size=4096)
        model, embed, state, train_step, eval_step = build_all(cfg, train)
        for i, (dense, sparse, label, valid) in enumerate(
                batch_iterator(train, 256, drop_last=True)):
            state, _ = train_step(state, jnp.asarray(dense),
                                  jnp.asarray(sparse), jnp.asarray(label),
                                  valid)
            if i == 20:
                break
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, {"test_acc": 0.5, "epoch": 0, "iter": 21})
        _, _, fresh, _, eval_step2 = build_all(cfg, train)
        restored, extra = load_checkpoint(path, fresh)
        assert extra["iter"] == 21
        dense, sparse, label, valid = next(iter(batch_iterator(test, 512)))
        p1 = eval_step(state, jnp.asarray(dense), jnp.asarray(sparse))
        p2 = eval_step2(restored, jnp.asarray(dense), jnp.asarray(sparse))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
        # sketch state survived: same hot routing
        sk1 = state.embed["part0"]["sketch"]
        sk2 = restored.embed["part0"]["sketch"]
        assert (np.asarray(sk1.dic) == np.asarray(sk2.dic)).all()
        assert int(sk1.free_top) == int(sk2.free_top)


class TestMetrics:
    def test_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(0)
        y = rng.integers(0, 2, 1000)
        s = np.clip(rng.normal(0.5, 0.2, 1000) + 0.1 * y, 0, 1)
        m = binary_metrics(y, s)
        assert m["roc_auc"] == pytest.approx(
            sklearn.roc_auc_score(y, s), abs=1e-9)
        assert m["ap"] == pytest.approx(
            sklearn.average_precision_score(y, s), abs=1e-9)
        assert m["f1"] == pytest.approx(
            sklearn.f1_score(y, np.round(s)), abs=1e-9)

    def test_auc_with_ties(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        y = np.array([0, 1, 1, 0, 1, 0, 0, 1])
        s = np.array([0.5, 0.5, 0.8, 0.2, 0.5, 0.5, 0.1, 0.9])
        assert roc_auc(y, s) == pytest.approx(
            sklearn.roc_auc_score(y, s), abs=1e-12)


class TestModelArch:
    def test_reference_shapes(self):
        cfg = Config(dataset="criteo", embedding_dim=16)
        ln_bot, ln_top = model_arch(cfg, 13, 26)
        assert ln_bot == [13, 512, 256, 64, 16]
        num_int = 27 * 26 // 2 + 16
        assert ln_top == [num_int, 512, 256, 1]
        cfg = Config(dataset="criteotb", embedding_dim=128)
        ln_bot, ln_top = model_arch(cfg, 13, 26)
        assert ln_bot == [13, 512, 256, 128]
        assert ln_top == [27 * 26 // 2 + 128, 1024, 1024, 512, 256, 1]


class TestLrSchedule:
    def test_policy_shape(self):
        import jax.numpy as jnp
        from cafe_tpu.train.lr_schedule import lr_policy
        base = 1.0
        # torch's scheduler sees _step_count = step+1: the FIRST step
        # trains at base/warm (never 0) — dlrm_s_pytorch.py:184-188
        assert float(lr_policy(base, jnp.asarray(0), 10, 100, 50)) == \
            pytest.approx(0.1)
        assert float(lr_policy(base, jnp.asarray(4), 10, 100, 50)) == \
            pytest.approx(0.5)
        # plateau holds the LAST warmup value base*(warm-1)/warm, not
        # base (the reference's last_lr freeze, :199-203)
        assert float(lr_policy(base, jnp.asarray(50), 10, 100, 50)) == \
            pytest.approx(0.9)
        # quadratic decay: step 124 -> s1=125, decayed=25, (25/50)^2
        assert float(lr_policy(base, jnp.asarray(124), 10, 100, 50)) == \
            pytest.approx(0.25)
        # frozen after decay end
        after = float(lr_policy(base, jnp.asarray(200), 10, 100, 50))
        assert after == pytest.approx((1 / 50) ** 2, rel=1e-3)
        # no decay configured: plateau is base itself ("do not adjust")
        assert float(lr_policy(base, jnp.asarray(50), 10, 100, 0)) == \
            pytest.approx(1.0)

    def test_scheduled_training_runs(self, skewed_data):
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method=None,
                     embedding_dim=8, learning_rate=0.1,
                     lr_num_warmup_steps=5, lr_decay_start_step=20,
                     lr_num_decay_steps=20)
        model, embed, state, train_step, _ = build_all(cfg, train)
        from cafe_tpu.data import batch_iterator
        import jax.numpy as jnp
        for i, (dense, sparse, label, valid) in enumerate(
                batch_iterator(train, 128, drop_last=True)):
            state, m = train_step(state, jnp.asarray(dense),
                                  jnp.asarray(sparse),
                                  jnp.asarray(label), valid)
            if i == 30:
                break
        assert np.isfinite(float(m["loss"]))


class TestQuantizedInference:
    def test_roundtrip_error_bounds(self):
        import jax.numpy as jnp
        from cafe_tpu.ops.quantized import (dequantize_rows,
                                            quantize_rowwise)
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(0, 0.1, (64, 16)).astype(np.float32))
        for bits, tol in [(8, 0.002), (4, 0.05)]:
            qt = quantize_rowwise(table, bits)
            idx = jnp.arange(64)
            err = np.abs(np.asarray(dequantize_rows(qt, idx) - table))
            assert err.max() < tol

    def test_int4_packing(self):
        import jax.numpy as jnp
        from cafe_tpu.ops.quantized import (dequantize_rows,
                                            quantize_rowwise)
        table = jnp.asarray(np.arange(32, dtype=np.float32).reshape(2, 16))
        qt = quantize_rowwise(table, 4)
        # packed row layout: 8 nibble-pair bytes + 4 scale + 4 zero
        # bytes (ops/quantized.py module doc)
        assert qt.codes.shape == (2, 16) and qt.codes.dtype == jnp.uint8
        out = dequantize_rows(qt, jnp.asarray([0, 1]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(table),
                                   atol=0.6)


class TestQuantizedEvalStep:
    @pytest.mark.parametrize("method,cr", [
        ("hash", 0.1), ("qr", 0.1), ("mde", 0.1), ("off", 0.1),
        ("ada", 0.5), ("full", 1.0),
    ])
    def test_quantized_predictions_close(self, skewed_data, method, cr):
        """int8 serving is table-type-agnostic, like the reference's
        quantized EmbeddingBag path (dlrm_s_pytorch.py:759-777)."""
        from cafe_tpu.train.step import build_quantized_eval_step
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method=method,
                     compress_rate=cr, embedding_dim=8, learning_rate=0.1)
        model, embed, state, train_step, eval_step = build_all(cfg, train)
        for i, (dense, sparse, label, valid) in enumerate(
                batch_iterator(train, 256, drop_last=True)):
            state, _ = train_step(state, jnp.asarray(dense),
                                  jnp.asarray(sparse),
                                  jnp.asarray(label), valid)
            if i == 10:
                break
        q8 = build_quantized_eval_step(model, embed, state, 8)
        dense, sparse, label, valid = next(iter(batch_iterator(test, 512)))
        p_full = np.asarray(eval_step(state, jnp.asarray(dense),
                                      jnp.asarray(sparse)))
        p_q8 = np.asarray(q8(state, jnp.asarray(dense),
                             jnp.asarray(sparse)))
        assert np.abs(p_full - p_q8).mean() < 0.01

    def test_quantized_cafe_serving(self, skewed_data):
        """int8 serving of the unified CAFE table: sketch routing stays
        full-precision, rows dequantize on-chip; predictions track the
        float eval path."""
        from cafe_tpu.train.step import build_quantized_eval_step
        train, test = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.01, cafe_sketch_threshold=5.0,
                     cafe_hash_rate=0.3, embedding_dim=8, learning_rate=0.1)
        model, embed, state, train_step, eval_step = build_all(cfg, train)
        for i, (dense, sparse, label, valid) in enumerate(
                batch_iterator(train, 256, drop_last=True)):
            state, _ = train_step(state, jnp.asarray(dense),
                                  jnp.asarray(sparse),
                                  jnp.asarray(label), valid)
            if i == 10:
                break
        q8 = build_quantized_eval_step(model, embed, state, 8)
        dense, sparse, label, valid = next(iter(batch_iterator(test, 512)))
        p_full = np.asarray(eval_step(state, jnp.asarray(dense),
                                      jnp.asarray(sparse)))
        p_q8 = np.asarray(q8(state, jnp.asarray(dense),
                             jnp.asarray(sparse)))
        assert np.abs(p_full - p_q8).mean() < 0.01


class TestMultiStepDispatch:
    def test_k_steps_equal_one_dispatch(self, skewed_data):
        """build_multi_step(k) must produce bit-equal state to k sequential
        single steps over the same batches."""
        from cafe_tpu.train.step import build_multi_step
        train, _ = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.01, cafe_sketch_threshold=5.0,
                     embedding_dim=8, learning_rate=0.1)
        model, embed, state, train_step, _ = build_all(cfg, train)
        k = 4
        b = 64
        it = iter(batch_iterator(train, b, drop_last=True))
        batches = [next(it) for _ in range(k)]

        # train_step donates its state arg (config default): run the
        # sequential arm on a COPY so `state` survives for the k-step arm
        import jax
        s1 = jax.tree.map(jnp.copy, state)
        for dense, sparse, label, valid in batches:
            s1, m1 = train_step(s1, jnp.asarray(dense), jnp.asarray(sparse),
                                jnp.asarray(label), valid)

        multi = build_multi_step(train_step, k)
        dense_k = jnp.concatenate([jnp.asarray(x[0]) for x in batches])
        ids_k = jnp.concatenate([jnp.asarray(x[1]) for x in batches])
        lab_k = jnp.concatenate([jnp.asarray(x[2]) for x in batches])
        s2, m2 = multi(state, dense_k, ids_k, lab_k,
                       jnp.asarray(k * b, jnp.int32))
        import jax
        for l1, l2 in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-6, atol=1e-7)
        assert np.isfinite(float(m2["loss"]))
        # fraction-style diagnostics stay fractions after k-step summing
        assert 0.0 <= float(m2["cafe_hot_frac"]) <= 1.0

    def test_resume_mid_dispatch_exact(self, tmp_path, skewed_data):
        """Checkpoint at an iter that is NOT a multiple of the resuming
        run's steps_per_dispatch, resume with k=4 via start_row, and land
        bit-equal with an uninterrupted single-step run (the old
        skip_batch // k rounding replayed up to k-1 batches)."""
        from cafe_tpu.train.step import build_multi_step
        train, _ = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method="cafe",
                     compress_rate=0.01, cafe_sketch_threshold=5.0,
                     embedding_dim=8, learning_rate=0.1)
        model, embed, state, train_step, _ = build_all(cfg, train)
        b, k, stop, total = 64, 4, 11, 27
        # train_step donates its state arg (config default): each run
        # gets its own copy of the initial state
        import jax
        s_ref = jax.tree.map(jnp.copy, state)
        it = batch_iterator(train, b, drop_last=True)
        for i, (dense, sparse, label, valid) in enumerate(it):
            if i == total:
                break
            s_ref, _ = train_step(s_ref, jnp.asarray(dense),
                                  jnp.asarray(sparse), jnp.asarray(label),
                                  valid)
        # interrupted run: stop after 11 steps (not a multiple of 4), save
        s = jax.tree.map(jnp.copy, state)
        it = batch_iterator(train, b, drop_last=True)
        for i, (dense, sparse, label, valid) in enumerate(it):
            if i == stop:
                break
            s, _ = train_step(s, jnp.asarray(dense), jnp.asarray(sparse),
                              jnp.asarray(label), valid)
        path = str(tmp_path / "mid")
        save_checkpoint(path, s, {"test_acc": 0.0, "epoch": 0, "iter": stop})
        _, _, fresh, _, _ = build_all(cfg, train)
        s2, extra = load_checkpoint(path, fresh)
        # resume with k=4 dispatches offset by start_row = iter * b
        multi = build_multi_step(train_step, k)
        it = batch_iterator(train, k * b, start_row=extra["iter"] * b,
                            drop_last=True)
        done = stop
        for dense, sparse, label, valid in it:
            if done + k > total:
                break
            s2, _ = multi(s2, jnp.asarray(dense), jnp.asarray(sparse),
                          jnp.asarray(label), jnp.asarray(valid, jnp.int32))
            done += k
        # drain the ragged tail (total - done < k) with single steps
        it = batch_iterator(train, b, start_row=done * b, drop_last=True)
        for dense, sparse, label, valid in it:
            if done == total:
                break
            s2, _ = train_step(s2, jnp.asarray(dense), jnp.asarray(sparse),
                               jnp.asarray(label), valid)
            done += 1
        import jax
        for l1, l2 in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-6, atol=1e-7)

    def test_zero_weight_subbatch_no_nan(self, skewed_data):
        from cafe_tpu.train.step import build_multi_step
        train, _ = _split(skewed_data)
        cfg = Config(dataset="synthetic", compress_method=None,
                     embedding_dim=8, learning_rate=0.1)
        model, embed, state, train_step, _ = build_all(cfg, train)
        multi = build_multi_step(train_step, 4)
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, 256, drop_last=True)))
        # only 100 valid rows -> sub-batches 2..4 are pure padding
        s2, m = multi(state, jnp.asarray(dense), jnp.asarray(sparse),
                      jnp.asarray(label), jnp.asarray(100, jnp.int32))
        assert np.isfinite(float(m["loss"]))


class TestTowerLearning:
    """WDL and DCN must actually LEARN, not just step (their gradients are
    heavily attenuated by the reference-faithful double-sigmoid / tiny
    cross-weight inits, so plain SGD at DLRM's lr looks flat; adagrad is
    the sparse-appropriate optimizer)."""

    @pytest.mark.parametrize("model", ["wdl", "dcn"])
    def test_learns_with_adagrad(self, model):
        cfg = Config(dataset="synthetic", model=model, embedding_dim=16,
                     synthetic_rows=30000, synthetic_fields=4,
                     synthetic_vocab=8000, synthetic_dense=4,
                     synthetic_zipf=1.3, learning_rate=0.05,
                     optimizer="adagrad", mini_batch_size=256,
                     compress_method=None, test_mini_batch_size=4096)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        test = get_dataset(cfg, "test")
        _, _, state, ts, es = build_all(cfg, train)
        for _ in range(3):
            for dense, sparse, label, valid in batch_iterator(
                    train, 256, drop_last=True):
                state, _ = ts(state, jnp.asarray(dense),
                              jnp.asarray(sparse), jnp.asarray(label),
                              valid)
        m, _ = inference(cfg, es, state, test)
        assert m["roc_auc"] > 0.58, m["roc_auc"]


def test_throughput_mode_cycles_small_test_sets(skewed_data):
    """The latency protocol (10 warmup + 1014 timed batches) must work
    even when the test set has fewer batches than the warmup count —
    regression for a crash when t_start was never set."""
    train, test = _split(skewed_data)
    cfg = Config(dataset="synthetic", compress_method=None,
                 embedding_dim=8, learning_rate=0.1,
                 test_mini_batch_size=2048)  # test set => ~3 batches
    model, embed, state, train_step, eval_step = build_all(cfg, train)
    _, ms = inference(cfg, eval_step, state, test, throughput=True)
    assert ms > 0.0
