"""CAFE+ two-tier sketch tests: staging graduation, LRU displacement,
adaptive threshold reset, lazy decay, end-to-end with CafePart."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cafe_tpu.sketch.hotsketch import INVALID_ID
from cafe_tpu.sketch.hotsketch_plus import (
    CafePlusConfig,
    init_sketch_plus,
    sketch_insert_plus,
    sketch_query_plus,
)


def pad_ids(ids, scores, width):
    out_i = np.full(width, INVALID_ID, dtype=np.int32)
    out_s = np.zeros(width, dtype=np.float32)
    out_i[: len(ids)] = ids
    out_s[: len(ids)] = scores
    return jnp.asarray(out_i), jnp.asarray(out_s)


class TestTwoTier:
    def test_new_ids_enter_staging_not_main(self):
        cfg = CafePlusConfig(lim=64, threshold=100.0)
        st = init_sketch_plus(cfg)
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([11, 22], [1.0, 1.0], 8))
        assert int((np.asarray(st.cnt2) > 0).sum()) == 2
        assert int((np.asarray(st.cnt1) > 0).sum()) == 0

    def test_graduation_to_main_tier_with_slot(self):
        cfg = CafePlusConfig(lim=64, threshold=5.0, adjust_threshold=False)
        st = init_sketch_plus(cfg)
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([7], [3.0], 8))
        st, res = sketch_insert_plus(cfg, st, *pad_ids([7], [3.0], 8))
        # crossed threshold while staged: promoted + moved to main tier
        assert bool(res.mask.any())
        assert int((np.asarray(st.cnt1) > 0).sum()) == 1
        v1 = np.asarray(st.val1)
        assert 7 in v1[np.asarray(st.cnt1) > 0].tolist()
        # staging cell cleared
        assert int((np.asarray(st.cnt2) > 0).sum()) == 0
        q = int(sketch_query_plus(cfg, st, jnp.asarray([7]))[0])
        assert q < 0

    def test_staged_hot_id_visible_to_query(self):
        # promotion can happen while still staged (before graduation step
        # completes); v3 query consults both tiers
        cfg = CafePlusConfig(lim=64, threshold=2.0, adjust_threshold=False)
        st = init_sketch_plus(cfg)
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([9], [1.0], 8))
        st, res = sketch_insert_plus(cfg, st, *pad_ids([9], [1.5], 8))
        assert bool(res.mask.any())
        assert int(sketch_query_plus(cfg, st, jnp.asarray([9]))[0]) < 0

    def test_lru_displacement_moves_worthy_victim(self):
        cfg = CafePlusConfig(lim=512, threshold=1e9, cells=2,
                             adjust_threshold=False)
        st = init_sketch_plus(cfg)
        # fill one staging bucket: find ids mapping to same staging bucket
        from cafe_tpu.sketch.hotsketch_plus import _h2
        ids = []
        target = None
        for x in range(1, 100000):
            h = int(_h2(cfg, jnp.asarray([x]))[0])
            if target is None:
                target = h
                ids.append(x)
            elif h == target:
                ids.append(x)
            if len(ids) == 3:
                break
        a, b, c = ids
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([a], [6.0], 8))
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([b], [1.0], 8))
        # bucket full (2 cells); inserting c displaces LRU victim = a
        # (a is older); a has cnt 6 >= 5 so it moves to the main tier
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([c], [1.0], 8))
        v1 = np.asarray(st.val1)
        c1 = np.asarray(st.cnt1)
        assert a in v1[c1 > 0].tolist()
        v2 = np.asarray(st.val2)
        c2 = np.asarray(st.cnt2)
        live2 = v2[c2 > 0].tolist()
        assert c in live2 and b in live2 and a not in live2

    def test_adaptive_threshold_reset(self):
        cfg = CafePlusConfig(lim=8, threshold=1.0, adjust_threshold=True)
        st = init_sketch_plus(cfg)
        rng = np.random.default_rng(0)
        # flood with ids crossing threshold -> real_n exceeds 1.2*lim ->
        # reset raises the threshold above its initial value
        for i in range(40):
            ids = np.arange(i * 8, i * 8 + 8, dtype=np.int32)
            st, _ = sketch_insert_plus(
                cfg, st, jnp.asarray(ids), jnp.full(8, 2.0, jnp.float32))
            st, _ = sketch_insert_plus(
                cfg, st, jnp.asarray(ids), jnp.full(8, 2.0, jnp.float32))
        assert float(st.threshold) > 1.0
        # hot slots never exceed capacity and stay unique
        d1 = np.asarray(st.dic1)
        d2 = np.asarray(st.dic2)
        used = np.concatenate([d1[d1 != 0], d2[d2 != 0]])
        assert len(used) == len(set(used.tolist()))
        assert len(used) <= cfg.lim - 1

    def test_decay_divides_counts_and_threshold(self):
        cfg = CafePlusConfig(lim=64, threshold=1000.0, alpha=10001.0,
                             adjust_threshold=False)
        st = init_sketch_plus(cfg)
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([5], [40.0], 8))
        thr0 = float(st.threshold)
        # next insert trips decay_acc (1 * 10001 > 10000)
        st, _ = sketch_insert_plus(cfg, st, *pad_ids([6], [1.0], 8))
        assert float(st.threshold) == pytest.approx(thr0 / 10000.0)
        c2 = np.asarray(st.cnt2)
        assert c2[c2 > 0].min() >= 40.0 / 10000.0 - 1e-9

    def test_recall_on_zipf_stream(self):
        rng = np.random.default_rng(3)
        vocab = 4000
        ranks = np.arange(1, vocab + 1, dtype=np.float64)
        p = ranks ** (-1.2)
        p /= p.sum()
        stream = rng.choice(vocab, size=60000, p=p).astype(np.int32)
        cfg = CafePlusConfig(lim=512, threshold=8.0)
        st = init_sketch_plus(cfg)
        for lo in range(0, len(stream), 512):
            chunk = stream[lo:lo + 512]
            st, _ = sketch_insert_plus(cfg, st, jnp.asarray(chunk),
                                       jnp.ones(len(chunk), jnp.float32))
        counts = np.bincount(stream, minlength=vocab)
        d1, v1 = np.asarray(st.dic1), np.asarray(st.val1)
        d2, v2 = np.asarray(st.dic2), np.asarray(st.val2)
        hot = set(v1[d1 != 0].tolist()) | set(v2[d2 != 0].tolist())
        ideal = set(np.argsort(-counts)[: len(hot)].tolist())
        recall = len(ideal & hot) / max(1, len(ideal))
        assert recall > 0.6


class TestCafePlusPart:
    def test_end_to_end_routing(self):
        from cafe_tpu.embeddings.cafe import CafePart
        p = CafePart([0], [1000], [0], hotn=64, hash_sizes=[50], dim=4,
                     sketch_threshold=2.0, sketch_decay=0.99, max_count=1000,
                     plus=True)
        state = p.init(np.random.default_rng(0))
        ids = jnp.asarray([[5]], jnp.int32)
        g = jnp.ones((1, 1, 4), jnp.float32)
        for _ in range(4):
            raw, aux = p.gather(state, ids)
            state, stats = p.apply_grads(state, ids, g, aux, lr=0.01)
        raw, (_, _, _, is_hot) = p.gather(state, ids)
        assert bool(is_hot[0, 0])


class TestRegressionFixes:
    """Regressions for review findings: staging-collision clobber,
    reset denying the hottest id, free-stack conservation."""

    def test_colliding_fresh_ids_both_survive(self):
        # lim=10 -> n2 = 1 staging bucket: every fresh id collides
        cfg = CafePlusConfig(lim=10, threshold=100.0, adjust_threshold=False)
        st = init_sketch_plus(cfg)
        ids, sc = pad_ids([5, 9], [1.0, 1.0], 8)
        st, _ = sketch_insert_plus(cfg, st, ids, sc)
        vals = set(np.asarray(st.val2[0]).tolist())
        assert {5, 9} <= vals, vals  # neither id clobbered the other
        # counts landed in distinct cells
        v2 = np.asarray(st.val2[0])
        c2 = np.asarray(st.cnt2[0])
        for want in (5, 9):
            assert c2[list(v2).index(want)] == 1.0

    def test_colliding_fresh_hot_ids_get_distinct_slots(self):
        cfg = CafePlusConfig(lim=10, threshold=0.5, adjust_threshold=False)
        st = init_sketch_plus(cfg)
        before = int(st.free_top)
        ids, sc = pad_ids([5, 9], [1.0, 1.0], 8)
        st, res = sketch_insert_plus(cfg, st, ids, sc)
        q = np.asarray(sketch_query_plus(cfg, st, ids))
        slots = {-q[0], -q[1]}
        assert all(s > 0 for s in slots) and len(slots) == 2, q
        assert int(st.free_top) == before - 2  # no leak, no double-pop

    def test_free_stack_conserved_under_collisions(self):
        cfg = CafePlusConfig(lim=16, threshold=2.0, adjust_threshold=False)
        st = init_sketch_plus(cfg)
        rng = np.random.default_rng(0)
        for _ in range(30):
            ids = rng.integers(0, 40, 16).astype(np.int32)
            i, s = pad_ids(ids, np.ones(16), 16)
            st, _ = sketch_insert_plus(cfg, st, i, s)
        # every slot is either on the free stack or held by exactly one cell
        held = np.concatenate([np.asarray(st.dic1).ravel(),
                               np.asarray(st.dic2).ravel()])
        held = held[held != 0]
        assert len(set(held.tolist())) == len(held)  # no aliased slots
        assert len(held) + int(st.free_top) == cfg.lim - 1

    def test_reset_keeps_hottest_id_hot(self):
        from cafe_tpu.sketch.hotsketch_plus import _reset
        cfg = CafePlusConfig(lim=8, threshold=10.0)
        st = init_sketch_plus(cfg)
        # 12 candidate cells with counts 10..21 spread over main-tier cells
        cnt1 = np.asarray(st.cnt1).copy()
        val1 = np.asarray(st.val1).copy()
        flat_c = cnt1.reshape(-1)
        flat_v = val1.reshape(-1)
        for k in range(12):
            flat_c[k] = 10.0 + k
            flat_v[k] = 100 + k
        st = st._replace(cnt1=jnp.asarray(cnt1), val1=jnp.asarray(val1),
                         real_n=jnp.asarray(12, np.int32))
        st2 = _reset(cfg, st)
        dic = np.asarray(st2.dic1).reshape(-1)
        # the hottest candidate (count 21) MUST hold a slot
        assert dic[11] != 0
        # exactly lim-1 slots allocated, all distinct
        held = dic[dic != 0]
        assert len(held) == cfg.lim - 1
        assert len(set(held.tolist())) == len(held)
        # the lowest-count candidates were the ones denied
        assert dic[0] == 0 and dic[1] == 0

    def test_rebuild_free_list_preserves_padded_shape(self):
        from cafe_tpu.sketch.hotsketch import (
            HotSketchConfig, init_sketch, rebuild_free_list)
        cfg = HotSketchConfig(buckets=64, threshold=5.0)
        st = init_sketch(cfg)
        st = st._replace(dic=st.dic.at[0, 0].set(3))
        st2 = rebuild_free_list(cfg, st)
        assert st2.free.shape == st.free.shape  # ROW_ALIGN padding kept
        assert int(st2.free_top) == cfg.buckets - 2  # slot 3 in use
        popped = np.asarray(st2.free[: int(st2.free_top)])
        assert 3 not in popped and 0 not in popped
        assert popped.max() < cfg.buckets


def test_pallas_gather_honors_tile():
    import jax
    from cafe_tpu.ops.pallas_gather import pallas_gather
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 512, 256).astype(np.int32))
    out = pallas_gather(table, ids, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]))


def test_analyse_plus_probe():
    from cafe_tpu.sketch.hotsketch_plus import analyse_plus
    cfg = CafePlusConfig(lim=64, threshold=3.0, adjust_threshold=False)
    st = init_sketch_plus(cfg)
    hot = np.arange(5, 15, dtype=np.int32)
    for _ in range(4):
        ids, sc = pad_ids(np.concatenate([hot, hot]),
                          np.ones(20), 20)
        st, _ = sketch_insert_plus(cfg, st, ids, sc)
    assert float(analyse_plus(cfg, st, jnp.asarray(hot))) == 1.0
    cold = jnp.asarray(np.arange(900, 910, dtype=np.int32))
    assert float(analyse_plus(cfg, st, cold)) == 0.0


class TestStagingInheritance:
    """Opt-in Space-Saving count inheritance in the staging tier
    (cfg.inherit): a newcomer displacing a DISCARDED victim absorbs its
    count; victims moved to the main tier are not double-counted."""

    def _mk(self, inherit):
        import numpy as np
        from cafe_tpu.sketch.hotsketch_plus import (CafePlusConfig,
                                                    init_sketch_plus)
        # lim 10 -> n2 = 1 staging bucket of 4 cells
        cfg = CafePlusConfig(lim=10, threshold=100.0, cells=4,
                             adjust_threshold=False, inherit=inherit)
        return cfg, init_sketch_plus(cfg)

    def _fill_and_evict(self, inherit):
        import jax.numpy as jnp
        import numpy as np
        from cafe_tpu.sketch.hotsketch_plus import sketch_insert_plus
        from cafe_tpu.sketch.hotsketch import INVALID_ID
        cfg, st = self._mk(inherit)
        pad = lambda ids: jnp.asarray(  # noqa: E731
            np.array(ids + [INVALID_ID] * (8 - len(ids)), np.int32))
        ones = lambda v: jnp.asarray(  # noqa: E731
            np.array(v + [0.0] * (8 - len(v)), np.float32))
        # fill the single staging bucket with 4 ids, counts 2 each
        st, _ = sketch_insert_plus(cfg, st, pad([1, 2, 3, 4]),
                                   ones([2.0, 2.0, 2.0, 2.0]))
        # newcomer 5 (count 3) must evict the LRU victim (count 2 < 5
        # -> discarded, not moved)
        st, _ = sketch_insert_plus(cfg, st, pad([5]), ones([3.0]))
        val2 = np.asarray(st.val2)
        cnt2 = np.asarray(st.cnt2)
        where = np.argwhere(val2 == 5)
        assert len(where) == 1
        return float(cnt2[tuple(where[0])])

    def test_inherit_absorbs_discarded_count(self):
        assert self._fill_and_evict(True) == 5.0   # 3 own + 2 inherited

    def test_reference_semantics_without_inherit(self):
        assert self._fill_and_evict(False) == 3.0  # own count only


class TestResetCost:
    """VERDICT r3 item 6: the adaptive-threshold reset (a jitted global
    rank over all candidate cells, hotsketch_plus._reset) must not stall
    the stream — a reset-heavy stream stays within 2x the steady-state
    stream. tools/reset_cost.py measures the same thing at CriteoTB
    scale on chip.

    Split per the round-4 advisor: the deterministic fires>=3 functional
    check runs in the default suite; the wall-clock ratio assertion is a
    perf test (flaky-prone on shared/loaded CI runners) gated behind
    CAFE_RUN_PERF_TESTS=1."""

    def _stream(self):
        cfg = CafePlusConfig(lim=2048, threshold=2.0)
        st0 = init_sketch_plus(cfg)
        b = 4096
        rng = np.random.default_rng(0)
        steps = [
            (jnp.asarray(np.minimum(rng.zipf(1.05, b), 1 << 20)
                         .astype(np.int32)),
             jnp.asarray(rng.random(b, dtype=np.float32) * 4.0))
            for _ in range(12)
        ]
        return cfg, st0, steps

    def _run(self, cfg, st0, steps, heavy):
        import jax
        trip = int(cfg.lim * 1.2)
        st = st0
        fires = 0
        for ids, sc in steps:
            if not heavy:
                st = st._replace(real_n=jnp.asarray(0, jnp.int32))
            fires += int(st.real_n) > trip
            st, _ = sketch_insert_plus(cfg, st, ids, sc)
        jax.block_until_ready(st)
        return fires

    @pytest.mark.timeout(300)
    def test_reset_heavy_stream_fires(self):
        # the stream must actually be reset-heavy for the wall-clock
        # bound to mean anything (low threshold + heavy-tailed zipf
        # trips it often) — deterministic, runs in the default suite
        cfg, st0, steps = self._stream()
        assert self._run(cfg, st0, steps, heavy=True) >= 3

    @pytest.mark.timeout(300)
    @pytest.mark.skipif(
        not os.environ.get("CAFE_RUN_PERF_TESTS"),
        reason="wall-clock perf assertion; set CAFE_RUN_PERF_TESTS=1 "
               "(flaky-prone on shared CI runners)")
    def test_reset_heavy_stream_within_2x_steady(self):
        import time

        cfg, st0, steps = self._stream()
        self._run(cfg, st0, steps, True)   # compile + warm
        self._run(cfg, st0, steps, False)
        heavy_t, steady_t = [], []
        for _ in range(3):  # interleaved windows damp CPU noise
            t0 = time.perf_counter()
            self._run(cfg, st0, steps, True)
            heavy_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            self._run(cfg, st0, steps, False)
            steady_t.append(time.perf_counter() - t0)
        heavy = float(np.median(heavy_t))
        steady = float(np.median(steady_t))
        assert heavy <= 2.0 * steady, (
            f"reset-heavy stream {heavy:.3f}s > 2x steady {steady:.3f}s")
