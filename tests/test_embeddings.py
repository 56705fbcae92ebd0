"""Embedding parts: sizing formulas, gather/update semantics, CAFE routing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cafe_tpu.config import Config
from cafe_tpu.embeddings import build_embedding_layer, sizing
from cafe_tpu.embeddings.base import HashedTablePart, QRPart, MDEGroupPart
from cafe_tpu.embeddings.cafe import CafePart


class TestSizing:
    def test_compress_threshold(self):
        assert sizing.compress_threshold(0.5) == 1000.0

    def test_qr_collisions_reference_formula(self):
        counts = [10000, 20000, 30000]
        cr = 0.05
        coll = sizing.qr_collisions(counts, cr)
        ntotal = 60000
        # memory rows ~= ntotal/coll + coll*nfields should be ~ ntotal*cr
        import math
        tobe = (ntotal * cr) ** 2 - 4 * ntotal
        expect = int(math.ceil((ntotal * cr - math.sqrt(tobe)) / 2))
        assert coll == expect

    def test_mde_dims_hit_target(self):
        counts = [100, 1000, 10000, 100000]
        dims = sizing.mde_dims(counts, 0.2, 32)
        cr = sum(d * n for d, n in zip(dims, counts)) / (sum(counts) * 32)
        assert cr <= 0.25
        # biggest table gets the smallest dim
        assert dims[np.argmax(counts)] == min(dims)
        assert max(dims) <= 32

    def test_cafe_hotn_budget(self):
        counts = [1000000] * 10
        dim = 16
        hotn = sizing.cafe_hotn(counts, 0.01, dim, 0.5)
        assert hotn == int(1e7 * 0.01 * 0.5 * (64 / 112))

    def test_full_fallback_when_all_small(self):
        cfg = Config(compress_method="hash", compress_rate=0.5)
        # threshold = 1000; all fields smaller -> single full part
        layer = build_embedding_layer(cfg, [100, 200], 8)
        assert len(layer.parts) == 1
        assert layer.parts[0].real_ns == [100, 200]


class TestParts:
    def test_hashed_gather_and_sgd(self):
        p = HashedTablePart([0, 1], [10, 20], [5, 20], dim=4)
        rng = np.random.default_rng(0)
        state = p.init(rng)
        ids = jnp.asarray([[7, 3], [6, 3]], jnp.int32)  # field0 mods by 5
        raw, aux = p.gather(state, ids)
        table = np.asarray(state["table"])
        np.testing.assert_allclose(raw[0, 0], table[7 % 5])
        np.testing.assert_allclose(raw[0, 1], table[5 + 3])
        g = jnp.ones((2, 2, 4), jnp.float32)
        state2, _ = p.apply_grads(state, ids, g, aux, lr=0.5)
        t2 = np.asarray(state2["table"])
        np.testing.assert_allclose(t2[2], table[2] - 0.5)       # id 7%5=2
        # duplicate row (field1 id 3 twice) accumulates both grads
        np.testing.assert_allclose(t2[5 + 3], table[5 + 3] - 1.0)

    def test_qr_sum_semantics(self):
        p = QRPart([0], [100], collisions=10, dim=4)
        state = p.init(np.random.default_rng(0))
        ids = jnp.asarray([[37]], jnp.int32)
        raw, aux = p.gather(state, ids)
        q = np.asarray(state["q"])
        r = np.asarray(state["r"])
        np.testing.assert_allclose(raw[0, 0], q[3] + r[7], rtol=1e-6)

    def test_mde_projection_shapes(self):
        p = MDEGroupPart([0, 1], [500, 600], low_dim=4, base_dim=16)
        rng = np.random.default_rng(0)
        state = p.init(rng)
        dense = p.init_dense(rng)
        ids = jnp.zeros((3, 2), jnp.int32)
        raw, _ = p.gather(state, ids)
        assert raw.shape == (3, 2, 4)
        feats = p.transform(dense, raw)
        assert feats.shape == (3, 2, 16)

    def test_adagrad_accumulates(self):
        p = HashedTablePart([0], [10], [10], dim=2, optimizer="adagrad")
        state = p.init(np.random.default_rng(0))
        ids = jnp.asarray([[3]], jnp.int32)
        raw, aux = p.gather(state, ids)
        g = jnp.full((1, 1, 2), 2.0)
        state2, _ = p.apply_grads(state, ids, g, aux, lr=1.0)
        acc = np.asarray(state2["table_acc"])
        assert acc[3, 0] == pytest.approx(4.0)
        t0 = np.asarray(state["table"])
        t2 = np.asarray(state2["table"])
        np.testing.assert_allclose(t2[3], t0[3] - 1.0 * 2.0 / (2.0 + 1e-10),
                                   rtol=1e-6)


class TestCafePart:
    def _part(self, hotn=32, threshold=3.0):
        return CafePart(
            field_idx=[0, 1], counts=[100, 200], global_offsets=[0, 100],
            hotn=hotn, hash_sizes=[10, 20], dim=4,
            sketch_threshold=threshold, sketch_decay=0.99, max_count=200)

    def test_cold_then_hot_routing(self):
        p = self._part()
        state = p.init(np.random.default_rng(0))
        ids = jnp.asarray([[5, 7]] * 4, jnp.int32)
        raw, (oids, row, hrow, is_hot) = p.gather(state, ids)
        assert not bool(np.asarray(is_hot).any())
        # cold rows come from the hash region at offset-id % hash_size
        hsh = np.asarray(p.hash_view(state))
        np.testing.assert_allclose(raw[0, 0], hsh[5 % 10])
        np.testing.assert_allclose(raw[0, 1], hsh[10 + (107 % 20)])

        # drive importance over the threshold -> promotion + hot routing
        g = jnp.ones((4, 2, 4), jnp.float32)
        for _ in range(4):
            raw, aux = p.gather(state, ids)
            state, stats = p.apply_grads(state, ids, g, aux, lr=0.0)
        assert int(stats["cafe_promotions"]) >= 0
        raw, (oids, row, hrow, is_hot) = p.gather(state, ids)
        assert bool(np.asarray(is_hot).all())
        assert float(np.asarray(stats["cafe_hot_frac"])) >= 0.0

    def test_migration_copies_cold_row(self):
        p = self._part(threshold=2.0)
        state = p.init(np.random.default_rng(1))
        ids = jnp.asarray([[9, 9]], jnp.int32)[:, :1]  # single field0 id 9
        ids = jnp.asarray([[9, 0]], jnp.int32)
        hash_before = np.asarray(p.hash_view(state)).copy()
        g = jnp.ones((1, 2, 4), jnp.float32)
        # lr=0 so tables do not move; only promotion + migration happen
        for _ in range(3):
            raw, aux = p.gather(state, ids)
            state, _ = p.apply_grads(state, ids, g, aux, lr=0.0)
        raw, (oids, row, hrow, is_hot) = p.gather(state, ids)
        assert bool(is_hot[0, 0])
        s = int(row[0, 0])  # hot rows sit at their slot index
        np.testing.assert_allclose(np.asarray(p.high_view(state))[s],
                                   hash_before[9 % 10])

    def test_grad_updates_served_table_only(self):
        p = self._part(threshold=1e9)  # never promotes
        state = p.init(np.random.default_rng(2))
        high_before = np.asarray(p.high_view(state)).copy()
        ids = jnp.asarray([[5, 7]], jnp.int32)
        raw, aux = p.gather(state, ids)
        g = jnp.ones((1, 2, 4), jnp.float32)
        state, _ = p.apply_grads(state, ids, g, aux, lr=0.1)
        np.testing.assert_allclose(np.asarray(p.high_view(state)),
                                   high_before)
        hsh = np.asarray(p.hash_view(state))
        # served cold rows moved by -lr*g
        assert not np.allclose(hsh[5 % 10], np.asarray(raw[0, 0]))

    def test_use_freq_mode(self):
        p = CafePart([0], [50], [0], hotn=16, hash_sizes=[5], dim=4,
                     sketch_threshold=2.0, sketch_decay=0.99, max_count=50,
                     use_freq=True)
        state = p.init(np.random.default_rng(3))
        ids = jnp.asarray([[3]], jnp.int32)
        g = jnp.zeros((1, 1, 4), jnp.float32)  # zero grads; freq still counts
        for _ in range(3):
            raw, aux = p.gather(state, ids)
            state, _ = p.apply_grads(state, ids, g, aux, lr=0.0)
        raw, (_, _, _, is_hot) = p.gather(state, ids)
        assert bool(is_hot[0, 0])


class TestDispatcher:
    def test_methods_construct(self):
        counts = [5000, 300, 8000]
        for method, cr in [("full", 1.0), ("hash", 0.1), ("qr", 0.05),
                           ("mde", 0.1), ("cafe", 0.1), ("ada", 0.5)]:
            cfg = Config(compress_method=method, compress_rate=cr,
                         embedding_dim=8, cafe_sketch_threshold=5)
            layer = build_embedding_layer(cfg, counts, 8)
            state, dense = layer.init(0)
            ids = jnp.asarray(np.random.default_rng(0).integers(
                0, 300, size=(4, 3)), jnp.int32)
            raws, auxs = layer.gather(state, ids)
            feats = layer.transform(dense, raws)
            assert feats.shape == (4, 3, 8)

    def test_field_permutation_order(self):
        # big field sandwiched between small ones; outputs must align
        cfg = Config(compress_method="cafe", compress_rate=0.1,
                     embedding_dim=4, cafe_sketch_threshold=1e9)
        counts = [10, 9000, 10]
        layer = build_embedding_layer(cfg, counts, 4)
        state, dense = layer.init(0)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        raws, _ = layer.gather(state, ids)
        feats = layer.transform(dense, raws)
        # field 0 and 2 come from the full part; they should equal direct
        # gathers from that part's table in the right field positions
        full_part = layer.parts[0]
        assert full_part.field_idx == [0, 2]
        t = np.asarray(state["part0"]["table"])
        np.testing.assert_allclose(feats[0, 0], t[1])
        np.testing.assert_allclose(feats[0, 2], t[10 + 3])


class TestAutoencoder:
    def test_pretrain_reconstruction_improves(self):
        from cafe_tpu.embeddings.ae import AEGroupPart
        import jax
        p = AEGroupPart([0], [50], low_dim=4, base_dim=8)
        state = p.init(np.random.default_rng(0))
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 50, (32, 1)), jnp.int32)

        def recon_loss(st):
            emb, _ = p._embed(st, ids)
            h = jnp.einsum("bfe,fed->bfd", emb, st["fc1_w"]) + st["fc1_b"][None]
            v = jnp.einsum("bfd,fdn->bfn", h, st["fc2_w"]) + st["fc2_b"][None]
            onehot = jax.nn.one_hot(ids, p.max_n, dtype=v.dtype)
            return float(jnp.sum((v - onehot) ** 2) / 32)

        before = recon_loss(state)
        for _ in range(300):
            state = p.pretrain_step(state, ids)
        after = recon_loss(state)
        # 4-dim bottleneck over 50 ids cannot reach zero; require a clear
        # monotone improvement
        assert after < before - 0.2

    def test_frozen_after_pretrain(self):
        from cafe_tpu.embeddings.ae import AEGroupPart
        p = AEGroupPart([0], [50], low_dim=4, base_dim=8)
        state = p.init(np.random.default_rng(0))
        ids = jnp.zeros((4, 1), jnp.int32)
        raw, aux = p.gather(state, ids)
        state2, _ = p.apply_grads(state, ids, jnp.ones_like(raw), aux, 0.1)
        assert state2 is state  # no-op: embeddings frozen


class TestCafeVariants:
    def test_separate_field_builds_per_field_sketches(self):
        cfg = Config(compress_method="cafe", compress_rate=0.1,
                     embedding_dim=16, cafe_sketch_threshold=5,
                     cafe_hot_separate_field=True)
        counts = [8000, 100, 6000]
        layer = build_embedding_layer(cfg, counts, 16)
        cafe_parts = [p for p in layer.parts if isinstance(p, CafePart)]
        assert len(cafe_parts) == 2  # one per big field
        assert all(len(p.field_idx) == 1 for p in cafe_parts)
        state, dense = layer.init(0)
        ids = jnp.asarray([[5, 6, 7]], jnp.int32)
        raws, auxs = layer.gather(state, ids)
        feats = layer.transform(dense, raws)
        assert feats.shape == (1, 3, 16)
        g_raws = {k: jnp.ones_like(v) for k, v in raws.items()}
        state2, stats = layer.apply_grads(state, ids, g_raws, auxs, 0.1)
        assert "cafe_promotions" in stats

    def test_cafe_plus_via_config(self):
        cfg = Config(compress_method="cafe", compress_rate=0.1,
                     embedding_dim=16, cafe_sketch_threshold=3,
                     cafe_plus=True, cafe_alpha=1.0)
        counts = [9000, 7000]
        layer = build_embedding_layer(cfg, counts, 16)
        part = layer.parts[0]
        assert part.plus
        state, dense = layer.init(0)
        ids = jnp.asarray([[5, 6]] * 4, jnp.int32)
        for _ in range(4):
            raws, auxs = layer.gather(state, ids)
            g = {k: jnp.ones_like(v) for k, v in raws.items()}
            state, stats = layer.apply_grads(state, ids, g, auxs, 0.0)
        raws, auxs = layer.gather(state, ids)
        _, _, _, is_hot = auxs["part0"]
        assert bool(np.asarray(is_hot).all())


def test_offpart_zero_cold_falls_back_to_hot_table():
    """A field with no cold budget serves non-hot ids from the hot table
    by modulo (reference off_embedding_bag.py:36-49 weight_cold=None),
    instead of aliasing every cold id to one padding row."""
    import numpy as np
    import jax.numpy as jnp
    from cafe_tpu.embeddings.base import OffPart
    hd = np.full(20, -1, np.int32)
    hd[3] = 0
    hd[7] = 1  # two hot ids
    part = OffPart([0], [20], [hd], [0], 4)  # num_cold = 0 -> fallback
    st = part.init(np.random.default_rng(0))
    ids = jnp.asarray([[3], [7], [4], [6]])  # hot, hot, cold, cold
    rows, aux = part.gather(st, ids)
    hot = np.asarray(st["table"])[:2]  # unified layout: hot rows first
    np.testing.assert_allclose(np.asarray(rows[0, 0]), hot[0])
    np.testing.assert_allclose(np.asarray(rows[1, 0]), hot[1])
    # cold ids 4 and 6 -> hot rows 4%2=0 and 6%2=0 of the hot table
    np.testing.assert_allclose(np.asarray(rows[2, 0]), hot[0])
    np.testing.assert_allclose(np.asarray(rows[3, 0]), hot[0])
    # and they are NOT all the single zero padding row
    assert np.abs(np.asarray(rows)).sum() > 0


class TestAdaRebuild:
    """Slot-accounting invariants of AdaPart._rebuild (the reference's
    ada_rebuild, init_embed.py:253-274)."""

    def _part_and_state(self, hotn=50, n=1000):
        import numpy as np
        from cafe_tpu.embeddings.ada import AdaPart
        part = AdaPart([0], [n], hotn, dim=4)
        state = part.init(np.random.default_rng(0))
        return part, state

    @staticmethod
    def _assert_unique_slots(dic, hotn):
        import numpy as np
        slots = np.asarray(dic)
        live = slots[slots != 0]
        assert (live >= 1).all() and (live <= hotn).all()
        assert len(np.unique(live)) == len(live), \
            "two features share a hot slot"

    def test_admit_exceeds_evict_no_slot_collision(self):
        """Regression: a non-initial rebuild with n_admit > n_evict used a
        lane+1 fallback that could hand out already-assigned slots."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        part, state = self._part_and_state(hotn=50, n=1000)
        # pre-assign 30 ids to ARBITRARY slots not equal to 1..30 (so the
        # old fallback's lane+1 slots collide with them)
        dic = np.zeros(state["dic"].shape[0], np.int32)
        pre_slots = np.arange(21, 51, dtype=np.int32)  # slots 21..50
        dic[:30] = pre_slots
        gn = np.asarray(state["grad_norm"]).copy()
        gn[:30] = 100.0           # kept hot
        gn[100:120] = 50.0        # 20 admits, 0 evicts
        state = {**state, "dic": jnp.asarray(dic),
                 "grad_norm": jnp.asarray(gn)}
        out = jax.jit(part._rebuild)(state)
        self._assert_unique_slots(out["dic"], part.hotn)
        d = np.asarray(out["dic"])
        assert (d[:30] == pre_slots).all()      # kept ids keep their slots
        assert (d[100:120] != 0).all()          # all 20 admitted

    def test_rebuild_chain_keeps_uniqueness(self):
        """Three rebuilds with churn: slots stay unique throughout."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        part, state = self._part_and_state(hotn=32, n=400)
        rng = np.random.default_rng(3)
        rebuild = jax.jit(part._rebuild)
        for _ in range(3):
            gn = np.zeros(state["grad_norm"].shape[0], np.float32)
            gn[: 400] = rng.random(400).astype(np.float32)
            state = {**state, "grad_norm": jnp.asarray(gn)}
            state = rebuild(state)
            self._assert_unique_slots(state["dic"], part.hotn)
            assert int((np.asarray(state["dic"]) != 0).sum()) == part.hotn


class TestUniqueCompactOps:
    """Oracle tests for the capacity-bounded dedup primitives
    (ops/sparse.unique_compact, coalesce_compact) behind the
    wire-shrinking exchange."""

    def test_unique_compact_roundtrip(self):
        import numpy as np
        import jax.numpy as jnp
        from cafe_tpu.ops.sparse import unique_compact
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 40, size=128).astype(np.int32)
        C = 64
        uids, inv, nu = unique_compact(jnp.asarray(idx), C, 2**30)
        uids, inv, nu = np.asarray(uids), np.asarray(inv), int(nu)
        expect = np.unique(idx)
        assert nu == len(expect)
        np.testing.assert_array_equal(uids[:nu], expect)
        assert (uids[nu:] == 2**30).all()
        # inv maps every lane back to its value
        np.testing.assert_array_equal(uids[inv], idx)

    def test_coalesce_compact_sums_duplicates(self):
        import numpy as np
        import jax.numpy as jnp
        from cafe_tpu.ops.sparse import coalesce_compact
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 30, size=96).astype(np.int32)
        grad = rng.normal(size=(96, 4)).astype(np.float32)
        C = 48
        cidx, cgrad, nu = coalesce_compact(jnp.asarray(idx),
                                           jnp.asarray(grad), C, 2**30)
        cidx, cgrad = np.asarray(cidx), np.asarray(cgrad)
        expect = np.unique(idx)
        assert int(nu) == len(expect)
        for k, v in enumerate(expect):
            np.testing.assert_allclose(cgrad[k], grad[idx == v].sum(0),
                                       atol=1e-5)
            assert cidx[k] == v

    def test_overflow_reports_true_count(self):
        import numpy as np
        import jax.numpy as jnp
        from cafe_tpu.ops.sparse import unique_compact
        idx = jnp.asarray(np.arange(100, dtype=np.int32))
        uids, inv, nu = unique_compact(idx, 32, 2**30)
        assert int(nu) == 100  # callers detect overflow from this


class TestAutoStagingFrac:
    """Flow-proportional CAFE+ staging share (beyond-reference knob,
    --cafe_plus_staging_frac -1; calibration: docs/EXPERIMENTS.md
    round-2 sweep)."""

    def test_calibration_points(self):
        # cr=1e-4 regime: 53k ids/step onto 1,735 slots -> ~0.5
        assert sizing.auto_staging_frac(2048 * 26, 1735) == pytest.approx(
            0.5, abs=0.02)
        # cr>=1e-3 regime: ~3.5 ids/slot -> the reference's 0.1
        assert sizing.auto_staging_frac(2048 * 26, 15433) == 0.1
        # DEADBAND: below the 15 ids/slot thrash onset the share snaps
        # to the reference's exact 0.1 (small-sketch layout sensitivity)
        assert sizing.auto_staging_frac(1536, 216) == 0.1
        assert sizing.auto_staging_frac(14 * 100, 100) == 0.1
        # bounds
        assert sizing.auto_staging_frac(10, 100000) == 0.1
        assert sizing.auto_staging_frac(10**9, 10) == 0.5

    def test_builder_auto_mode(self):
        cfg = Config(compress_method="cafe", cafe_plus=True,
                     compress_rate=0.001, cafe_plus_staging_frac=-1.0,
                     mini_batch_size=2048, embedding_dim=16,
                     cafe_hash_rate=0.2)
        counts = [200000] * 8
        layer = build_embedding_layer(cfg, counts, 16)
        cafe = [p for p in layer.parts if isinstance(p, CafePart)]
        assert cafe and cafe[0].plus
        expect = sizing.auto_staging_frac(2048 * len(cafe[0].field_idx),
                                          cafe[0].hotn)
        assert cafe[0].sketch_cfg.staging_frac == pytest.approx(expect)
        assert cafe[0].sketch_cfg.staging_frac > 0.1  # tight regime here


def test_ada_rejects_budget_consumed_by_overhead():
    """The ada sizing formula (init_embed.py:83) charges dic+importance
    against the row budget; at dim*cr <= 2 the hot-row count goes
    NEGATIVE — that must be a loud error, not a silently-broken part."""
    import pytest
    from cafe_tpu.embeddings.ada import AdaPart
    with pytest.raises(ValueError, match="compress_rate > 2/dim"):
        AdaPart([0], [100000], hotn=-3125, dim=16)


class TestInsertInterval:
    """cafe_insert_interval: sketch insert every k-th step with x-k score
    mass (bench.py perf mode; CLI default 1 = reference-exact)."""

    def _part(self, interval, threshold=6.0):
        return CafePart(
            field_idx=[0, 1], counts=[100, 200], global_offsets=[0, 100],
            hotn=32, hash_sizes=[10, 20], dim=4,
            sketch_threshold=threshold, sketch_decay=0.99, max_count=200,
            insert_interval=interval)

    def test_skip_steps_leave_sketch_untouched(self):
        p = self._part(interval=3)
        state = p.init(np.random.default_rng(0))
        ids = jnp.asarray([[5, 7]] * 4, jnp.int32)
        g = jnp.ones((4, 2, 4), jnp.float32)
        sketches = []
        for _ in range(4):
            raw, aux = p.gather(state, ids)
            state, _ = p.apply_grads(state, ids, g, aux, lr=0.0)
            sketches.append(state["sketch"])
        # step 0 inserts; steps 1, 2 skip; step 3 inserts again
        for a, b in zip(jax.tree.leaves(sketches[0]),
                        jax.tree.leaves(sketches[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(state["tick"]) == 4
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(sketches[2]),
                            jax.tree.leaves(sketches[3])))
        assert changed, "step 3 (tick%3==0) must insert"

    def test_interval_matches_subsampled_reference(self):
        """k-interval run == a run fed only the inserting steps' batches
        (same x-k score mass, tick pinned so every call inserts): the
        cond wiring changes WHEN inserts happen, not WHAT they do."""
        k = 2
        p_iv = self._part(interval=k)
        p_ref = self._part(interval=k)
        st_iv = p_iv.init(np.random.default_rng(1))
        st_ref = p_ref.init(np.random.default_rng(1))
        rng = np.random.default_rng(7)
        for step in range(4):
            ids = jnp.asarray(rng.integers(0, 100, (4, 2)), jnp.int32)
            g = jnp.asarray(rng.normal(size=(4, 2, 4)), jnp.float32)
            raw, aux = p_iv.gather(st_iv, ids)
            st_iv, _ = p_iv.apply_grads(st_iv, ids, g, aux, lr=0.0)
            if step % k == 0:
                st_ref = {**st_ref, "tick": jnp.zeros((), jnp.int32)}
                raw_r, aux_r = p_ref.gather(st_ref, ids)
                st_ref, _ = p_ref.apply_grads(st_ref, ids, g, aux_r,
                                              lr=0.0)
        for a, b in zip(jax.tree.leaves(st_iv["sketch"]),
                        jax.tree.leaves(st_ref["sketch"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
