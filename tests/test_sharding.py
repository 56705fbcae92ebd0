"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates that the sharded train step (row-sharded tables + sketch, DP dense
towers) produces the same numbers as the single-device step — sharding must
be a pure performance decision, never a semantics change.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cafe_tpu.config import Config
from cafe_tpu.data import make_synthetic_arrays, batch_iterator
from cafe_tpu.parallel import make_mesh, shard_train_step, state_shardings
from cafe_tpu.train.loop import build_all


@pytest.fixture(scope="module")
def setup():
    cfg = Config(dataset="synthetic", embedding_dim=16,
                 compress_method="cafe", compress_rate=0.05,
                 cafe_sketch_threshold=5.0, learning_rate=0.1,
                 synthetic_rows=4096, synthetic_fields=6,
                 synthetic_vocab=20000, synthetic_dense=13,
                 mini_batch_size=64)
    from cafe_tpu.train.loop import get_dataset
    train = get_dataset(cfg, "train")
    return cfg, train


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device(setup):
    cfg, train = setup
    model, embed, state, train_step, _ = build_all(cfg, train)
    mesh = make_mesh(8)
    # device_put aliases buffers whose sharding already matches, and
    # train_step donates its state arg (config default) — give the
    # sharded arm its own copy so the single-device arm's donation
    # cannot delete shared leaves
    sharded_step, sh_state = shard_train_step(
        train_step, mesh, jax.tree.map(jnp.copy, state),
        shard_embeddings=True)
    batches = list(batch_iterator(train, 64, drop_last=True))[:5]
    for dense, sparse, label, valid in batches:
        args = (jnp.asarray(dense), jnp.asarray(sparse), jnp.asarray(label),
                jnp.asarray(valid))
        state, m1 = train_step(state, *args)
        sh_state, m2 = sharded_step(sh_state, *args)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=2e-4)
    # table contents agree after several steps of scatter updates
    t1 = np.asarray(state.embed["part0"]["table"])
    t2 = np.asarray(jax.device_get(sh_state.embed["part0"]["table"]))
    np.testing.assert_allclose(t1, t2, atol=2e-5)
    sk1 = state.embed["part0"]["sketch"]
    sk2 = jax.device_get(sh_state.embed["part0"]["sketch"])
    assert (np.asarray(sk1.dic) == np.asarray(sk2.dic)).all()


def test_state_shardings_rowshard_tables(setup):
    cfg, train = setup
    model, embed, state, _, _ = build_all(cfg, train)
    mesh = make_mesh(8)
    sh = state_shardings(state, mesh, shard_embeddings=True)
    # the big cafe hash table must be row-sharded
    spec = sh.embed["part0"]["table"].spec
    assert tuple(spec) == ("data", None)
    # dense params replicated
    leaf = jax.tree.leaves(sh.params)[0]
    assert tuple(leaf.spec) == ()


class TestExplicitExchange:
    """shard_map AG + reduce-scatter lookup vs single-device equivalence."""

    def test_sharded_gather_matches(self):
        from cafe_tpu.parallel.embedding_parallel import sharded_gather
        mesh = make_mesh(8)
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(0, 1, (1024, 16)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 1024, 256).astype(np.int32))
        out = sharded_gather(mesh, table, ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]),
                                   atol=1e-6)

    def test_sharded_scatter_add_matches(self):
        from cafe_tpu.parallel.embedding_parallel import sharded_scatter_add
        mesh = make_mesh(8)
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(0, 1, (512, 8)).astype(np.float32))
        # duplicates on purpose
        ids = jnp.asarray(rng.integers(0, 64, 128).astype(np.int32))
        upd = jnp.asarray(rng.normal(0, 1, (128, 8)).astype(np.float32))
        out = sharded_scatter_add(mesh, table, ids, upd)
        ref = table.at[ids].add(upd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_owner_lookup_cyclic_oracle(self):
        """Cyclic-sharded dic lookup (Ada layout) inside shard_map equals
        a host permuted-array lookup."""
        from jax.sharding import PartitionSpec as P
        from cafe_tpu.parallel.embedding_parallel import shard_map
        from cafe_tpu.parallel.exchange import owner_lookup_cyclic
        mesh = make_mesh(8)
        n, total = 8, 512
        rng = np.random.default_rng(3)
        arr = rng.integers(-50, 50, total).astype(np.int32)
        # store[k] = arr[(k % L)*n + k // L]  (shard-major cyclic)
        L = total // n
        k = np.arange(total)
        store = arr[(k % L) * n + k // L]
        idx = rng.integers(0, total, 256).astype(np.int32)

        def f(a_l, i_l):
            all_i = jax.lax.all_gather(i_l, ("data",), tiled=True)
            out = owner_lookup_cyclic(a_l, all_i, n, ("data",))
            me = jax.lax.axis_index(("data",))
            m = i_l.shape[0]
            return jax.lax.dynamic_slice(out, (me * m,), (m,))

        got = shard_map(f, mesh, in_specs=(P("data"), P("data")),
                        out_specs=P("data"))(jnp.asarray(store),
                                             jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), arr[idx])

    def test_owner_rows_with_oracle(self):
        """owner_rows_with + psum equals a plain global-table gather, for
        both an identity fetch and a transforming fetch."""
        from jax.sharding import PartitionSpec as P
        from cafe_tpu.parallel.embedding_parallel import shard_map
        from cafe_tpu.parallel.exchange import owner_rows_with
        mesh = make_mesh(8)
        rng = np.random.default_rng(4)
        table = rng.normal(0, 1, (512, 8)).astype(np.float32)
        idx = rng.integers(0, 512, 128).astype(np.int32)

        def f(t_l, i_l):
            all_i = jax.lax.all_gather(i_l, ("data",), tiled=True)
            rows = owner_rows_with(lambda j: 2.0 * t_l[j], t_l.shape[0],
                                   all_i, ("data",))
            out = jax.lax.psum(rows, ("data",))
            me = jax.lax.axis_index(("data",))
            m = i_l.shape[0]
            return jax.lax.dynamic_slice(out, (me * m, 0),
                                         (m, t_l.shape[1]))

        got = shard_map(f, mesh, in_specs=(P("data", None), P("data")),
                        out_specs=P("data", None))(jnp.asarray(table),
                                                   jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(got), 2.0 * table[idx],
                                   atol=1e-6)

    def test_lookup_update_roundtrip(self):
        from cafe_tpu.parallel.embedding_parallel import (
            sharded_embedding_lookup_and_update)
        mesh = make_mesh(8)
        rng = np.random.default_rng(2)
        table = jnp.asarray(rng.normal(0, 1, (256, 8)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 256, 64).astype(np.int32))
        rows, new_table = sharded_embedding_lookup_and_update(
            mesh, table, ids, lambda r: jnp.ones_like(r), lr=0.5)
        ref_rows = table[ids]
        np.testing.assert_allclose(np.asarray(rows), np.asarray(ref_rows),
                                   atol=1e-6)
        ref_table = table.at[ids].add(-0.5 * jnp.ones((64, 8)))
        np.testing.assert_allclose(np.asarray(new_table),
                                   np.asarray(ref_table), atol=1e-5)


class TestExplicitProductionPath:
    """The round-2 production path: dedup + AG/psum-scatter exchange with
    SHARD-LOCAL sketches inside the real train step (not a demo module).
    Verifies numerics, sketch invariants, and — critically — that the
    compiled HLO moves O(batch), never O(table), bytes."""

    def _cfg(self, method="cafe", vocab=30000, **kw):
        base = dict(dataset="synthetic", embedding_dim=16,
                    compress_method=method, compress_rate=0.05,
                    cafe_sketch_threshold=5.0, learning_rate=0.1,
                    synthetic_rows=16384, synthetic_fields=4,
                    synthetic_vocab=vocab, synthetic_dense=13,
                    mini_batch_size=128, shard_embeddings=True)
        base.update(kw)
        return Config(**base)

    def _build_sharded(self, cfg, train):
        from cafe_tpu.parallel import shard_train_step
        mesh = make_mesh(8)
        model, embed, state, step, eval_step = build_all(cfg, train,
                                                         mesh=mesh)
        sharded, st = shard_train_step(step, mesh, state,
                                       shard_embeddings=True)
        self._last_model = model  # for serving-path tests; avoids a
        # second build_all (a full second state at 2^22-row vocabs)
        return embed, sharded, st, eval_step, mesh

    def test_parts_activate_explicit_mode(self):
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, _, _, _, mesh = self._build_sharded(cfg, train)
        assert any(p.mesh is not None for p in embed.parts), \
            "no part opted into the explicit exchange"

    def test_full_table_explicit_matches_single_device(self):
        """The hash/full exchange is promotion-free, so explicit sharding
        must reproduce the single-device numbers (up to fp reassociation
        in the duplicate-combining sums)."""
        cfg = self._cfg(method=None, compress_rate=1.0)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        _, sharded, s2, _, _ = self._build_sharded(cfg, train)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:6]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        t1 = np.asarray(s1.embed["part0"]["table"])
        t2 = np.asarray(jax.device_get(s2.embed["part0"]["table"]))
        np.testing.assert_allclose(t1, t2, atol=3e-5)

    def test_adagrad_explicit_matches_single_device(self):
        cfg = self._cfg(method="hash", compress_rate=0.2,
                        optimizer="adagrad")
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        _, sharded, s2, _, _ = self._build_sharded(cfg, train)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:5]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        np.testing.assert_allclose(
            np.asarray(s1.embed["part0"]["table_acc"]),
            np.asarray(jax.device_get(s2.embed["part0"]["table_acc"])),
            atol=3e-5)

    def test_adam_explicit_matches_single_device(self):
        """Rows-Adam under the explicit exchange: m/v shard with the
        table, the step scalar t replicates (exchange.slot_specs)."""
        cfg = self._cfg(method="hash", compress_rate=0.2,
                        optimizer="adam", learning_rate=0.003)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        _, sharded, s2, _, _ = self._build_sharded(cfg, train)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:5]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        assert int(jax.device_get(s2.embed["part0"]["table_t"])) == 5
        np.testing.assert_allclose(
            np.asarray(s1.embed["part0"]["table_v"]),
            np.asarray(jax.device_get(s2.embed["part0"]["table_v"])),
            atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(s1.embed["part0"]["table"]),
            np.asarray(jax.device_get(s2.embed["part0"]["table"])),
            atol=3e-5)

    def test_qr_explicit_matches_single_device(self):
        """QR under the explicit exchange: the quotient table row-shards
        (owner-compute), the O(collisions) remainder table stays
        replicated by design."""
        from cafe_tpu.embeddings.base import QRPart
        cfg = self._cfg(method="qr", compress_rate=0.05)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        embed2, sharded, s2, _, _ = self._build_sharded(cfg, train)
        qr = [p for p in embed2.parts if isinstance(p, QRPart)]
        assert qr and all(p.mesh is not None for p in qr), \
            "QR part did not activate the explicit exchange"
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:5]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        for key in ("q", "r"):
            np.testing.assert_allclose(
                np.asarray(s1.embed["part0"][key]),
                np.asarray(jax.device_get(s2.embed["part0"][key])),
                atol=3e-5)

    @pytest.mark.parametrize("operation", ["mult", "concat"])
    def test_qr_composition_ops_explicit_match(self, operation):
        """The legacy QR composition ops under the explicit exchange:
        mult reuses the forward's carried factors (one q exchange),
        concat splits D/2 halves."""
        cfg = self._cfg(method="qr", compress_rate=0.05,
                        qr_operation=operation)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        embed2, sharded, s2, _, _ = self._build_sharded(cfg, train)
        from cafe_tpu.embeddings.base import QRPart
        assert any(isinstance(p, QRPart) and p.mesh is not None
                   for p in embed2.parts)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:4]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        for key in ("q", "r"):
            np.testing.assert_allclose(
                np.asarray(s1.embed["part0"][key]),
                np.asarray(jax.device_get(s2.embed["part0"][key])),
                atol=3e-5)

    def test_off_explicit_matches_single_device(self):
        """Off under the explicit exchange: unified hot/cold table
        row-shards; the hot_dict row-shards and is answered owner-compute
        (never replicated, never gathered)."""
        from cafe_tpu.embeddings.base import OffPart
        cfg = self._cfg(method="off", compress_rate=0.05)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        model, embed1, s1, step1, _ = build_all(cfg, train)
        embed2, sharded, s2, _, _ = self._build_sharded(cfg, train)
        off = [p for p in embed2.parts if isinstance(p, OffPart)]
        assert off and all(p.mesh is not None for p in off), \
            "Off part did not activate the explicit exchange"
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:5]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s1, m1 = step1(s1, *args)
            s2, m2 = sharded(s2, *args)
            assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                      rel=3e-4)
        np.testing.assert_allclose(
            np.asarray(s1.embed["part0"]["table"]),
            np.asarray(jax.device_get(s2.embed["part0"]["table"])),
            atol=3e-5)

    def test_unique_compact_matches_full(self):
        """Capacity-bounded unique-compact exchange (shard_unique_frac):
        identical training numbers to the full-size exchange on a skewed
        stream — dedup+compact is semantics-free, capacity only bounds
        the wire buffers."""
        from cafe_tpu.train.loop import get_dataset
        # per-device lanes m = 512*4/8 = 256; frac 0.5 -> C = 128 < m
        cfg_a = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512)
        cfg_b = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512, shard_unique_frac=0.5)
        train = get_dataset(cfg_a, "train")
        _, full_step, s_a, _, _ = self._build_sharded(cfg_a, train)
        embed_b, compact_step, s_b, _, _ = self._build_sharded(cfg_b, train)
        assert any(p.unique_frac > 0 for p in embed_b.parts)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 512, drop_last=True))[:5]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s_a, m_a = full_step(s_a, *args)
            s_b, m_b = compact_step(s_b, *args)
            assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]),
                                                       rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_a.embed["part0"]["table"])),
            np.asarray(jax.device_get(s_b.embed["part0"]["table"])),
            atol=3e-6)

    def test_unique_compact_overflow_fallback(self):
        """A capacity far below the distinct-id count must trigger the
        full-size fallback branch — same numbers, never dropped rows.
        (m = 256 lanes/device; a near-uniform batch over a 2^20 vocab
        has ~250 distinct rows, far above C = 64.)"""
        from cafe_tpu.train.loop import get_dataset
        cfg_a = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512, vocab=2 ** 20)
        cfg_b = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512, vocab=2 ** 20,
                          shard_unique_frac=0.25)
        train = get_dataset(cfg_a, "train")
        _, full_step, s_a, _, _ = self._build_sharded(cfg_a, train)
        _, compact_step, s_b, _, _ = self._build_sharded(cfg_b, train)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 512, drop_last=True))[:3]:
            args = (jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            s_a, m_a = full_step(s_a, *args)
            s_b, m_b = compact_step(s_b, *args)
            assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]),
                                                       rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_a.embed["part0"]["table"])),
            np.asarray(jax.device_get(s_b.embed["part0"]["table"])),
            atol=3e-6)

    def test_unique_compact_shrinks_wire_buffers(self):
        """HLO A/B: with the compact exchange on, the LARGEST row-moving
        collective shrinks by >= 2x vs the full-size exchange (the
        fallback branch still exists in the HLO — the win is the compact
        branch the skewed steps execute)."""
        from cafe_tpu.tools.hlo_traffic import collective_stats
        from cafe_tpu.train.loop import get_dataset
        # m = 256 lanes/device; frac 0.25 -> C = 64: the compact
        # branch's grad AG is [8*64, 16] f32 = 128 KiB vs the full
        # exchange's [8*256, 16] = 512 KiB
        cfg_a = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512)
        cfg_b = self._cfg(method="hash", compress_rate=0.2,
                          mini_batch_size=512, shard_unique_frac=0.25)
        train = get_dataset(cfg_a, "train")
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, 512, drop_last=True)))

        def stats_of(cfg):
            _, step, st, _, _ = self._build_sharded(cfg, train)
            args = (st, jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label), jnp.asarray(valid))
            txt = step.lower(*args).compile().as_text()
            return collective_stats(txt)

        stats_a = stats_of(cfg_a)
        stats_b = stats_of(cfg_b)
        C, D, n = 64, 16, 8
        # the full exchange's biggest op (the grad/row AG at 2048 lanes)
        big_a = max(c.result_bytes for c in stats_a)
        assert big_a >= n * 256 * D * 4
        # the compact branch's C-lane ops must exist in b's HLO:
        # ids AG [n*C] i32 and a row/grad exchange at n*C*D*4
        sizes_b = {c.result_bytes for c in stats_b}
        assert n * C * 4 in sizes_b, f"no C-lane id AG: {sorted(sizes_b)}"
        assert any(s == n * C * D * 4 or s == C * D * 4 for s in sizes_b), \
            f"no C-lane row exchange: {sorted(sizes_b)}"
        # and those are >= 4x smaller than the full path's biggest op
        assert n * C * D * 4 * 4 <= big_a

    def test_ada_explicit_runs_and_invariants(self):
        """AdaEmbed under the explicit exchange: shard-local sampled
        check/rebuild (triggered at step 1 like the reference), global
        slot uniqueness across the per-shard ranges, slot 0 never
        assigned, loss finite."""
        from cafe_tpu.embeddings.ada import AdaPart
        # ada's budget formula (init_embed.py:83) needs dim*cr > 2 words
        # of dic/grad_norm overhead; dim 64 @ cr 0.05 -> hotn = N*0.0188
        cfg = self._cfg(method="ada", compress_rate=0.05, vocab=80000,
                        embedding_dim=64)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        ada = [p for p in embed.parts if isinstance(p, AdaPart)]
        assert ada and all(p.mesh is not None for p in ada), \
            "Ada part did not activate the explicit exchange"
        part = ada[0]
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:12]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        assert np.isfinite(float(m["loss"]))
        assert int(m["ada_admitted"]) > 0
        i = next(i for i, p in enumerate(embed.parts) if p is part)
        ps = jax.device_get(st.embed[f"part{i}"])
        dic = np.asarray(ps["dic"])
        live = dic[dic != 0]
        assert len(np.unique(live)) == len(live), \
            "two features share a hot slot"
        n = part.n_shards
        W_l = ps["weight"].shape[0] // n
        L = dic.shape[0] // n
        assert (live >= 1).all()
        # every live slot was assigned by the cyclic owner of its id:
        # store lane k belongs to shard k // L, whose slot range is
        # [shard*W_l, (shard+1)*W_l)
        shard_of_lane = np.arange(dic.shape[0]) // L
        owners = shard_of_lane[dic != 0]
        assert ((live // W_l) == owners).all(), \
            "a slot was assigned outside its owner's range"
        # weight row 0 pinned zero (not-admitted sentinel)
        assert np.abs(ps["weight"][0]).max() == 0.0

    def test_cafe_sharded_sketch_invariants(self):
        """After training: every shard's allocated + free local slots
        partition [1, S_l), and globally no hot slot serves two ids."""
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        part = embed.parts[0]
        assert part.mesh is not None
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:30]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        sk = jax.device_get(st.embed["part0"]["sketch"])
        n, s_l = part.n_shards, part._s_l
        dic = np.asarray(sk.dic)
        free = np.asarray(sk.free).reshape(n, s_l)
        ftop = np.asarray(sk.free_top)
        used_global = []
        for s in range(n):
            d = dic[s * s_l:(s + 1) * s_l]
            used = d[d != 0]
            assert len(np.unique(used)) == len(used), f"shard {s} dup slot"
            assert ((used >= 1) & (used < s_l)).all()
            fr = free[s, : ftop[s]]
            assert ((fr >= 1) & (fr < s_l)).all()
            both = np.concatenate([used, fr])
            assert len(np.unique(both)) == len(both), \
                f"shard {s}: slot both free and allocated"
            assert len(both) == s_l - 1, \
                f"shard {s}: slots leaked ({len(both)} != {s_l - 1})"
            used_global.append(used + s * s_l)
        allg = np.concatenate(used_global)
        assert len(np.unique(allg)) == len(allg)
        assert int(m["cafe_promotions"]) >= 0
        assert (allg < part.hash_base).all()  # hot rows stay in hot region

    def test_cafe_sharded_learns_like_single_device(self):
        """Shard-local promotion is a semantics change (per-shard free
        lists); assert the QUALITY is within noise of the global sketch."""
        data = make_synthetic_arrays(rows=60000, fields=4, vocab=20000,
                                     dense=4, zipf=1.2, seed=7)
        cut = len(data) * 6 // 7
        from cafe_tpu.data.datasets import CTRArrays
        train = CTRArrays(data.sparse[:cut], data.dense[:cut],
                          data.label[:cut], data.counts)
        test = CTRArrays(data.sparse[cut:], data.dense[cut:],
                         data.label[cut:], data.counts)
        cfg = Config(dataset="synthetic", embedding_dim=16,
                     compress_method="cafe", compress_rate=0.003,
                     cafe_sketch_threshold=20.0, cafe_hash_rate=0.3,
                     learning_rate=0.1, mini_batch_size=256,
                     test_mini_batch_size=4096, shard_embeddings=True)
        from cafe_tpu.train.loop import inference

        def train_run(sharded_mode):
            if sharded_mode:
                embed, step, st, ev, _ = self._build_sharded(cfg, train)
            else:
                model, embed, st, step, ev = build_all(cfg, train)
            for _ in range(4):
                for dense, sparse, label, valid in batch_iterator(
                        train, 256, drop_last=True):
                    st, _ = step(st, jnp.asarray(dense),
                                 jnp.asarray(sparse), jnp.asarray(label),
                                 jnp.asarray(valid))
            metrics, _ = inference(cfg, ev, st, test)
            return metrics["roc_auc"]

        auc_single = train_run(False)
        auc_sharded = train_run(True)
        # shard-local promotion must not cost meaningful quality
        assert auc_sharded > auc_single - 0.01, \
            f"sharded {auc_sharded:.4f} vs single {auc_single:.4f}"

    @pytest.mark.parametrize("method,cr,vocab,dim", [
        (None, 1.0, 262144, 16), ("hash", 0.2, 2 ** 20, 16),
        ("qr", 0.05, 2 ** 21, 16), ("off", 0.05, 2 ** 22, 16),
        ("ada", 0.05, 2 ** 21, 64),
    ])
    def test_hlo_no_table_sized_collectives(self, method, cr, vocab, dim):
        """Compile the sharded step and audit every collective: nothing
        close to table size may move (the auto-partitioner's legal
        fallback all-gathers the table; the explicit path must not) —
        for EVERY method with an explicit exchange. CAFE/Ada have their
        own audits (migration/rebuild traffic classes)."""
        from cafe_tpu.tools.hlo_traffic import collective_stats
        cfg = self._cfg(method=method, compress_rate=cr, vocab=vocab,
                        embedding_dim=dim)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        assert any(p.mesh is not None for p in embed.parts), \
            f"{method}: no part activated the explicit exchange"
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, 128, drop_last=True)))
        args = (st, jnp.asarray(dense), jnp.asarray(sparse),
                jnp.asarray(label), jnp.asarray(valid))
        txt = sharded.lower(*args).compile().as_text()
        stats = collective_stats(txt)
        assert stats, "no collectives found — not actually sharded?"
        part0 = st.embed["part0"]
        big_table = max(v.shape[0] for k, v in part0.items()
                        if getattr(v, "ndim", 0) == 2)
        table_bytes = 4 * dim * big_table
        # legitimate traffic classes: the O(batch) embedding exchange,
        # the O(params) DP dense-tower grad all-reduce, and (qr only) the
        # replicated O(collisions) remainder-table grad all-reduce
        m_ids = 128 * 4
        dense_bytes = 4 * sum(l.size for l in jax.tree.leaves(st.params))
        bound = max(8 * m_ids * (dim + 4) * 4, 2 * dense_bytes)
        if method == "qr":
            r_bytes = 4 * np.prod(part0["r"].shape)
            bound = max(bound, 2 * int(r_bytes))
        assert bound < table_bytes // 8
        big = [c for c in stats if c.result_bytes > bound]
        assert not big, (
            f"{method}: collectives exceed the O(batch) bound {bound}B "
            f"(table={table_bytes}B): "
            + "; ".join(f"{c.op}:{c.result_bytes}B" for c in big[:5]))
        # bytes-moved model check (PERF.md): per step the embedding
        # exchange moves ~ ids AG (M*4) + rows psum_scatter (M*D*4) +
        # grads AG (M*(D+?)*4); the TOTAL across all collectives must stay
        # within a small multiple of model + DP tower traffic — a
        # quadratic/table-sized regression would blow through this even
        # if each individual op snuck under the per-op bound
        total = sum(c.result_bytes for c in stats)
        model_bytes = m_ids * 4 + 2 * m_ids * dim * 4  # ids + fwd/bwd rows
        slack = 8 if method in (None, "hash") else 16
        extra = 0 if method != "qr" else int(
            4 * np.prod(part0["r"].shape))
        assert total <= slack * (model_bytes + dense_bytes + extra), (
            f"{method}: total collective bytes {total} >> model "
            f"{model_bytes}+{dense_bytes}+{extra}")

    @pytest.mark.parametrize("method,vocab,dim", [
        ("off", 2 ** 22, 16), ("cafe", 2 ** 22, 16), ("ada", 2 ** 21, 64),
        ("hash", 2 ** 22, 16), ("qr", 2 ** 22, 16),
    ])
    def test_hlo_quantized_serving_no_table_collectives(self, method,
                                                        vocab, dim):
        """The int8 serving path on the live mesh must also move O(batch)
        bytes only — the O(vocab) routing maps (Off's hot_dict, Ada's dic)
        and the quantized codes must never be gathered table-sized (the
        serving-path counterpart of the training-path audit above)."""
        from cafe_tpu.tools.hlo_traffic import collective_stats
        from cafe_tpu.train.step import build_quantized_eval_step
        cfg = self._cfg(method=method, compress_rate=0.05, vocab=vocab,
                        embedding_dim=dim)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, mesh = self._build_sharded(cfg, train)
        q8 = build_quantized_eval_step(self._last_model, embed, st, 8)
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, 128, drop_last=True)))
        txt = q8.lower(st, jnp.asarray(dense),
                       jnp.asarray(sparse)).compile().as_text()
        stats = collective_stats(txt)
        part0 = st.embed["part0"]
        big_table = max(v.shape[0] for k, v in part0.items()
                        if getattr(v, "ndim", 0) == 2)
        table_bytes = cfg.embedding_dim * big_table  # int8 codes
        m_ids = 128 * 4
        bound = 8 * m_ids * (cfg.embedding_dim + 4) * 4
        assert bound < table_bytes // 8
        big = [c for c in stats if c.result_bytes > bound]
        assert not big, (
            f"{method} quantized serving: collectives exceed the O(batch) "
            f"bound {bound}B (codes={table_bytes}B): "
            + "; ".join(f"{c.op}:{c.result_bytes}B" for c in big[:5]))

    def test_hlo_cafe_no_table_sized_collectives(self):
        from cafe_tpu.tools.hlo_traffic import collective_stats
        cfg = self._cfg(method="cafe", vocab=262144, compress_rate=0.02)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        part = embed.parts[0]
        assert part.mesh is not None
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, 128, drop_last=True)))
        args = (st, jnp.asarray(dense), jnp.asarray(sparse),
                jnp.asarray(label), jnp.asarray(valid))
        txt = sharded.lower(*args).compile().as_text()
        stats = collective_stats(txt)
        assert stats
        m_ids = 128 * 4
        # batch rows + id/slot psums + bounded migration exchange + DP
        # dense-tower grads
        mig = part.n_shards * min(part.mig_lanes, part._s_l - 1)
        dense_bytes = 4 * sum(l.size for l in jax.tree.leaves(st.params))
        bound = max(8 * (m_ids * (16 + 4) * 4 + mig * 16 * 4),
                    2 * dense_bytes)
        big = [c for c in stats if c.result_bytes > bound]
        assert not big, (
            f"collectives exceed O(batch)+migration bound {bound}B: "
            + "; ".join(f"{c.op}:{c.result_bytes}B" for c in big[:5]))

    def test_cafe_plus_sharded_runs_and_invariants(self):
        """CAFE+ (two-tier, adaptive threshold) under the explicit
        exchange: per-shard thresholds/free lists, global slot
        uniqueness, finite training."""
        cfg = self._cfg(cafe_plus=True, cafe_sketch_threshold=3.0)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        part = embed.parts[0]
        assert part.mesh is not None and part.plus
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:25]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        assert np.isfinite(float(m["loss"]))
        sk = jax.device_get(st.embed["part0"]["sketch"])
        n, s_l = part.n_shards, part._s_l
        d1 = np.asarray(sk.dic1).reshape(n, -1)
        d2 = np.asarray(sk.dic2).reshape(n, -1)
        ftop = np.asarray(sk.free_top)
        free = np.asarray(sk.free).reshape(n, s_l)
        total_hot = 0
        for s in range(n):
            used = np.concatenate([d1[s][d1[s] != 0], d2[s][d2[s] != 0]])
            assert len(np.unique(used)) == len(used), f"shard {s} dup"
            assert ((used >= 1) & (used < s_l)).all()
            both = np.concatenate([used, free[s, :ftop[s]]])
            assert len(np.unique(both)) == len(both)
            assert len(both) == s_l - 1, f"shard {s} slot leak"
            total_hot += len(used)
        assert total_hot > 0, "no promotions happened"
        # per-shard adaptive thresholds are independent scalars
        assert np.asarray(sk.threshold).shape == (n,)

    def test_sharded_checkpoint_roundtrip(self, tmp_path):
        """Save the explicit-sharded state (per-shard free lists and all),
        restore into a fresh sharded build, predictions identical."""
        from cafe_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint)
        from cafe_tpu.parallel import shard_train_step
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        mesh = make_mesh(8)
        model, embed, state, step, ev = build_all(cfg, train, mesh=mesh)
        sharded, st = shard_train_step(step, mesh, state,
                                       shard_embeddings=True)
        batches = list(batch_iterator(train, 128, drop_last=True))[:12]
        for dense, sparse, label, valid in batches:
            st, _ = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        path = str(tmp_path / "shck")
        save_checkpoint(path, jax.device_get(st), {"iter": 12, "epoch": 0,
                                                   "test_acc": 0.0})
        model2, embed2, fresh, step2, ev2 = build_all(cfg, train, mesh=mesh)
        restored, extra = load_checkpoint(path, fresh)
        assert extra["iter"] == 12
        _, restored = shard_train_step(step2, mesh, restored,
                                       shard_embeddings=True)
        dense, sparse, _, _ = batches[0]
        p1 = ev(jax.device_get(st), jnp.asarray(dense), jnp.asarray(sparse))
        p2 = ev2(restored, jnp.asarray(dense), jnp.asarray(sparse))
        np.testing.assert_allclose(np.asarray(jax.device_get(p1)),
                                   np.asarray(jax.device_get(p2)),
                                   atol=1e-6)
        # sketch layout survived: per-shard free_top lanes
        sk = jax.device_get(restored.embed["part0"]["sketch"])
        assert np.asarray(sk.free_top).shape == (8,)

    def test_quantized_serving_of_sharded_state(self):
        """int8 serving a sharded-trained CAFE state: the sharded-layout
        sketch query (query_sharded) must route identically to the
        training-path gather."""
        from cafe_tpu.train.step import build_quantized_eval_step
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, ev, mesh = self._build_sharded(cfg, train)
        batches = list(batch_iterator(train, 128, drop_last=True))[:15]
        for dense, sparse, label, valid in batches:
            st, _ = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        host_state = jax.device_get(st)
        from cafe_tpu.train.loop import build_all
        model2, embed2, _, _, ev2 = build_all(cfg, train, mesh=mesh)
        q8 = build_quantized_eval_step(model2, embed2, host_state, 8)
        dense, sparse, label, valid = batches[0]
        p_f = np.asarray(jax.device_get(
            ev(st, jnp.asarray(dense), jnp.asarray(sparse))))
        p_q = np.asarray(jax.device_get(
            q8(host_state, jnp.asarray(dense), jnp.asarray(sparse))))
        assert np.abs(p_f - p_q).mean() < 0.01

    def test_meshless_serving_of_sharded_state(self):
        """A sharded-trained checkpoint served on a single chip WITHOUT a
        mesh: enable_sharded_layout adopts the n-shard state layout so
        load + int8 serving work where no mesh exists (the deployment
        story ADVICE r2 flagged as unreachable)."""
        from cafe_tpu.embeddings.cafe import CafePart
        from cafe_tpu.train.step import build_quantized_eval_step
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, ev, mesh = self._build_sharded(cfg, train)
        batches = list(batch_iterator(train, 128, drop_last=True))[:15]
        for dense, sparse, label, valid in batches:
            st, _ = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        host_state = jax.device_get(st)
        # fresh single-chip build: NO mesh anywhere; layout must be
        # enabled BEFORE state init so the restore template matches
        from cafe_tpu.train.step import init_state
        model2, embed2, _, _, _ = build_all(cfg, train)
        n = mesh.devices.size
        for p in embed2.parts:
            if isinstance(p, CafePart):
                assert p.mesh is None
                assert p.enable_sharded_layout(n)
        fresh = init_state(model2, embed2, cfg.numpy_rand_seed,
                           cfg.optimizer)
        # template structure must fit the sharded state (free_top [n] ...)
        st2 = jax.tree.map(lambda a, b: jnp.asarray(b),
                           fresh, host_state)  # structure check + load
        q8 = build_quantized_eval_step(model2, embed2, st2, 8)
        dense, sparse, label, valid = batches[0]
        p_f = np.asarray(jax.device_get(
            ev(st, jnp.asarray(dense), jnp.asarray(sparse))))
        p_q = np.asarray(q8(st2, jnp.asarray(dense), jnp.asarray(sparse)))
        assert np.abs(p_f - p_q).mean() < 0.01

    @pytest.mark.parametrize("method,vocab,dim", [
        ("off", 30000, 16), ("ada", 2 ** 20, 64),
    ])
    def test_quantized_serving_on_mesh(self, method, vocab, dim):
        """int8 serving ON the live mesh for methods with an O(vocab)
        routing map (Off's hot_dict, Ada's dic): the map must be answered
        owner-compute in the quantized path too (regression: a direct
        index would make the auto-partitioner replicate the O(vocab) map
        per eval batch)."""
        from cafe_tpu.train.step import build_quantized_eval_step
        cfg = self._cfg(method=method, compress_rate=0.05, vocab=vocab,
                        embedding_dim=dim)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, ev, mesh = self._build_sharded(cfg, train)
        assert any(p.mesh is not None for p in embed.parts)
        batches = list(batch_iterator(train, 128, drop_last=True))[:8]
        for dense, sparse, label, valid in batches:
            st, _ = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        q8 = build_quantized_eval_step(self._last_model, embed, st, 8)
        dense, sparse, label, valid = batches[0]
        p_f = np.asarray(jax.device_get(
            ev(st, jnp.asarray(dense), jnp.asarray(sparse))))
        p_q = np.asarray(jax.device_get(
            q8(st, jnp.asarray(dense), jnp.asarray(sparse))))
        assert np.abs(p_f - p_q).mean() < 0.01

    def test_sharded_layout_training_raises(self):
        """enable_sharded_layout is serving-only: a train step against the
        mesh-less sharded layout must raise instead of silently corrupting
        the sharded sketch with flat-layout inserts."""
        from cafe_tpu.embeddings.cafe import CafePart
        cfg = self._cfg()
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        from cafe_tpu.train.step import init_state
        model, embed, _, _, _ = build_all(cfg, train)
        cafe = [p for p in embed.parts if isinstance(p, CafePart)]
        assert cafe and cafe[0].enable_sharded_layout(8)
        state = init_state(model, embed, cfg.numpy_rand_seed, cfg.optimizer)
        p = cafe[0]
        ids = jnp.zeros((4, len(p.field_idx)), jnp.int32)
        raw, aux = p.gather(state.embed["part0"], ids)
        g = jnp.ones_like(raw)
        with pytest.raises(RuntimeError, match="serving/inspection"):
            p.apply_grads(state.embed["part0"], ids, g, aux, 0.1)

    def test_separate_field_sharded(self):
        """--cafe_hot_separate_field builds one CafePart (and sketch) per
        field; each shards independently under the explicit exchange."""
        cfg = self._cfg(cafe_hot_separate_field=True, vocab=40000,
                        synthetic_vocab_spread=0.5)
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        from cafe_tpu.embeddings.cafe import CafePart
        cafe_parts = [p for p in embed.parts if isinstance(p, CafePart)]
        assert len(cafe_parts) > 1
        assert all(p.mesh is not None for p in cafe_parts)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:6]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        assert np.isfinite(float(m["loss"]))
        assert 0.0 <= float(m["cafe_hot_frac"]) <= 1.0

    def test_cafe_adagrad_sharded(self):
        """CAFE + Adagrad under the explicit exchange: accumulator
        row-shards and updates owner-compute; loss finite, slots sane."""
        cfg = self._cfg(optimizer="adagrad")
        from cafe_tpu.train.loop import get_dataset
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = self._build_sharded(cfg, train)
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:8]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        assert np.isfinite(float(m["loss"]))
        acc = np.asarray(jax.device_get(st.embed["part0"]["table_acc"]))
        assert (acc >= 0).all() and acc.sum() > 0


class TestTrafficPrediction:
    """Per-mesh-size predicted-bytes model (hlo_traffic.model_result_bytes
    == the docs/PERF.md byte model in HLO-result terms) checked against
    the compiled step — the scaling analogue of
    test_two_level_outer_traffic_leq_inner's ordering assertion.
    ("hlo" in the names keeps these in the quick tier: compile-only.)"""

    def _measure(self, method, n, cr=0.2, batch=128, fields=4, dim=16):
        from cafe_tpu.tools.hlo_traffic import collective_stats
        from cafe_tpu.parallel import make_mesh, shard_train_step
        cfg = Config(dataset="synthetic", embedding_dim=dim,
                     compress_method=method, compress_rate=cr,
                     cafe_sketch_threshold=5.0, learning_rate=0.1,
                     synthetic_rows=4096, synthetic_fields=fields,
                     synthetic_vocab=2 ** 17, synthetic_dense=13,
                     mini_batch_size=batch, shard_embeddings=True)
        from cafe_tpu.train.loop import get_dataset, build_all
        train = get_dataset(cfg, "train")
        mesh = make_mesh(n)
        model, embed, state, step, _ = build_all(cfg, train, mesh=mesh)
        sharded, st = shard_train_step(step, mesh, state,
                                       shard_embeddings=True)
        dense, sparse, label, valid = next(iter(
            batch_iterator(train, batch, drop_last=True)))
        txt = sharded.lower(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label),
                            jnp.asarray(valid)).compile().as_text()
        total = sum(c.result_bytes for c in collective_stats(txt))
        params = 4 * sum(l.size for l in jax.tree.leaves(st.params))
        return total, params, batch * fields

    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_hlo_total_tracks_model_across_mesh_sizes(self, n):
        from cafe_tpu.tools.hlo_traffic import model_result_bytes
        total, params, m_lanes = self._measure("hash", n)
        model = model_result_bytes(m_lanes, 16, n, params)["total"]
        # compiled total must track the analytic model: above a floor
        # (the exchange really happened) and under a small slack (no
        # hidden table-sized or quadratic-in-n traffic)
        assert 0.5 * model <= total <= 3.0 * model, (n, total, model)

    @pytest.mark.parametrize("n", [2, 8])
    def test_hlo_cafe_total_tracks_model(self, n):
        from cafe_tpu.tools.hlo_traffic import model_result_bytes
        total, params, m_lanes = self._measure("cafe", n, cr=0.05)
        model = model_result_bytes(m_lanes, 16, n, params,
                                   method="cafe")["total"]
        assert 0.5 * model <= total <= 4.0 * model, (n, total, model)
