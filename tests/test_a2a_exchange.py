"""Request-routed all-to-all exchange (--shard_exchange a2a / pallas).

The explicit exchange all-gathers every device's id list and
psum_scatters a row buffer that is mostly zeros (~m*D*4*(n-1)
bytes/device); the a2a exchange ships each owner only the rows it was
asked for (~m*D*4*(n-1)/n) — an ~n-fold wire reduction on the row legs
(parallel/exchange.py:sharded_fetch_a2a). These tests pin: the routing
math against a numpy oracle, numerical equivalence of both exchange legs
and of the full sharded train step, the skew-overflow fallback, the
pallas remote-DMA substitution (interpret mode), and the HLO byte
comparison vs the explicit path (VERDICT r4 item 7).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cafe_tpu.config import Config
from cafe_tpu.data import batch_iterator
from cafe_tpu.parallel import make_mesh, shard_train_step
from cafe_tpu.parallel.exchange import (DROP_ROW, a2a_cap,
                                        route_to_owners, sharded_apply,
                                        sharded_apply_a2a, sharded_fetch,
                                        sharded_fetch_a2a)
from cafe_tpu.train.loop import build_all, get_dataset


def test_route_to_owners_oracle():
    rng = np.random.default_rng(0)
    n, rows_l, m, cap = 8, 128, 256, a2a_cap(256, 8)
    flat = rng.integers(0, n * rows_l, m).astype(np.int32)
    flat[5] = DROP_ROW  # padded lane: must not ship
    reqs, owner, slot, overflow = jax.jit(
        route_to_owners, static_argnums=(1, 2, 3))(
            jnp.asarray(flat), rows_l, n, cap)
    reqs, owner, slot = map(np.asarray, (reqs, owner, slot))
    assert not bool(overflow)
    # every valid lane's id sits at reqs[owner, slot]
    for i in range(m):
        if flat[i] == DROP_ROW:
            assert owner[i] == n
            continue
        assert owner[i] == flat[i] // rows_l
        assert reqs[owner[i], slot[i]] == flat[i]
    # request rows contain exactly the ids owned by that shard
    for o in range(n):
        want = sorted(flat[(flat != DROP_ROW)
                           & (flat // rows_l == o)].tolist())
        got = sorted(reqs[o][reqs[o] != DROP_ROW].tolist())
        assert got == want


def test_route_overflow_detected():
    n, rows_l = 8, 128
    flat = jnp.zeros(256, jnp.int32)  # every lane -> owner 0
    cap = 128
    *_, overflow = route_to_owners(flat, rows_l, n, cap)
    assert bool(overflow)


@pytest.mark.slow
@pytest.mark.timeout(600)
@pytest.mark.parametrize("impl", ["lax", "pallas_interpret"])
def test_fetch_a2a_matches_direct(impl):
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(0, 1, (1024, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, (64, 4)).astype(np.int32))
    out = sharded_fetch_a2a(mesh, table, idx, impl=impl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]),
                               atol=1e-6)


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_fetch_a2a_skew_falls_back_exact():
    # all ids on one owner: per-peer capacity overflows, the step must
    # take the full explicit path and still return exact rows
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(0, 1, (1024, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (64, 4)).astype(np.int32))
    out = sharded_fetch_a2a(mesh, table, idx, slack=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]),
                               atol=1e-6)


@pytest.mark.slow
@pytest.mark.timeout(600)
@pytest.mark.parametrize("optimizer", ["sgd", "adagrad"])
def test_apply_a2a_matches_explicit(optimizer):
    from cafe_tpu.ops.sparse import init_slots
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(0, 1, (1024, 16)).astype(np.float32))
    slots = init_slots(table, optimizer)
    idx = jnp.asarray(rng.integers(0, 1024, (64, 4)).astype(np.int32))
    grad = jnp.asarray(
        rng.normal(0, 1, (64, 4, 16)).astype(np.float32))
    t1, s1 = sharded_apply(mesh, table, slots, idx, grad, 0.1, optimizer)
    t2, s2 = sharded_apply_a2a(mesh, table, slots, idx, grad, 0.1,
                               optimizer)
    np.testing.assert_allclose(np.asarray(jax.device_get(t1)),
                               np.asarray(jax.device_get(t2)), atol=2e-5)
    for k in s1:
        np.testing.assert_allclose(np.asarray(jax.device_get(s1[k])),
                                   np.asarray(jax.device_get(s2[k])),
                                   atol=2e-5)


class TestFullStepA2A:
    """The full sharded train step with --shard_exchange a2a (and the
    pallas remote-DMA substitution) vs the single-device step."""

    def _cfg(self, **kw):
        base = dict(dataset="synthetic", embedding_dim=16,
                    compress_method="hash", compress_rate=0.2,
                    learning_rate=0.1, synthetic_rows=8192,
                    synthetic_fields=4, synthetic_vocab=30000,
                    synthetic_dense=13, mini_batch_size=128,
                    shard_embeddings=True, shard_exchange="a2a")
        base.update(kw)
        return Config(**base)

    @pytest.mark.slow
    @pytest.mark.timeout(900)
    @pytest.mark.parametrize("method,mode", [
        ("hash", "a2a"), ("hash", "pallas_interpret")])
    def test_matches_single_device(self, method, mode):
        cfg = self._cfg(compress_method=method, shard_exchange=mode)
        train = get_dataset(cfg, "train")
        import dataclasses
        cfg1 = dataclasses.replace(cfg, shard_embeddings=False,
                                   shard_exchange="explicit")
        _, _, s1, step1, _ = build_all(cfg1, train)
        mesh = make_mesh(8)
        _, embed, state, step2, _ = build_all(cfg, train, mesh=mesh)
        assert any(p.exchange_mode == mode for p in embed.parts), \
            "no part adopted the a2a exchange"
        sharded, s2 = shard_train_step(step2, mesh, state,
                                       shard_embeddings=True)
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

    @pytest.mark.slow
    @pytest.mark.timeout(900)
    def test_cafe_a2a_matches_explicit_sharded(self):
        """CAFE vs the EXPLICIT sharded path, not the single-device step:
        the shard-local sketches allocate hot slots from their own free
        lists, so the hot-region ROW ASSIGNMENT legitimately differs from
        the single-device sketch's (content-equivalent, row-permuted —
        test_sharding.py::test_cafe_sharded_learns_like_single_device pins
        that axis). Between the two SHARDED paths the sketch/migration leg
        is byte-identical code; only the row-exchange implementation
        differs, so tables must match to float-reassociation tolerance."""
        cfg = self._cfg(compress_method="cafe", compress_rate=0.05,
                        cafe_sketch_threshold=5.0, shard_exchange="a2a")
        train = get_dataset(cfg, "train")
        import dataclasses
        cfg1 = dataclasses.replace(cfg, shard_exchange="explicit")
        mesh = make_mesh(8)

        def run(c):
            _, embed, state, step, _ = build_all(c, train, mesh=mesh)
            sharded, st = shard_train_step(step, mesh, state,
                                           shard_embeddings=True)
            losses = []
            for dense, sparse, label, valid in list(
                    batch_iterator(train, 128, drop_last=True))[:6]:
                st, m = sharded(st, jnp.asarray(dense),
                                jnp.asarray(sparse), jnp.asarray(label),
                                jnp.asarray(valid))
                losses.append(float(m["loss"]))
            return st, losses

        s_a2a, l_a2a = run(cfg)
        s_exp, l_exp = run(cfg1)
        np.testing.assert_allclose(l_a2a, l_exp, rtol=3e-4)
        t1 = np.asarray(jax.device_get(s_exp.embed["part0"]["table"]))
        t2 = np.asarray(jax.device_get(s_a2a.embed["part0"]["table"]))
        np.testing.assert_allclose(t1, t2, atol=3e-5)


def test_hlo_a2a_row_legs_smaller_than_explicit():
    """Compile both fetch exchanges at n=8 and compare modeled WIRE
    bytes per device (HLO result bytes are a biased proxy: a ring
    reduce-scatter's result is 1/n of what it moves, an all-to-all moves
    (n-1)/n of its result): the a2a path's row legs must be several-fold
    smaller — the whole point of request routing."""
    from cafe_tpu.tools.hlo_traffic import collective_stats, compiled_text
    n = 8
    mesh = make_mesh(n)
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(0, 1, (8192, 64)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 8192, (2048, 8)).astype(np.int32))

    def wire(c):
        if c.op == "reduce-scatter":
            return c.result_bytes * (n - 1)
        if c.op == "all-to-all":
            return c.result_bytes * (n - 1) // n
        if c.op == "all-gather":
            return c.result_bytes * (n - 1) // n
        return c.result_bytes

    f_exp = jax.jit(lambda t, i: sharded_fetch(mesh, t, i))
    f_a2a = jax.jit(lambda t, i: sharded_fetch_a2a(mesh, t, i))
    exp_stats = collective_stats(compiled_text(f_exp, table, idx))
    a2a_stats = collective_stats(compiled_text(f_a2a, table, idx))
    a2a_ops = [c for c in a2a_stats if c.op == "all-to-all"]
    assert a2a_ops, "a2a exchange compiled no all-to-all"
    exp_big = max(wire(c) for c in exp_stats)
    a2a_big = max(wire(c) for c in a2a_ops)
    # explicit row leg: m*D*4*(n-1) per device; a2a row leg:
    # ~slack*m*D*4*(n-1)/n — expect >= 3x at slack 1.5, n 8
    assert a2a_big * 3 <= exp_big, (a2a_big, exp_big)
