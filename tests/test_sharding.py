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
    sharded_step, sh_state = shard_train_step(train_step, mesh, state,
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
