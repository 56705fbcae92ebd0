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
