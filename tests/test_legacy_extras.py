"""Legacy-parity features: cat interaction, interaction-itself, loss clamp,
weighted pooling (v_W_l), QR mult/concat ops, dist/trace synthetic data.

Reference sources: dlrm_s_pytorch.py:343-354 (v_W_l), 779-848 (interaction
ops + loss clamp); tricks/qr_embedding_bag.py:57,136 (QR ops);
dlrm_data_pytorch.py:1092-1404 (distribution + stack-distance generators).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafe_tpu.config import Config
from cafe_tpu.data.synthetic import (
    make_synthetic_arrays,
    make_trace_ids,
    trace_generate_lru,
    trace_profile,
)
from cafe_tpu.embeddings import QRPart, HashedTablePart
from cafe_tpu.train.loop import build_all, get_dataset


def _cfg(**kw):
    base = dict(dataset="synthetic", model="dlrm", embedding_dim=8,
                compress_method=None, mini_batch_size=32,
                synthetic_rows=512, synthetic_fields=4,
                synthetic_vocab=100, synthetic_dense=5, learning_rate=0.1)
    base.update(kw)
    return Config(**base)


def _one_step(cfg):
    train_data = get_dataset(cfg, "train")
    model, embed, state, train_step, eval_step = build_all(cfg, train_data)
    from cafe_tpu.data import batch_iterator
    dense, sparse, label, valid = next(iter(
        batch_iterator(train_data, cfg.mini_batch_size)))
    dx = None if dense is None else jnp.asarray(dense)
    state, m = train_step(state, dx, jnp.asarray(sparse),
                          jnp.asarray(label), valid)
    p = eval_step(state, dx, jnp.asarray(sparse))
    return state, m, np.asarray(p)


# --- interaction ops -------------------------------------------------------

def test_cat_interaction_runs_and_learns():
    state, m, p = _one_step(_cfg(arch_interaction_op="cat"))
    assert np.isfinite(float(m["loss"]))
    assert p.shape == (32,)
    assert np.all((p >= 0) & (p <= 1))


def test_interaction_itself_widens_top_mlp():
    cfg_a = _cfg(arch_interaction_itself=False)
    cfg_b = _cfg(arch_interaction_itself=True)
    model_a = build_all(cfg_a)[0]
    model_b = build_all(cfg_b)[0]
    nf = 4 + 1
    assert model_b.ln_top[0] - model_a.ln_top[0] == nf  # +diagonal terms
    state, m, p = _one_step(cfg_b)
    assert np.isfinite(float(m["loss"]))


def test_loss_threshold_clamps_probs():
    t = 0.2
    _, _, p = _one_step(_cfg(loss_threshold=t))
    assert p.min() >= t - 1e-6 and p.max() <= 1 - t + 1e-6


# --- weighted pooling ------------------------------------------------------

def _weighted_part(weighted, optimizer="sgd"):
    rng = np.random.default_rng(0)
    part = HashedTablePart([0, 1], [50, 30], [50, 30], 8,
                           optimizer=optimizer, weighted=weighted)
    return part, part.init(rng)


def test_weighted_pooling_fixed_is_identity_and_untouched():
    part_w, st_w = _weighted_part("fixed")
    part_p, st_p = _weighted_part("")
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 30, (16, 2)))
    raw_w, aux = part_w.gather(st_w, ids)
    raw_p, _ = part_p.gather(st_p, ids)
    np.testing.assert_allclose(np.asarray(raw_w), np.asarray(raw_p))
    g = jnp.ones_like(raw_w)
    st_w2, _ = part_w.apply_grads(st_w, ids, g, aux, 0.1)
    st_p2, _ = part_p.apply_grads(st_p, ids, g, aux, 0.1)
    np.testing.assert_allclose(np.asarray(st_w2["w"]), 1.0)  # never trained
    np.testing.assert_allclose(np.asarray(st_w2["table"]),
                               np.asarray(st_p2["table"]), rtol=1e-6)


def test_weighted_pooling_learned_matches_autodiff():
    part, st = _weighted_part("learned")
    ids = jnp.asarray([[3, 7], [3, 2]])  # includes a duplicate row (3)
    raw, aux = part.gather(st, ids)

    def loss_fn(table, w):
        st2 = {**st, "table": table, "w": w}
        r, _ = part.gather(st2, ids)
        return jnp.sum(r * r)

    gt, gw = jax.grad(loss_fn, argnums=(0, 1))(st["table"], st["w"])
    st2, _ = part.apply_grads(st, ids, 2 * raw, aux, 0.5)
    np.testing.assert_allclose(np.asarray(st2["table"]),
                               np.asarray(st["table"] - 0.5 * gt),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(st2["w"]),
                               np.asarray(st["w"] - 0.5 * gw),
                               rtol=1e-5, atol=1e-7)


def test_weighted_pooling_end_to_end():
    state, m, p = _one_step(_cfg(weighted_pooling="learned"))
    w = np.asarray(state.embed["part0"]["w"])
    assert not np.allclose(w[:100], 1.0)  # weights actually moved


# --- QR operations ---------------------------------------------------------

@pytest.mark.parametrize("op", ["add", "mult", "concat"])
def test_qr_ops_match_autodiff(op):
    rng = np.random.default_rng(0)
    part = QRPart([0], [1000], 16, 8, operation=op)
    st = part.init(rng)
    ids = jnp.asarray([[5], [21], [5], [999]])
    raw, aux = part.gather(st, ids)
    assert raw.shape == (4, 1, 8)

    def loss_fn(q, r):
        r2, _ = part.gather({"q": q, "r": r}, ids)
        return jnp.sum(r2 * r2)

    gq, gr = jax.grad(loss_fn, argnums=(0, 1))(st["q"], st["r"])
    st2, _ = part.apply_grads(st, ids, 2 * raw, aux, 0.25)
    np.testing.assert_allclose(np.asarray(st2["q"]),
                               np.asarray(st["q"] - 0.25 * gq),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(st2["r"]),
                               np.asarray(st["r"] - 0.25 * gr),
                               rtol=1e-5, atol=1e-7)


def test_qr_concat_end_to_end():
    state, m, p = _one_step(_cfg(
        compress_method="qr", compress_rate=0.05, qr_operation="concat",
        synthetic_vocab=5000))
    assert np.isfinite(float(m["loss"]))


# --- synthetic distributions & trace model ---------------------------------

def test_dist_generators_shapes_and_ranges():
    for dist in ("uniform", "gaussian"):
        a = make_synthetic_arrays(rows=256, fields=3, vocab=50, dense=2,
                                  seed=0, dist=dist)
        assert a.sparse.shape == (256, 3)
        assert a.sparse.min() >= 0 and a.sparse.max() < 50


def test_trace_profile_stack_distances():
    # trace: a b a c c b -> sds: 0 0 2(b since last a) 0 1(repeat) 3
    lines, list_sd, cumm_sd = trace_profile(np.array([1, 2, 1, 3, 3, 2]))
    np.testing.assert_array_equal(lines, [1, 2, 3])
    # distances present: 0 (x3), 1, 2, 3
    np.testing.assert_array_equal(list_sd, [0, 1, 2, 3])
    np.testing.assert_allclose(cumm_sd, np.cumsum([3, 1, 1, 1]) / 6)


def test_trace_generate_preserves_locality():
    """A highly-local trace must synthesize to a highly-local stream, an
    unclustered one to an unclustered stream (the property the reference's
    LRU generator exists to reproduce)."""
    rng = np.random.default_rng(0)
    n, vocab = 4000, 200

    def mean_reuse(ids):
        last, gaps = {}, []
        for t, x in enumerate(ids):
            if x in last:
                gaps.append(t - last[x])
            last[x] = t
        return np.mean(gaps)

    def frac_immediate(ids):
        return np.mean(ids[1:] == ids[:-1])

    # local: 3/4 of accesses are immediate repeats
    local = np.repeat(rng.integers(0, vocab, n // 4), 4)
    uniform = rng.integers(0, vocab, n)
    out_local = make_trace_ids(rng, n, vocab, local)
    out_unif = make_trace_ids(rng, n, vocab, uniform)
    assert mean_reuse(out_local) < mean_reuse(out_unif) / 1.5
    # the repeat-heavy reuse profile survives synthesis
    assert frac_immediate(out_local) > 0.5
    assert frac_immediate(out_unif) < 0.1


def test_trace_dataset_end_to_end():
    state, m, p = _one_step(_cfg(synthetic_dist="trace",
                                 synthetic_rows=2048))
    assert np.isfinite(float(m["loss"]))


def test_shifted_stream_changes_hot_set():
    """shift_at re-draws the Zipf rank->id mapping mid-stream: the two
    halves' top ids must be (almost) disjoint, while an unshifted stream's
    halves share their hot set."""
    a = make_synthetic_arrays(rows=20000, fields=1, vocab=5000, dense=0,
                              zipf=1.3, seed=3, shift_at=0.5)

    def top_ids(ids, k=20):
        v, c = np.unique(ids, return_counts=True)
        return set(v[np.argsort(-c)[:k]].tolist())

    h1 = top_ids(a.sparse[:10000, 0])
    h2 = top_ids(a.sparse[10000:, 0])
    assert len(h1 & h2) <= 2
    b = make_synthetic_arrays(rows=20000, fields=1, vocab=5000, dense=0,
                              zipf=1.3, seed=3)
    h1 = top_ids(b.sparse[:10000, 0])
    h2 = top_ids(b.sparse[10000:, 0])
    assert len(h1 & h2) >= 15


def test_graphrec_driver_helpers(tmp_path):
    import main_graphrec as mg
    p = tmp_path / "train.txt"
    p.write_text("0 3 5 7\n1 2\n3 9\n")
    user_items, n_items = mg.load_gowalla_txt(str(p))
    assert n_items == 10
    assert len(user_items) == 4            # user 2 has no line -> empty
    np.testing.assert_array_equal(user_items[0], [3, 5, 7])
    assert user_items[2].size == 0
    train, test, ni = mg.make_synthetic_interactions(
        n_users=40, n_items=80, seed=0)
    assert len(train) == len(test) == 40
    assert all(len(t) >= 1 for t in train)


def test_vocab_spread_varies_fields_and_mde_assigns_dims():
    a = make_synthetic_arrays(rows=2000, fields=5, vocab=10000, dense=0,
                              seed=0, vocab_spread=0.01)
    counts = np.asarray(a.counts)
    assert counts[0] == 10000 and counts[-1] == 100
    assert (np.diff(counts) < 0).all()          # strictly decreasing
    for f in range(5):                          # ids stay in range
        assert a.sparse[:, f].max() < counts[f]
    # with spread, md_solver assigns DIFFERENT dims per field
    from cafe_tpu.embeddings import sizing
    dims = sizing.mde_dims(counts.tolist(), 0.05, 16, False)
    assert len(set(int(d) for d in dims)) > 1
    # labels still learnable shape
    assert a.label.shape == (2000,)


def test_process_interactions_by_time_split(tmp_path):
    """CSV -> gowalla train/test with per-user leave-last-out by time
    (the reference's process_nowplaying_rs + split-by-time role)."""
    from cafe_tpu.tools.process_interactions import process
    p = tmp_path / "ev.csv"
    p.write_text(
        "user_id,item_id,created_at\n"
        "alice,x,2020-01-03\n"     # latest -> test
        "alice,y,2020-01-01\n"
        "alice,z,2020-01-02\n"
        "bob,z,2020-01-01\n"       # single-item user stays in train
        "alice,y,2020-01-04\n")    # dup: first occurrence kept
    out = tmp_path / "o"
    stats = process(str(p), str(out), "user_id", "item_id", "created_at")
    assert stats == {"users": 2, "items": 3, "train_interactions": 3,
                     "test_interactions": 1}
    train = (out / "train.txt").read_text().splitlines()
    test = (out / "test.txt").read_text().splitlines()
    # alice=0: time order y(1) z(2) x(3); x held out; ids x=0 y=1 z=2
    assert train[0] == "0 1 2" and test[0] == "0 0"
    assert train[1] == "1 2" and test[1] == "1"
