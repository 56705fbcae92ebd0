"""Two-level ("dcn", "ici") mesh: equivalence + hierarchical exchange.

The 8 virtual CPU devices arrange as a 2x4 grid (2 "hosts" x 4 "chips");
the explicit exchange combines/dedups over the inner axis before anything
crosses the outer axis (SURVEY.md §2.6 "DCN only crossing"). Flat-tuple
collectives over ("dcn","ici") are semantically the 8-device flat
exchange, so every method's numbers must match the single-device step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cafe_tpu.config import Config
from cafe_tpu.data import batch_iterator
from cafe_tpu.parallel import make_mesh, shard_train_step
from cafe_tpu.train.loop import build_all, get_dataset


def _cfg(method="cafe", vocab=30000, **kw):
    base = dict(dataset="synthetic", embedding_dim=16,
                compress_method=method, compress_rate=0.05,
                cafe_sketch_threshold=5.0, learning_rate=0.1,
                synthetic_rows=16384, synthetic_fields=4,
                synthetic_vocab=vocab, synthetic_dense=13,
                mini_batch_size=128, shard_embeddings=True, mesh_inner=4)
    base.update(kw)
    return Config(**base)


def _build_2level(cfg, train):
    mesh = make_mesh(8, inner=4)
    assert tuple(mesh.axis_names) == ("dcn", "ici")
    assert mesh.devices.shape == (2, 4)
    model, embed, state, step, ev = build_all(cfg, train, mesh=mesh)
    sharded, st = shard_train_step(step, mesh, state,
                                   shard_embeddings=True)
    return embed, sharded, st, ev, mesh


@pytest.mark.parametrize("method,cr", [
    ("cafe", 0.05), ("hash", 0.2), (None, 1.0),
])
def test_two_level_matches_single_device(method, cr):
    cfg = _cfg(method=method, compress_rate=cr)
    train = get_dataset(cfg, "train")
    model, embed1, s1, step1, _ = build_all(cfg, train)
    embed2, sharded, s2, _, _ = _build_2level(cfg, train)
    assert any(p.mesh is not None for p in embed2.parts)
    for dense, sparse, label, valid in list(
            batch_iterator(train, 128, drop_last=True))[:5]:
        args = (jnp.asarray(dense), jnp.asarray(sparse),
                jnp.asarray(label), jnp.asarray(valid))
        s1, m1 = step1(s1, *args)
        s2, m2 = sharded(s2, *args)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=3e-4)
    t1 = np.asarray(s1.embed["part0"]["table"])
    t2 = np.asarray(jax.device_get(s2.embed["part0"]["table"]))
    if method == "cafe":
        # shard-local sketch: routing differs by design; tables stay
        # finite and the hash region matches where no promotion touched
        assert np.isfinite(t2).all()
    else:
        np.testing.assert_allclose(t1, t2, atol=3e-5)


def test_two_level_hierarchical_compact_matches():
    """Hash + unique_frac on the 2x4 mesh: the hierarchical exchange
    (ici-combine -> compact -> dcn) reproduces the single-device step."""
    cfg = _cfg(method="hash", compress_rate=0.2, shard_unique_frac=0.5)
    train = get_dataset(cfg, "train")
    model, embed1, s1, step1, _ = build_all(cfg, train)
    embed2, sharded, s2, _, _ = _build_2level(cfg, train)
    assert any(p.unique_frac > 0 for p in embed2.parts)
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


def test_two_level_outer_traffic_leq_inner():
    """HLO byte audit by axis: with the hierarchical exchange, the bytes
    crossing the outer (dcn) axis must not exceed the bytes moving on
    the inner (ici) axis — the whole point of combining within a host
    before crossing DCN."""
    from cafe_tpu.tools.hlo_traffic import classify_axis, collective_stats
    cfg = _cfg(method="hash", compress_rate=0.2, shard_unique_frac=0.25,
               mini_batch_size=512, vocab=2 ** 20)
    train = get_dataset(cfg, "train")
    embed, sharded, st, _, mesh = _build_2level(cfg, train)
    dense, sparse, label, valid = next(iter(
        batch_iterator(train, 512, drop_last=True)))
    args = (st, jnp.asarray(dense), jnp.asarray(sparse),
            jnp.asarray(label), jnp.asarray(valid))
    txt = sharded.lower(*args).compile().as_text()
    stats = collective_stats(txt)
    assert stats
    by_axis = {"ici": 0, "dcn": 0, "global": 0, "unknown": 0}
    dcn_ops = []
    for c in stats:
        ax = classify_axis(c.line, 4)
        by_axis[ax] += c.result_bytes
        if ax == "dcn":
            dcn_ops.append(c)
    # the exchange must produce BOTH pure-ici and pure-dcn legs
    assert by_axis["ici"] > 0, f"no inner-axis collectives: {by_axis}"
    assert by_axis["dcn"] > 0, f"no outer-axis collectives: {by_axis}"
    # the HLO holds BOTH cond branches; the fallback (overflow) branch's
    # dcn ops are m_host-sized and only execute when the per-host unique
    # count exceeds C. The branch a skewed stream executes is the
    # compact one — its dcn ops are bounded by n_h*C*(D+1)*4 bytes.
    C = 256                        # unique_cap(m_host=1024, 0.25)
    # largest compact-branch dcn op: the apply's grad AG [n_h*C, D] f32
    compact_bound = 2 * C * 16 * 4
    dcn_exec = sum(c.result_bytes for c in dcn_ops
                   if c.result_bytes <= compact_bound)
    assert dcn_exec > 0, f"no compact-branch dcn collectives: {dcn_ops}"
    assert dcn_exec <= by_axis["ici"], (
        f"compact-branch outer traffic exceeds inner: "
        f"{dcn_exec} vs {by_axis}")
    # and the compact branch must be a real reduction vs the static
    # total (which includes the m_host-sized fallback branch)
    assert dcn_exec * 2 <= by_axis["dcn"], (
        f"compact branch not smaller than fallback: {dcn_exec} of "
        f"{by_axis['dcn']}")


def test_two_level_equals_flat_mesh_bitwise():
    """The 2x4 ('dcn','ici') mesh with tuple-axis collectives IS the
    flat 8-device exchange in a different coordinate system: device
    order, shard ownership, and collective tiling all coincide, so CAFE
    (shard-local sketch and all) must produce the SAME numbers as the
    flat mesh — promotion-for-promotion."""
    cfg = _cfg(method="cafe", compress_rate=0.05)
    train = get_dataset(cfg, "train")
    from cafe_tpu.train.loop import build_all as _build
    mesh_flat = make_mesh(8)
    m1, e1, s1_0, st1, _ = _build(cfg, train, mesh=mesh_flat)
    f1, s1 = shard_train_step(st1, mesh_flat, s1_0,
                              shard_embeddings=True)
    e2, f2, s2, _, _ = _build_2level(cfg, train)
    for dense, sparse, label, valid in list(
            batch_iterator(train, 128, drop_last=True))[:6]:
        args = (jnp.asarray(dense), jnp.asarray(sparse),
                jnp.asarray(label), jnp.asarray(valid))
        s1, m1_ = f1(s1, *args)
        s2, m2_ = f2(s2, *args)
        assert float(m1_["loss"]) == pytest.approx(float(m2_["loss"]),
                                                   rel=1e-6)
        assert int(m1_["cafe_promotions"]) == int(m2_["cafe_promotions"])
    t1 = np.asarray(jax.device_get(s1.embed["part0"]["table"]))
    t2 = np.asarray(jax.device_get(s2.embed["part0"]["table"]))
    np.testing.assert_allclose(t1, t2, atol=1e-6)
    sk1 = jax.device_get(s1.embed["part0"]["sketch"])
    sk2 = jax.device_get(s2.embed["part0"]["sketch"])
    np.testing.assert_array_equal(np.asarray(sk1.dic),
                                  np.asarray(sk2.dic))


def test_two_level_cafe_hierarchical_compact_runs():
    """CAFE on the 2x4 mesh with the unique-compact exchange: the row
    fetch/update legs ride the hierarchical compacting exchange while
    sketch routing/migration stay in their own bounded shard_map; loss
    finite, promotions happen, hot routing sane."""
    cfg = _cfg(method="cafe", compress_rate=0.05, shard_unique_frac=0.5,
               mini_batch_size=512)
    train = get_dataset(cfg, "train")
    embed, sharded, st, _, _ = _build_2level(cfg, train)
    assert any(p.unique_frac > 0 for p in embed.parts)
    saw_promo = 0
    for dense, sparse, label, valid in list(
            batch_iterator(train, 512, drop_last=True))[:10]:
        st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                        jnp.asarray(label), jnp.asarray(valid))
        saw_promo += int(m["cafe_promotions"])
    assert np.isfinite(float(m["loss"]))
    assert saw_promo > 0
    assert 0.0 <= float(m["cafe_hot_frac"]) <= 1.0


def test_two_level_qr_off_ada_run():
    """The remaining explicit-exchange methods execute on the 2-level
    mesh (flat tuple-axis semantics) with finite losses."""
    for method, extra in (("qr", {}), ("off", {}),
                          ("ada", dict(embedding_dim=64, vocab=80000))):
        cfg = _cfg(method=method, **extra)
        train = get_dataset(cfg, "train")
        embed, sharded, st, _, _ = _build_2level(cfg, train)
        assert any(p.mesh is not None for p in embed.parts), method
        for dense, sparse, label, valid in list(
                batch_iterator(train, 128, drop_last=True))[:3]:
            st, m = sharded(st, jnp.asarray(dense), jnp.asarray(sparse),
                            jnp.asarray(label), jnp.asarray(valid))
        assert np.isfinite(float(m["loss"])), method


def test_subset_mesh_guard_rejects_partial_process_coverage(monkeypatch):
    """Under multi-process execution a device-subset mesh must be rejected
    whenever ANY process's local devices are only partially included —
    partial coverage breaks make_array_from_process_local_data just as
    opaquely as full exclusion (regression: the guard only caught the
    fully-excluded case)."""
    import jax
    import pytest
    from cafe_tpu.parallel import mesh as mesh_mod

    real_devices = jax.devices()
    assert len(real_devices) >= 8

    class FakeDev:
        def __init__(self, d, pidx):
            self._d = d
            self.process_index = pidx

        def __getattr__(self, name):
            return getattr(self._d, name)

    # simulate 2 processes x 4 local devices
    fake = [FakeDev(d, i // 4) for i, d in enumerate(real_devices[:8])]
    monkeypatch.setattr(mesh_mod.jax, "devices", lambda: fake)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)

    # 6 devices: process 1 covered only partially (devices 4,5 of 4..7)
    with pytest.raises(ValueError, match="omits local devices"):
        mesh_mod.make_mesh(6)
    # 4 devices: process 1 fully excluded — still rejected
    with pytest.raises(ValueError, match="omits local devices"):
        mesh_mod.make_mesh(4)
