"""The fused train/eval step.

One jitted function covers what the reference spreads across five host-side
phases (main.py:360-377: forward / loss / backward / insert_grad /
optimizer.step): embedding gather -> dense towers -> BCE -> backward ->
sketch update + migration -> sparse + dense optimizer applies. Embedding
tables never appear in the autodiff param tree — gradients are taken with
respect to the *gathered rows*, and each embedding part converts row grads
into scatter updates (see embeddings/base.py). This keeps every update
O(batch) instead of O(vocab).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


class TrainState(NamedTuple):
    params: Any        # dense tower params
    embed: Any         # embedding tables / sketch / optimizer slots
    embed_dense: Any   # differentiable embedding params (MDE projections)
    opt: Any           # dense-optimizer slots (adagrad accumulators) or None
    step: jnp.ndarray  # int32 global step


def init_state(model, embed_layer, seed: int, optimizer: str) -> TrainState:
    key = jax.random.PRNGKey(seed)
    params = model.init(key)
    embed_state, embed_dense = embed_layer.init(seed)
    opt = init_dense_opt((params, embed_dense), optimizer)
    return TrainState(params, embed_state, embed_dense, opt,
                      jnp.zeros((), jnp.int32))


def init_dense_opt(params, optimizer: str):
    """Dense-optimizer slots for a param tree: None (sgd), grad² accumulator
    tree (adagrad), or (m, v, t) (adam — the reference graphrec's optimizer,
    PinSAGE/model.py:133, LightGCN/code/utils.py:39)."""
    if optimizer == "adagrad":
        return jax.tree.map(jnp.zeros_like, params)
    if optimizer == "adam":
        return (jax.tree.map(jnp.zeros_like, params),
                jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((), jnp.int32))
    return None


def _dense_update(params, grads, acc, lr, kind):
    if kind == "sgd":
        return jax.tree.map(lambda p, g: p - lr * g, params, grads), acc
    if kind == "adam":
        b1, b2, eps = 0.9, 0.999, 1e-8
        m, v, t = acc
        t = t + 1
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v, grads)
        tf = t.astype(jnp.float32)
        bc1, bc2 = 1.0 - b1 ** tf, 1.0 - b2 ** tf
        new_params = jax.tree.map(
            lambda p, mm, vv: p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2)
                                                     + eps),
            params, m, v)
        return new_params, (m, v, t)
    # adagrad (torch semantics, eps 1e-10)
    new_acc = jax.tree.map(lambda a, g: a + g * g, acc, grads)
    new_params = jax.tree.map(
        lambda p, g, a: p - lr * g / (jnp.sqrt(a) + 1e-10),
        params, grads, new_acc)
    return new_params, new_acc


def _bce(p, y, w):
    p = jnp.clip(p, EPS, 1.0 - EPS)
    losses = -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))
    # an all-padding (sub-)batch has zero weight; return 0, not 0/0
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def build_train_step(model, embed_layer, cfg):
    base_lr = cfg.learning_rate
    opt_kind = cfg.optimizer
    use_sched = (getattr(cfg, "lr_num_warmup_steps", 0) > 0
                 or getattr(cfg, "lr_num_decay_steps", 0) > 0)
    # donating the state lets XLA update tables in place instead of
    # allocating fresh output buffers; callers must not reuse the old
    # TrainState after the call (the driver loop never does)
    donate = (0,) if getattr(cfg, "donate_state", False) else ()

    @functools.partial(jax.jit, donate_argnums=donate)
    def train_step(state: TrainState, dense_x, ids, labels, valid
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        b = ids.shape[0]
        if use_sched:
            from .lr_schedule import lr_policy
            lr = lr_policy(base_lr, state.step, cfg.lr_num_warmup_steps,
                           cfg.lr_decay_start_step, cfg.lr_num_decay_steps)
        else:
            lr = base_lr
        w = (jnp.arange(b) < valid).astype(jnp.float32)
        raws, auxs = embed_layer.gather(state.embed, ids)

        def loss_fn(params, embed_dense, raws):
            feats = embed_layer.transform(embed_dense, raws)
            p = model.apply(params, dense_x, feats)
            return _bce(p, labels, w), p

        (loss, p), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, state.embed_dense, raws)
        g_params, g_embed_dense, g_raws = grads

        (params, embed_dense), opt = _dense_update(
            (state.params, state.embed_dense), (g_params, g_embed_dense),
            state.opt, lr, opt_kind)
        embed, stats = embed_layer.apply_grads(state.embed, ids, g_raws,
                                               auxs, lr)
        acc = jnp.sum((jnp.round(p) == labels) * w)
        metrics = {"loss": loss, "correct": acc, "weight": jnp.sum(w),
                   **stats}
        return TrainState(params, embed, embed_dense, opt,
                          state.step + 1), metrics

    return train_step


def build_multi_step(train_step, k: int, donate: bool = False):
    """Fuse k sequential train steps into ONE jitted dispatch.

    Takes flat [k*B] batches and reshapes on device; the inner step is
    unrolled (not lax.scan — the single-chip runtime executes scan bodies
    with large per-iteration overhead), so one host RPC drives k steps.
    Metrics come back summed (loss is weight-summed; divide by weight).
    `donate` re-applies state donation (lost when re-jitting the
    unwrapped inner step)."""
    inner = train_step.__wrapped__ if hasattr(train_step, "__wrapped__") \
        else train_step

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state: TrainState, dense_x, ids, labels, valid):
        kb = ids.shape[0]
        b = kb // k
        agg = None
        for i in range(k):
            sl = slice(i * b, (i + 1) * b)
            v_i = jnp.clip(valid - i * b, 0, b)
            dx = None if dense_x is None else dense_x[sl]
            state, m = inner(state, dx, ids[sl], labels[sl], v_i)
            # weight both the loss AND fraction-style diagnostics by the
            # sub-batch's valid count so fully padded tail sub-batches
            # don't bias them toward zero
            m = {name: (v * m["weight"]
                        if name == "loss" or name.endswith("_frac") else v)
                 for name, v in m.items()}
            agg = m if agg is None else jax.tree.map(jnp.add, agg, m)
        # hand back the same shape of metrics a single step produces:
        # weighted means for loss and *_frac, sums for counters
        denom = jnp.maximum(agg["weight"], 1.0)
        agg = {name: (v / denom
                      if name == "loss" or name.endswith("_frac") else v)
               for name, v in agg.items()}
        return state, agg

    return multi_step


def build_eval_step(model, embed_layer):
    @jax.jit
    def eval_step(state: TrainState, dense_x, ids):
        raws, _ = embed_layer.gather(state.embed, ids)
        feats = embed_layer.transform(state.embed_dense, raws)
        return model.apply(state.params, dense_x, feats)

    return eval_step


def build_quantized_eval_step(model, embed_layer, state: TrainState,
                              bits: int):
    """Row-wise int4/int8 embedding serving (legacy capability,
    dlrm_s_pytorch.py:628-659, table-type-agnostic like the reference's
    :759-777). Each part quantizes its float row tables once; lookups
    gather codes + (scale, zero) and dequantize on-chip. Routing state
    (sketches, hot dicts, Ada's dic) stays full precision; MDE/AE
    projections apply in f32 via the part's transform."""
    import numpy as np

    qtables = {f"part{i}": p.quantize_for_serving(
        state.embed[f"part{i}"], bits)
        for i, p in enumerate(embed_layer.parts)}

    # the quantized tables ride as ARGUMENTS, not closure constants: a
    # closed-over device array is baked into the compiled program —
    # hundreds of MB of HLO constants at CriteoTB shapes (the tunnel's
    # remote-compile rejects the program outright with HTTP 413) and
    # this runtime executes constant-embedding programs up to ~50x
    # slower (docs/PERF.md). `bits` is STATIC metadata (branches on it
    # in ops/quantized.dequantize_rows) — strip it from the traced
    # pytree and reattach the closed-over int inside the trace.
    from ..ops.quantized import QuantizedTable

    def _map_qt(fn, tree):
        return jax.tree.map(
            lambda t: fn(t) if isinstance(t, QuantizedTable) else t,
            tree, is_leaf=lambda x: isinstance(x, QuantizedTable))

    qtables_stripped = _map_qt(lambda t: t._replace(bits=None), qtables)

    @jax.jit
    def _eval_step(st: TrainState, qt, dense_x, ids):
        qt = _map_qt(lambda t: t._replace(bits=bits), qt)
        feats = []
        for i, p in enumerate(embed_layer.parts):
            cols = ids[:, np.asarray(p.field_idx)]
            raw = p.gather_quantized(st.embed[f"part{i}"],
                                     qt[f"part{i}"], cols)
            feats.append(p.transform(st.embed_dense[f"part{i}"], raw))
        feats = jnp.concatenate(feats, axis=1)[:, embed_layer._perm]
        return model.apply(st.params, dense_x, feats)

    def eval_step(st: TrainState, dense_x, ids):
        return _eval_step(st, qtables_stripped, dense_x, ids)

    # keep the jitted surface (the HLO audits .lower() the serving step)
    eval_step.lower = lambda st, dense_x, ids: _eval_step.lower(
        st, qtables_stripped, dense_x, ids)
    return eval_step
