"""LR policy: linear warmup + quadratic decay + freeze.

Reference: LRPolicyScheduler (dlrm_s_pytorch.py:171-208) — scale ramps
linearly over num_warmup_steps, holds at base, decays as
((remaining)/num_decay_steps)^2 down to 1e-7 between decay_start and
decay_start+num_decay_steps, then freezes at the last value. Implemented as
a pure function of the step counter so it traces into the jitted train
step (no host-side scheduler object)."""

from __future__ import annotations

import jax.numpy as jnp

MIN_LR = 1e-7


def lr_policy(base_lr: float, step: jnp.ndarray, num_warmup_steps: int,
              decay_start_step: int, num_decay_steps: int) -> jnp.ndarray:
    step = step.astype(jnp.float32)
    if num_warmup_steps > 0 and decay_start_step < num_warmup_steps:
        raise ValueError(
            "Learning rate warmup must finish before the decay starts")
    lr = jnp.asarray(base_lr, jnp.float32)
    if num_warmup_steps > 0:
        warm = base_lr * (1.0 - (num_warmup_steps - step)
                          / num_warmup_steps)
        lr = jnp.where(step < num_warmup_steps, warm, lr)
    if num_decay_steps > 0:
        decayed = step - decay_start_step
        scale = ((num_decay_steps - decayed) / num_decay_steps) ** 2
        dec = jnp.maximum(MIN_LR, base_lr * scale)
        end = decay_start_step + num_decay_steps
        lr = jnp.where(step >= decay_start_step,
                       jnp.where(step < end, dec,
                                 jnp.maximum(MIN_LR, base_lr *
                                             (1.0 / num_decay_steps) ** 2)),
                       lr)
    return lr
