"""Checkpoint / resume via orbax.

The reference checkpoints model+optimizer state on new best accuracy
(main.py:449-462) and loses sketch counters on restore (SIGMOD version;
fixed only in CAFE+'s binary save_state). Here the sketch lives inside the
state pytree, so checkpoints are always complete: tables, optimizer slots,
sketch buckets, free list, decay totals — one atomic save.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState


def save_checkpoint(path: str, state: TrainState, extra: Dict) -> None:
    path = osp.abspath(path)
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_pytree(state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(extra, f)


def load_checkpoint(path: str, state: TrainState
                    ) -> Tuple[TrainState, Dict]:
    """Restore into the structure of `state` (shapes must match)."""
    path = osp.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        st = ckptr.restore(path, _to_pytree(state))
    extra: Dict = {}
    if osp.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return TrainState(st["params"], st["embed"], st["embed_dense"],
                      st["opt"], st["step"]), extra


def _to_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "params": state.params,
        "embed": state.embed,
        "embed_dense": state.embed_dense,
        "opt": state.opt,
        "step": state.step,
    }
