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


def _atomic_json(path: str, data: Dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def save_checkpoint(path: str, state: TrainState, extra: Dict) -> None:
    path = osp.abspath(path)
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        # collective across processes: every process must participate
        ckptr.save(path, _to_pytree(state), force=True)
    # host-side sidecar/symlink writes are NOT collective — under
    # multi-host on shared storage they would race; process 0 only
    if jax.process_index() == 0:
        _atomic_json(path + ".meta.json", extra)


def save_rolling(path: str, state: TrainState, extra: Dict) -> None:
    """Crash-safe rolling save for preemption recovery: writes alternate
    slots <path>.ra / <path>.rb and atomically flips the <path>.latest
    symlink only AFTER the slot (checkpoint + meta) is fully on disk —
    the previous slot stays valid through the entire save, so a kill at
    any instant leaves a loadable `.latest`."""
    path = osp.abspath(path)
    latest = path + ".latest"
    cur = os.path.realpath(latest) if osp.islink(latest) else ""
    slot = path + (".rb" if cur.endswith(".ra") else ".ra")
    save_checkpoint(slot, state, extra)       # collective
    if jax.process_index() != 0:
        return  # the symlink flip is a single-writer host-side op
    tmp_link = latest + ".lnk"
    if osp.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(osp.basename(slot), tmp_link)
    os.replace(tmp_link, latest)


def load_checkpoint(path: str, state: TrainState
                    ) -> Tuple[TrainState, Dict]:
    """Restore into the structure of `state` (shapes must match).
    Symlinks (e.g. a rolling `.latest`) are resolved first so the meta
    sidecar is found next to the real slot."""
    path = os.path.realpath(osp.abspath(path))
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
