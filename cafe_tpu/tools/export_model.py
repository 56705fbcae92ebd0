"""Serving export: serialize the jitted eval step with jax.export.

The reference exports ONNX for serving (dlrm_s_pytorch.py:1797-1875); the
TPU-native equivalent is a serialized StableHLO artifact of the eval step
(weights embedded as constants), loadable by any jax.export-compatible
runtime without the Python model code.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def export_eval_step(model, embed_layer, state, batch_size: int,
                     num_dense: int, num_sparse: int, out_path: str) -> int:
    """Serialize eval(dense, ids) -> prob with the trained state baked in.
    Returns the serialized size in bytes."""
    from jax import export as jexport

    ids_spec = jax.ShapeDtypeStruct((batch_size, num_sparse), jnp.int32)
    if num_dense > 0:
        def serve(dense_x, ids):
            raws, _ = embed_layer.gather(state.embed, ids)
            feats = embed_layer.transform(state.embed_dense, raws)
            return model.apply(state.params, dense_x, feats)

        dense_spec = jax.ShapeDtypeStruct((batch_size, num_dense),
                                          jnp.float32)
        exported = jexport.export(jax.jit(serve))(dense_spec, ids_spec)
    else:
        # zero-dense datasets (avazu/kdd12): the models take dense=None,
        # and their params have no bottom tower to index
        def serve_sparse(ids):
            raws, _ = embed_layer.gather(state.embed, ids)
            feats = embed_layer.transform(state.embed_dense, raws)
            return model.apply(state.params, None, feats)

        exported = jexport.export(jax.jit(serve_sparse))(ids_spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_and_run(path: str, *args):
    """Deserialize and invoke; pass (dense, ids) for dense models, (ids,)
    for zero-dense ones — matching what export_eval_step serialized."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call(*args)


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a trained model.")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--config_json", required=True,
                   help="config.json written next to the run")
    args = p.parse_args(argv)
    from ..config import from_json
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import build_all, get_dataset
    cfg = from_json(args.config_json)
    if cfg.force_platform:
        # same knob as main.py: the JAX_PLATFORMS env var is silently
        # ignored by the TPU tunnel plugin
        import jax
        jax.config.update("jax_platforms", cfg.force_platform)
    train_data = get_dataset(cfg, "train")
    model, embed, state, _, _ = build_all(cfg, train_data)
    state, _ = load_checkpoint(args.checkpoint, state)
    n = export_eval_step(model, embed, state, args.batch_size,
                         train_data.num_dense, train_data.num_sparse,
                         args.out)
    print(f"exported {n} bytes to {args.out}")


if __name__ == "__main__":
    main()
