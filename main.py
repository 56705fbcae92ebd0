#!/usr/bin/env python
"""CLI driver — flag-compatible with ArtifactEvaluation/main.py.

Examples:
  python main.py --dataset synthetic --embedding_dim 16 \
      --compress_method cafe --compress_rate 0.01 --nepochs 1
  python main.py --dataset criteo --data_path /data/criteo \
      --embedding_dim 16 --compress_method cafe --compress_rate 0.001 \
      --cafe_sketch_threshold 500 --cafe_hash_rate 0.5 --learning_rate 0.1 \
      --mini_batch_size 128 --test_freq 30000
"""

import os


def _honor_platform_env():
    """Some TPU plugins register themselves regardless of JAX_PLATFORMS;
    force the requested backend through the config before backend init so
    `JAX_PLATFORMS=cpu python main.py ...` (e.g. virtual multi-device CPU
    meshes via --xla_force_host_platform_device_count) works."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_platform_env()

from cafe_tpu.config import parse_args       # noqa: E402
from cafe_tpu.train.loop import run          # noqa: E402


def main():
    cfg = parse_args()
    run(cfg)


if __name__ == "__main__":
    main()
