"""Per-source-line device-time profile of the FULL fused train step.

Chains REPS train steps (bench.py protocol: dlrm+cafe, batch 2048,
dim 16, cr 1e-3) through optimization_barriers inside ONE jitted program
and aggregates XLA-fusion device time by source line — the op-level view
behind tools/step_breakdown.py's stage totals.

    python tools/profile_train.py [--reps 8] [--method cafe|hash|full]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from profile_lines import run_and_report  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--method", default="cafe",
                    choices=["cafe", "hash", "full"])
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--dataset", default="criteo")
    ap.add_argument("--cr", type=float, default=0.001)
    args = ap.parse_args()

    import jax

    from bench import BATCH, make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all

    cfg = Config(
        dataset=args.dataset, model="dlrm", embedding_dim=args.dim,
        compress_method=None if args.method == "full" else args.method,
        compress_rate=1.0 if args.method == "full" else args.cr,
        cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
        mini_batch_size=BATCH, learning_rate=0.1, optimizer="sgd",
        bf16=True)
    train_data, batches = make_criteo_batches()
    model, embed, state, train_step, _ = build_all(cfg, train_data)
    inner = train_step.__wrapped__ if hasattr(train_step, "__wrapped__") \
        else train_step
    d, s, l, v = batches[0]
    R = args.reps

    def chained(state, d, s, l, v):
        for _ in range(R):
            (state, d, s, l, v) = jax.lax.optimization_barrier(
                (state, d, s, l, v))
            state, _ = inner(state, d, s, l, v)
        return state

    run_and_report(jax.jit(chained), (state, d, s, l, v), R, top=50)


if __name__ == "__main__":
    main()
