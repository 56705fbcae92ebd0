"""Interleaved A/B of dot-interaction formulations at bench shapes.

The round-4 step profile attributes ~180-240 us/step to the DLRM dot
interaction (models/dlrm.py:70's einsum + its backward) — 6x the
matmul-floor estimate: the [2048, 27, 16] batched self-matmul maps
poorly onto the 128x128 MXU (27x27x16 per batch element). Candidate
formulations, each timed fwd+bwd (sum-of-output loss) interleaved:

  A  einsum bfd,bgd->bfg, bf16 inputs (current code)
  B  broadcast-multiply + reduce over d (VPU path, fusion-dependent)
  C  einsum with f32 inputs (is bf16 even helping here?)
  D  one [B*F, D] x [D, F*B] ... not expressible without cross-batch
     terms; instead: dot_general with batch dims moved minor — bfd,bgd
     with B as the MINOR axis (df b x dg b) so the MXU tiles over batch

    python tools/ab_interact.py [--windows 5] [--reps 40]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

B, F, D = 2048, 27, 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.utils.timing import fence

    rng = np.random.default_rng(0)
    t0_arr = jnp.asarray(rng.standard_normal((B, F, D)).astype(np.float32))

    def arm(interact):
        def loss(t):
            return jnp.sum(interact(t))

        g = jax.grad(loss)

        def one(t):
            # fwd+bwd, chained through the carry so reps serialize
            return t + 1e-6 * g(t)
        return one

    def a_bf16(t):
        tb = t.astype(jnp.bfloat16)
        return jnp.einsum("bfd,bgd->bfg", tb, tb,
                          preferred_element_type=jnp.float32)

    def b_vpu(t):
        return jnp.sum(t[:, :, None, :] * t[:, None, :, :], axis=-1)

    def c_f32(t):
        return jnp.einsum("bfd,bgd->bfg", t, t,
                          preferred_element_type=jnp.float32)

    def d_minorbatch(t):
        # [F, D, B] x [G, D, B] contracting d with batch b MINOR: the MXU
        # sees 128-lane batch tiles instead of 27-wide operands
        tt = jnp.transpose(t, (1, 2, 0)).astype(jnp.bfloat16)  # [F, D, B]
        z = jax.lax.dot_general(
            tt, tt, dimension_numbers=(((1,), (1,)), ((2,), (2,))),
            preferred_element_type=jnp.float32)  # [B, F, G]
        return z

    arms = {"A_einsum_bf16": arm(a_bf16), "B_mulreduce_f32": arm(b_vpu),
            "C_einsum_f32": arm(c_f32), "D_batchminor_bf16": arm(d_minorbatch)}

    R = args.reps
    compiled = {}
    for name, one in arms.items():
        def chain(t, _one=one):
            for _ in range(R):
                t = jax.lax.optimization_barrier(t)
                t = _one(t)
            return t
        jfn = jax.jit(chain)
        fence(jfn(t0_arr))
        compiled[name] = jfn

    results = {k: [] for k in compiled}
    for _ in range(args.windows):
        for name, jfn in compiled.items():
            t0 = time.time()
            fence(jfn(t0_arr))
            results[name].append((time.time() - t0) / R * 1e6)
    print(f"us per fwd+bwd interaction (median of {args.windows} "
          f"interleaved windows, {R} reps):")
    for name, ts in results.items():
        print(f"  {name:20s} {float(np.median(ts)):8.1f} us  "
              f"(min {min(ts):.1f} max {max(ts):.1f})")


if __name__ == "__main__":
    main()
