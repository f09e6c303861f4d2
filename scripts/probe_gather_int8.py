"""int8 operands for the fused-SA one-hot gather: measured accept/reject
(VERDICT r4 #5).

The one-hot gather (ops/sa_fused.py) is the measured ~0.3 ms floor of the
BAT fused eval tower in ANY orientation (scripts/probe_gather_orientation.py).
The 0/1 one-hot matrix is exact in int8, and v5e int8 MXU peak is ~2x bf16 —
IF the whole contraction can run int8. This probe measures, at the BAT
layer-1 gather shape (B=8, M=S*K=16384, N=1024, C1=64), via the calibrated
two-length chain timer:

  bf16 @ bf16 -> f32   today's kernel gather pass (baseline)
  int8 @ int8 -> i32   the int8 upper bound. NOTE exactness caveat: only
                       the ONE-HOT side is exact in int8 — the gathered
                       operand is a bf16 ACTIVATION (the A-form kernel
                       gathers the MLP1 output y1), so an exact int8x int8
                       gather would need an exact int8 encoding of y1,
                       which does not exist. This row measures whether the
                       MXU rate win is even there to chase.
  int8 @ int8 (tri)    the ball-query cumulative-count dot valid(0/1) @
                       tri(0/1) at kernel shape (B, K+1=33, N) x (N, N) —
                       BOTH operands binary, so int8 IS exact here; this is
                       the one place an int8 win could land without any
                       numerics change.

Run on an idle TPU (the tunnel serializes dispatches; concurrent jobs
corrupt the timing).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed

S, K, N, C1 = 512, 32, 1024, 64
B = 8
M = S * K


def main():
    rng = np.random.default_rng(0)

    def bdot(pet):
        def f(a, b):
            return jax.lax.dot_general(
                a, b, (((a.ndim - 1,), (1,)), ((0,), (0,))),
                preferred_element_type=pet,
                precision=jax.lax.Precision.DEFAULT)
        return f

    onehot_f = (rng.integers(0, N, size=(B, M, 1)) ==
                np.arange(N)[None, None, :])
    feat_f = rng.normal(size=(B, N, C1)).astype(np.float32)
    tri_f = np.tril(np.ones((N, N), np.float32))
    valid_f = (rng.random((B, K + 1, N)) > 0.3).astype(np.float32)

    cases = {
        "gather bf16@bf16->f32 (baseline)": (
            jnp.asarray(onehot_f, jnp.bfloat16), jnp.asarray(feat_f, jnp.bfloat16),
            bdot(jnp.float32)),
        "gather int8@int8->i32": (
            jnp.asarray(onehot_f, jnp.int8), jnp.asarray(
                np.clip(feat_f * 50, -127, 127).astype(np.int8)),
            bdot(jnp.int32)),
        "bq-cum bf16@bf16->f32 (baseline)": (
            jnp.asarray(valid_f, jnp.bfloat16),
            jnp.asarray(np.broadcast_to(tri_f, (B, N, N)), jnp.bfloat16),
            bdot(jnp.float32)),
        "bq-cum int8@int8->i32 (exact: both binary)": (
            jnp.asarray(valid_f, jnp.int8),
            jnp.asarray(np.broadcast_to(tri_f, (B, N, N)).astype(np.int8)),
            bdot(jnp.int32)),
    }
    for name, (a, b, dot) in cases.items():
        try:
            t = chain_timed(dot, (a, b), iters=50)
        except Exception as e:  # noqa: BLE001 — record unsupported lowerings
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        macs = a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2]
        rate = f"{2 * macs / t / 1e12:.1f}" if t > 0 else "n/a"
        print(f"{name}: {t * 1e3:.3f} ms  ({rate} TOP/s)", flush=True)


if __name__ == "__main__":
    main()
