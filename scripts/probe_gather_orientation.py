"""MXU cost of the fused-SA one-hot gather in three orientations (real TPU).

VERDICT r3 item 1, lever (a): "C1=64 half-fills the 128-wide MXU — pack two
batch elements per pass". This probe measures the three candidate shapes for
the SA layer-1 gather contraction at BAT search-tower scale (per batch
element: S=512 centers x K=32 slots, N=1024 points, C1=64 channels), bf16
operands / f32 accumulation, via the calibrated two-length chain timer:

  orig       (S*K, N) @ (N, 64)        - today's kernel: output 64 of 128
                                          lanes used
  blockdiag  (S*K, 2N) @ (2N, 128)     - lever (a) literally: two batch
                                          elements packed block-diagonally;
                                          full lanes but 2x contraction MACs
                                          (the zero blocks), so the MXU pass
                                          count is IDENTICAL to 2x orig
  transposed (64, N) @ (N, S*K)        - one-hot as the RIGHT operand:
                                          output is S*K lanes wide (full
                                          tiles) and M drops to 64 rows, so
                                          the pass count HALVES vs orig

Also times the MLP2 shape (S*K, 64) @ (64, 64) vs its transposed twin for
the same reason. Results feed the kernel-orientation decision in
ops/sa_fused.py (see NOTES.md round-4 log).
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
B = 8  # batch the dot over the tower's real batch so times match the profile
M = S * K


def main():
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(
            rng.normal(size=shape).astype(np.float32)).astype(jnp.bfloat16)

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((a.ndim - 1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    cases = {
        "orig (B,S*K,N)@(B,N,64)": (mk(B, M, N), mk(B, N, C1)),
        "blockdiag (B/2,S*K,2N)@(B/2,2N,128)": (
            mk(B // 2, M, 2 * N), mk(B // 2, 2 * N, 2 * C1)),
        "transposed (B,64,N)@(B,N,S*K)": (mk(B, C1, N), mk(B, N, M)),
        "mlp2 orig (B,S*K,64)@(B,64,64)": (mk(B, M, C1), mk(B, C1, C1)),
        "mlp2 transposed (B,64,64)@(B,64,S*K)": (
            mk(B, C1, C1), mk(B, C1, M)),
    }
    for name, (a, b) in cases.items():
        t = chain_timed(dot, (a, b), iters=50)
        macs = a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2]
        rate = f"{2 * macs / t / 1e12:.1f}" if t > 0 else "n/a"
        print(f"{name}: {t * 1e3:.3f} ms  "
              f"({rate} TFLOP/s incl. any zero-padding)", flush=True)


if __name__ == "__main__":
    main()
