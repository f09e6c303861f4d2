"""Fused-vs-unfused SA tower numerics on the REAL TPU backend.

The golden tests compare in CPU interpret mode (exact f32 dots); this probe
quantifies the TPU-side deviation of the fused kernel against the unfused
XLA path — used to confirm kernel changes (e.g. explicit bf16 gather
operands) are numerics-neutral relative to the DEFAULT-precision baseline.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from open3dsot_tpu.models.pointnet import PointnetBackbone

    B, N = 8, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 2)
    npts = [N // 2, N // 4, N // 8]
    fused = PointnetBackbone(use_fps=True, normalize_xyz=False, fused_eval=True)
    plain = PointnetBackbone(use_fps=True, normalize_xyz=False, fused_eval=False)
    v = fused.init(jax.random.PRNGKey(0), x[:2], npts, train=False)

    of = jax.jit(lambda v, x: fused.apply(v, x, npts, train=False))(v, x)
    op = jax.jit(lambda v, x: plain.apply(v, x, npts, train=False))(v, x)
    for name, a, b in (("xyz", of[0], op[0]), ("feat", of[1], op[1])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.maximum(np.abs(b), 1e-3)
        print(f"{name}: max|d| {np.abs(a - b).max():.3e}  "
              f"max rel {np.abs((a - b) / denom).max():.3e}  "
              f"mean|d| {np.abs(a - b).mean():.3e}")


if __name__ == "__main__":
    main()
