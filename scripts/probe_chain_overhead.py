"""Calibrate chain_timed's fixed per-dispatch overhead on this tunnel.

t_iter(K) = w + h/K for work w and per-dispatch overhead h; measuring at two
K values solves both. Run on the TPU: python scripts/probe_chain_overhead.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed


def solve(name, f, args, k1=50, k2=250):
    t1 = chain_timed(f, args, iters=k1, calibrate=False)
    t2 = chain_timed(f, args, iters=k2, calibrate=False)
    w = (k2 * t2 - k1 * t1) / (k2 - k1)
    h = (t1 - w) * k1
    print(f"{name:24s} t@{k1}={t1 * 1e3:7.3f} ms  t@{k2}={t2 * 1e3:7.3f} ms  "
          f"work={w * 1e3:7.3f} ms  overhead/dispatch={h * 1e3:7.1f} ms",
          flush=True)


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1024, 3))
                    .astype(np.float32))

    def trivial(x):
        return x * 1.0001

    solve("trivial mul", trivial, (x,))

    from open3dsot_tpu.ops.fps_pallas import furthest_point_sample_pallas

    def fps(x):
        return furthest_point_sample_pallas(x, 512)

    solve("FPS (8,1024)->512", fps, (x,))


if __name__ == "__main__":
    main()
