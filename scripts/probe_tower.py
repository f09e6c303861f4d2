"""Time just the fused search-tower forward (calibrated). For A/B of
sa_fused kernel variants: run, `git stash`, run, `git stash pop`."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from benchmarks.profile_bat import chain_timed


def main():
    from open3dsot_tpu.models.pointnet import PointnetBackbone

    B, N = 8, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 2)
    bb = PointnetBackbone(use_fps=True, normalize_xyz=False, fused_eval=True)
    npts = [N // 2, N // 4, N // 8]
    v = bb.init(jax.random.PRNGKey(0), x[:2], npts, train=False)

    def fwd(v, x):
        return bb.apply(v, x, npts, train=False)

    for trial in range(3):
        t = chain_timed(fwd, (v, x), iters=50)
        print(f"search tower fwd (B={B}, N={N}) trial {trial}: "
              f"{t * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
