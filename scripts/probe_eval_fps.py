"""Probe: how much of the BAT eval forward is FPS? (run on TPU)

Times the full BAT eval forward with use_fps on/off, and the Pallas FPS
kernel alone at both tower shapes, with the chained in-graph methodology.
Written to resolve a profile inconsistency: standalone stage timings summed
to ~2.4x the full forward (PROFILE_BAT_EVAL.md). RESOLVED: the ~30 ms
tunnel dispatch overhead divided by 50 chain iterations added ~0.6 ms to
every row — 1x to the full-forward row, 5x to the five stage rows
(scripts/probe_chain_overhead.py measures it directly). chain_timed now
cancels the overhead by differencing two chain lengths; real FPS cost is
~0.15 ms at (8,1024)->512, and the calibrated stage rows sum to the
forward.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed


def main():
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.geometry import rigid
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import init_variables

    B, M, N = 8, 512, 1024
    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    search = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 2)
    wlh = jnp.asarray(np.abs(rng.normal(size=(B, 3))).astype(np.float32) + 1)
    tbc = rigid.box_cloud(template, jnp.zeros((B, 4), jnp.float32), wlh)
    batch = {"template_points": template, "search_points": search,
             "points2cc_dist_t": tbc}

    for use_fps in (True, False):
        cfg = make_config(dict(
            dataset="synthetic", net_model="bat", category_name="Car",
            template_size=M, search_size=N, point_sample_size=N,
            feature_channel=256, hidden_channel=256, out_channel=256,
            vote_channel=256, num_proposal=64, k=4, bc_channel=9,
            box_aware=True, use_fps=use_fps, normalize_xyz=False,
            degrees=True, use_z=False, limit_box=False, IoU_space=3,
            model_bb_scale=1.25, model_bb_offset=0.0,
            search_bb_scale=1.25, search_bb_offset=2.0,
            shape_aggregation="firstandprevious",
            reference_BB="previous_result",
            bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
            fused_sa=True,
        ))
        model = get_model("bat")(cfg)
        variables = init_variables(model, jax.random.PRNGKey(0))

        def fwd(v, b):
            return model.apply(v, b, train=False)

        t = chain_timed(fwd, (variables, batch), iters=50)
        print(f"BAT eval fwd use_fps={use_fps}: {t * 1e3:.3f} ms", flush=True)

    from open3dsot_tpu.ops.fps_pallas import furthest_point_sample_pallas

    for n, npt, x in ((N, N // 2, search), (M, M // 2, template)):
        def fps_run(x, npt=npt):
            return furthest_point_sample_pallas(x, npt)

        t = chain_timed(fps_run, (x,), iters=50)
        print(f"FPS pallas ({B},{n})->{npt}: {t * 1e3:.3f} ms", flush=True)

    # FPS with a dependent consumer (gather) — checks whether the
    # standalone int32 output path inflates the chained measurement
    from open3dsot_tpu.ops.grouping import gather_points

    def fps_gather(x):
        idx = furthest_point_sample_pallas(x, N // 2)
        return gather_points(x, idx)

    t = chain_timed(fps_gather, (search,), iters=50)
    print(f"FPS+gather ({B},{N})->{N // 2}: {t * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
