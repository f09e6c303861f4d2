"""BAT fused matching-scan scaling: tracklets/dispatch sweep.

Same overlapped-dispatch methodology as scripts/bench_scan_scaling.py, for
the BAT MatchScanTracker with fused SA kernels (the bench.py extra row).

Usage: python scripts/bench_bat_scan_scaling.py [B ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.geometry import points_utils as pu
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_matching import MatchScanTracker
from open3dsot_tpu.train.trainer import init_variables


def build(B: int):
    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=512, search_size=1024, point_sample_size=1024,
        feature_channel=256, hidden_channel=256, out_channel=256,
        vote_channel=256, num_proposal=64, k=4, bc_channel=9,
        box_aware=True, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        syn_num_tracklets=B, syn_tracklet_len=64, seed=7,
    ))
    model = get_model("bat")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")
    tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                               frame_bucket=64)
    seqs = [sampler[i] for i in range(B)]
    T = max(tracker._bucket_len(len(s)) for s in seqs)
    P, P1 = tracker.max_points, tracker.first_crop_points
    pts = np.zeros((B, T, P, 3), np.float32)
    val = np.zeros((B, T, P), bool)
    first = np.zeros((B, P1, 3), np.float32)
    fv = np.zeros((B, P1), bool)
    wlh = np.zeros((B, 3), np.float32)
    init = np.zeros((B, 4), np.float32)
    for b, seq in enumerate(seqs):
        fb = seq[0]["3d_bbox"]
        wlh[b] = fb.wlh
        init[b] = np.append(
            fb.center, fb.orientation.radians * fb.orientation.axis[-1])
        crop, _ = pu.cropAndCenterPC(seq[0]["pc"], fb, scale=1.25, offset=0.0)
        fp = crop.points.T.astype(np.float32)[:P1]
        first[b, : len(fp)] = fp
        fv[b, : len(fp)] = True
        for t, frame in enumerate(seq):
            p = frame["pc"].points.T.astype(np.float32)[:P]
            pts[b, t, : len(p)] = p
            val[b, t, : len(p)] = True
    from open3dsot_tpu.tracking.scan_tracker import _counts

    args = (tracker.variables, jnp.asarray(pts),
            jnp.asarray(_counts(val)),
            jnp.asarray(wlh), jnp.asarray(init), jnp.asarray(first),
            jnp.asarray(_counts(fv)))
    frames = sum(len(s) - 1 for s in seqs)
    return tracker, args, frames


def timed(track, args, frames, passes=5):
    np.asarray(track(*args))
    t0 = time.perf_counter()
    outs = [track(*args) for _ in range(passes)]
    fetched = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / passes
    assert all(np.isfinite(f).all() for f in fetched)
    return frames / dt, dt


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 16]
    for B in bs:
        tracker, args, frames = build(B)
        fps, sec = timed(tracker._track, args, frames)
        print(f"B={B:3d}: {fps:10.1f} frames/s  ({sec * 1e3:.2f} ms/pass, "
              f"{frames} frames)", flush=True)


if __name__ == "__main__":
    main()
