"""M2 batched-scan scaling experiment: tracklets/dispatch x compute dtype.

Measures the overlapped-pipeline throughput (bench.py methodology: async
dispatches, clock fenced on np.asarray of every output) of the M2-Track scan
tracker at B in {8, 16, 32} tracklets per dispatch, f32 vs bf16 compute, on
the real TPU. Purpose: find the batched-throughput sweet spot for the bench
headline and quantify the bf16 eval win in the overlapped regime (the
per-dispatch-fenced table shows none because the tunnel dominates there).

Usage: python scripts/bench_scan_scaling.py [B ...]
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
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker
from open3dsot_tpu.train.trainer import init_variables


def build(B: int, compute_dtype=None):
    cfg = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=1024, degrees=False,
        up_axis=[0, 0, 1], box_aware=True, use_z=True, limit_box=False,
        IoU_space=3, motion_threshold=0.15, train_type="train_motion",
        syn_num_tracklets=B, syn_tracklet_len=64, seed=7,
    ))
    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")
    tracker = M2ScanTracker(model, variables, cfg, max_points=1024,
                            frame_bucket=64, compute_dtype=compute_dtype)
    seqs = [sampler[i] for i in range(len(sampler))]
    T_pad = max(tracker._bucket_len(len(s)) for s in seqs)
    pts = np.zeros((B, T_pad, tracker.max_points, 3), np.float32)
    valid = np.zeros((B, T_pad, tracker.max_points), bool)
    wlh = np.zeros((B, 3), np.float32)
    init = np.zeros((B, 4), np.float32)
    for b, seq in enumerate(seqs):
        pts[b], valid[b] = tracker._pad_frames(seq, T_pad)
        fb = seq[0]["3d_bbox"]
        wlh[b] = fb.wlh
        init[b] = np.append(
            fb.center, fb.orientation.radians * fb.orientation.axis[-1])
    from open3dsot_tpu.tracking.scan_tracker import _counts

    args = (tracker.variables, jnp.asarray(pts),
            jnp.asarray(_counts(valid)),
            jnp.asarray(wlh), jnp.asarray(init))
    frames = sum(len(s) - 1 for s in seqs)
    return tracker, args, frames


def timed(track, args, frames, passes=5):
    np.asarray(track(*args))  # compile + warm
    t0 = time.perf_counter()
    outs = [track(*args) for _ in range(passes)]
    fetched = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / passes
    assert all(np.isfinite(f).all() for f in fetched)
    return frames / dt, dt


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for B in bs:
        for name, dt_ in (("f32", None), ("bf16", jnp.bfloat16)):
            tracker, args, frames = build(B, dt_)
            fps, sec = timed(tracker._track, args, frames)
            print(f"B={B:3d} {name}: {fps:10.1f} frames/s  "
                  f"({sec * 1e3:.2f} ms/pass, {frames} frames)", flush=True)


if __name__ == "__main__":
    main()
