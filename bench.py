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
    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    test_sampler = get_dataset(cfg, "test", "test")
    tracker = M2ScanTracker(model, variables, cfg, max_points=4096, frame_bucket=64)

    sequences = [test_sampler[i] for i in range(len(test_sampler))]
    # warmup: compile the batched scan
    tracker.track_batch(sequences)

    frames = sum(len(s) for s in sequences)
    t0 = time.perf_counter()
    for _ in range(3):
        boxes = tracker.track_batch(sequences)
    jax.block_until_ready(boxes[0])
    dt = (time.perf_counter() - t0) / 3
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
