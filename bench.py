"""Tracking-FPS benchmark (run on the real TPU chip).

Headline: single-stream (B=1 tracklet) tracking FPS of the flagship M2-Track
on-device scan tracker (tracking/scan_tracker.py) — the entire per-frame
pipeline (crop -> resample -> channels -> forward -> box update) compiled
into one lax.scan, one device dispatch per tracklet. KITTI-shaped inputs:
point_sample_size=1024 (2048 stacked points/frame), 1024-point padded frames.

`vs_baseline` is like-for-like: single-stream FPS vs the ~57 FPS the BAT
paper reports on a 2080 GPU (SURVEY §6; the reference repo publishes no FPS).
Batched per-chip throughput (8 concurrent tracklets) is reported as an extra
field, not as the baseline comparison.

Honesty guarantees (round-1 regression — the old harness trusted
`block_until_ready` through the remote-TPU tunnel and printed a physically
impossible number):
  * every timed pass is fenced by `np.asarray` on its output — the clock
    stops only after result bytes actually reach the host;
  * FLOPs/pass come from XLA `compile().cost_analysis()`, and the implied
    TFLOP/s is computed and printed;
  * the script REFUSES to print any FPS whose implied TFLOP/s exceeds the
    chip's bf16 peak — it exits non-zero instead.
"""

from __future__ import annotations

import json
import sys
import time

import jax

# bf16 peak TFLOP/s by device kind; the gate uses bf16 peak as the absolute
# physical ceiling (f32 throughput is strictly lower on every TPU).
_PEAK_TFLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_TFLOPS.items():
        if name.lower() in kind.lower():
            return peak
    if "tpu" in kind.lower():
        return 197e12  # conservative default for unknown TPU kinds
    return float("inf")  # CPU smoke runs: no meaningful peak, skip the gate


def _timed_fps(track, args, real_frames: int, passes: int = 5):
    """Run `passes` fenced passes; returns (fps, seconds_per_pass).

    Dispatches are async (so H2D/compute of pass k+1 may overlap pass k —
    that is the steady-state pipeline), but the clock stops only after
    np.asarray has pulled every pass's output to the host.
    """
    import numpy as np

    np.asarray(track(*args))  # compile + warm, fenced
    t0 = time.perf_counter()
    outs = [track(*args) for _ in range(passes)]
    fetched = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / passes
    assert all(np.isfinite(f).all() for f in fetched)
    return real_frames / dt, dt


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

    peak = _peak_flops()

    def bench_case(batch_slice, passes):
        a = (
            tracker.variables,
            jnp.asarray(pts[batch_slice]),
            jnp.asarray(valid[batch_slice]),
            jnp.asarray(wlh[batch_slice]),
            jnp.asarray(init[batch_slice]),
        )
        compiled = tracker._track.lower(*a).compile()
        # XLA cost analysis counts a lax.scan/while body ONCE — multiply by
        # the scan length (T_pad - 1 tracked frames) for the real per-pass
        # FLOPs (round-1 regression: dividing the single-step count across
        # all frames under-reported the implied TFLOP/s 63x)
        flops_per_pass = float(compiled.cost_analysis()["flops"]) * (T_pad - 1)
        nb = a[1].shape[0]
        real_frames = sum(len(sequences[i]) - 1 for i in range(batch_slice.start or 0, (batch_slice.start or 0) + nb))
        fps, dt = _timed_fps(tracker._track, a, real_frames, passes=passes)
        implied = flops_per_pass / dt
        return {
            "fps": fps,
            "sec_per_pass": dt,
            "flops_per_pass": flops_per_pass,
            "flops_per_frame": flops_per_pass / (nb * (T_pad - 1)),
            "implied_tflops": implied / 1e12,
            "mfu": implied / peak if peak != float("inf") else None,
        }

    single = bench_case(slice(0, 1), passes=10)
    batched = bench_case(slice(0, B), passes=5)

    # physical sanity gate: refuse to print impossible numbers
    for name, case in (("single_stream", single), ("batched", batched)):
        if case["implied_tflops"] * 1e12 > peak:
            print(
                f"BENCH REJECTED: {name} implies {case['implied_tflops']:.1f} "
                f"TFLOP/s > chip bf16 peak {peak / 1e12:.3g} — timing fence "
                "is broken, refusing to report.",
                file=sys.stderr,
            )
            sys.exit(1)

    fps_b1 = single["fps"]
    print(
        json.dumps(
            {
                "metric": "m2track_scan_tracking_fps_single_stream",
                "value": round(fps_b1, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_b1 / 57.0, 3),
                "batched_fps_8_tracklets": round(batched["fps"], 2),
                "flops_per_frame": round(single["flops_per_frame"], 0),
                "single_stream_implied_tflops": round(single["implied_tflops"], 3),
                "batched_implied_tflops": round(batched["implied_tflops"], 3),
                "batched_mfu": round(batched["mfu"], 4) if batched["mfu"] is not None else None,
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
