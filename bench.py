"""Tracking-FPS benchmark (run on the real TPU chip).

Headline: single-stream (B=1 tracklet) tracking FPS of the flagship M2-Track
on-device scan tracker (tracking/scan_tracker.py) — the entire per-frame
pipeline (crop -> resample -> channels -> forward -> box update) compiled
into one lax.scan, one device dispatch per tracklet. KITTI-shaped inputs:
point_sample_size=1024 (2048 stacked points/frame), 1024-point padded frames.

`vs_baseline` is like-for-like: single-stream FPS vs the ~57 FPS the BAT
paper reports on a 2080 GPU (SURVEY §6; the reference repo publishes no FPS).
Batched per-chip throughput (8 and 16 concurrent tracklets; 16 is the
measured v5e sweet spot) is reported as extra fields, not as the baseline
comparison.

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


def _timed_fps(track, args, real_frames: int, passes: int = 5,
               blocks: int = 3):
    """Run `blocks` blocks of `passes` fenced passes; returns
    (fps, seconds_per_pass) of the FASTEST block.

    Dispatches are async (so H2D/compute of pass k+1 may overlap pass k —
    that is the steady-state pipeline), but the clock stops only after
    np.asarray has pulled every pass's output to the host. A block is a
    ~100-ms window, so one remote-tunnel hiccup (~30-50 ms) inflates it by
    tens of percent; best-of-blocks measures the device's steady-state
    throughput rather than the tunnel's worst moment (observed: the
    single-stream row read 2046 vs 2546 f/s across otherwise identical
    runs before this)."""
    import numpy as np

    np.asarray(track(*args))  # compile + warm, fenced
    best_dt = None
    for _ in range(blocks):
        t0 = time.perf_counter()
        outs = [track(*args) for _ in range(passes)]
        fetched = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / passes
        assert all(np.isfinite(f).all() for f in fetched)
        best_dt = dt if best_dt is None else min(best_dt, dt)
    return real_frames / best_dt, best_dt


def _require_live_backend(timeout_s: float = 120.0):
    """Fail fast (clear one-line error, non-zero exit) if the device backend
    is unreachable — the remote-TPU tunnel can hang `jax.devices()` forever,
    which would otherwise hang the whole driver run."""
    import threading

    got, err = [], []

    def probe():
        try:
            got.append(jax.devices())
        except Exception as e:  # report the REAL failure, not a fake hang
            err.append(f"{type(e).__name__}: {e}")

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        reason = (err[0] if err else
                  f"jax.devices() hung >{timeout_s:.0f}s (remote-TPU "
                  f"tunnel down)")
        print(json.dumps({
            "metric": "tracking_fps_single_stream",
            "value": None,
            "unit": "frames/s",
            "vs_baseline": None,
            "error": f"device backend unreachable: {reason}",
        }))
        sys.exit(3)


def main():
    _require_live_backend()
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
            syn_num_tracklets=16,
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
        from open3dsot_tpu.tracking.scan_tracker import _counts

        a = (
            tracker.variables,
            jnp.asarray(pts[batch_slice]),
            jnp.asarray(_counts(valid[batch_slice])),
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
    batched = bench_case(slice(0, 8), passes=5)
    # 16 tracklets/dispatch is the measured throughput sweet spot on v5e
    # (scripts/bench_scan_scaling.py: 8 -> 14.0k, 16 -> 18.4k, 32 -> 17.4k
    # frames/s; bf16 eval is a small consistent LOSS at all B — the scan
    # step is gather/bandwidth-bound, not MXU-bound, so compute stays f32)
    batched16 = bench_case(slice(0, B), passes=5)

    # --- matching-tracker scan rows (BAT fused + P2B): regression guards
    # for the fused SA kernels + matching scan path; same overlapped-dispatch
    # methodology as the M2 rows ---
    def matching_scan_fps(net_model: str, box_aware: bool, NB: int):
        from open3dsot_tpu.geometry import points_utils as _pu
        from open3dsot_tpu.tracking.scan_matching import MatchScanTracker
        from open3dsot_tpu.tracking.scan_tracker import _counts as _cn

        mcfg = make_config(dict(
            dataset="synthetic", net_model=net_model, category_name="Car",
            template_size=512, search_size=1024, point_sample_size=1024,
            feature_channel=256, hidden_channel=256, out_channel=256,
            vote_channel=256, num_proposal=64, k=4, bc_channel=9,
            box_aware=box_aware, use_fps=True, normalize_xyz=False,
            degrees=True, use_z=False, limit_box=False, IoU_space=3,
            model_bb_scale=1.25, model_bb_offset=0.0,
            search_bb_scale=1.25, search_bb_offset=2.0,
            shape_aggregation="firstandprevious",
            reference_BB="previous_result",
            bb_scale=1.25, bb_offset=2.0,
            train_type="train_siamese",
            syn_num_tracklets=NB, syn_tracklet_len=64, seed=7,
        ))
        net = get_model(net_model)(mcfg)
        net_vars = init_variables(net, jax.random.PRNGKey(0))
        trk = MatchScanTracker(net, net_vars, mcfg,
                               max_points=1024, frame_bucket=64)
        seqs = [test_sampler[i] for i in range(NB)]
        # pad once on the host, then issue overlapped async _track dispatches
        # (track_batch fetches synchronously — that would measure the tunnel)
        T_m = max(trk._bucket_len(len(s)) for s in seqs)
        P, P1 = trk.max_points, trk.first_crop_points
        bpts = np.zeros((NB, T_m, P, 3), np.float32)
        bval = np.zeros((NB, T_m, P), bool)
        bfirst = np.zeros((NB, P1, 3), np.float32)
        bfv = np.zeros((NB, P1), bool)
        bwlh = np.zeros((NB, 3), np.float32)
        binit = np.zeros((NB, 4), np.float32)
        for b, seq in enumerate(seqs):
            fb = seq[0]["3d_bbox"]
            bwlh[b] = fb.wlh
            binit[b] = np.append(
                fb.center, fb.orientation.radians * fb.orientation.axis[-1])
            crop, _ = _pu.cropAndCenterPC(
                seq[0]["pc"], fb, scale=mcfg.model_bb_scale,
                offset=mcfg.model_bb_offset)
            fp = crop.points.T.astype(np.float32)[:P1]
            bfirst[b, : len(fp)] = fp
            bfv[b, : len(fp)] = True
            for t, frame in enumerate(seq):
                pp = frame["pc"].points.T.astype(np.float32)[:P]
                bpts[b, t, : len(pp)] = pp
                bval[b, t, : len(pp)] = True
        margs = (trk.variables, jnp.asarray(bpts), jnp.asarray(_cn(bval)),
                 jnp.asarray(bwlh), jnp.asarray(binit), jnp.asarray(bfirst),
                 jnp.asarray(_cn(bfv)))
        frames = sum(len(s) - 1 for s in seqs)
        fps, _ = _timed_fps(trk._track, margs, frames, passes=5)
        return fps

    # both rows stay at 8 tracklets (matching scan scaling is ~flat:
    # 5.36k/5.59k/5.69k f/s at 8/16/32 BAT — compute-bound per frame)
    bat_fps = p2b_fps = None
    try:
        bat_fps = matching_scan_fps("bat", True, 8)
    except Exception as e:  # never fail the headline on the extra rows
        print(f"bat row skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        p2b_fps = matching_scan_fps("p2b", False, 8)
    except Exception as e:
        print(f"p2b row skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # physical sanity gate: refuse to print impossible numbers
    for name, case in (("single_stream", single), ("batched", batched),
                       ("batched16", batched16)):
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
                "batched_fps_16_tracklets": round(batched16["fps"], 2),
                "flops_per_frame": round(single["flops_per_frame"], 0),
                "single_stream_implied_tflops": round(single["implied_tflops"], 3),
                "batched_implied_tflops": round(batched16["implied_tflops"], 3),
                "batched_mfu": round(batched16["mfu"], 4) if batched16["mfu"] is not None else None,
                "bat_fused_scan_fps_8_tracklets": (
                    round(bat_fps, 2) if bat_fps is not None else None),
                "p2b_scan_fps_8_tracklets": (
                    round(p2b_fps, 2) if p2b_fps is not None else None),
                # all FPS fields here use OVERLAPPED dispatch (passes issued
                # back-to-back; the ~30 ms tunnel latency is pipelined away).
                # benchmarks/run_all.py measures the same pipelines with ONE
                # fenced dispatch at a time — those numbers pay the tunnel
                # per dispatch and are lower bounds (see BENCH_DETAILS.md).
                "dispatch_model": "overlapped_pipeline",
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
