"""End-to-end dataset-eval wall-clock: device metrics + pipelining vs the
serial host-scored loop. (run on the real TPU)

Unlike bench.py's device-only overlapped loops, this times the WHOLE
evaluate_dataset_scan / evaluate_dataset_scan_matching call — host padding,
dispatch, scoring, metric binning — the number a user's `--test` run sees.
The serial loop fetches each batch's (B, T-1, 4) boxes and clips polygons
per frame on this 1-core host; the pipelined path scores on device and
keeps `depth` batches in flight.

Usage: python benchmarks/bench_e2e_eval.py  (writes BENCH_E2E_EVAL.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np  # noqa: F401


def m2_case():
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.scan_tracker import (
        M2ScanTracker,
        evaluate_dataset_scan,
    )
    from open3dsot_tpu.train.trainer import init_variables

    cfg = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=1024, degrees=False,
        up_axis=[0, 0, 1], box_aware=True, use_z=True, limit_box=False,
        IoU_space=3, motion_threshold=0.15, train_type="train_motion",
        syn_num_tracklets=64, syn_tracklet_len=32, seed=7,
    ))
    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")

    def make_tracker(**kw):
        return M2ScanTracker(model, variables, cfg, max_points=1024,
                             frame_bucket=32, **kw)

    return ("m2track", cfg, model, variables, sampler, make_tracker,
            evaluate_dataset_scan, 16)


def bat_case():
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.scan_matching import (
        MatchScanTracker,
        evaluate_dataset_scan_matching,
    )
    from open3dsot_tpu.train.trainer import init_variables

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
        syn_num_tracklets=32, syn_tracklet_len=32, seed=7,
    ))
    model = get_model("bat")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")

    def make_tracker(**kw):
        return MatchScanTracker(model, variables, cfg, max_points=1024,
                                first_crop_points=512, frame_bucket=32, **kw)

    return ("bat", cfg, model, variables, sampler, make_tracker,
            evaluate_dataset_scan_matching, 8)


def p2b_case():
    """Same shapes/flow as bat_case but net_model=p2b, box_aware=False —
    the third family's end-to-end eval row (VERDICT r3 item 4; mirrors
    bench.py's p2b_scan_fps config)."""
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.scan_matching import (
        MatchScanTracker,
        evaluate_dataset_scan_matching,
    )
    from open3dsot_tpu.train.trainer import init_variables

    cfg = make_config(dict(
        dataset="synthetic", net_model="p2b", category_name="Car",
        template_size=512, search_size=1024, point_sample_size=1024,
        feature_channel=256, hidden_channel=256, out_channel=256,
        vote_channel=256, num_proposal=64, k=4, bc_channel=9,
        box_aware=False, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        syn_num_tracklets=32, syn_tracklet_len=32, seed=7,
    ))
    model = get_model("p2b")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")

    def make_tracker(**kw):
        return MatchScanTracker(model, variables, cfg, max_points=1024,
                                first_crop_points=512, frame_bucket=32, **kw)

    return ("p2b", cfg, model, variables, sampler, make_tracker,
            evaluate_dataset_scan_matching, 8)


def run_case(case):
    name, cfg, model, variables, sampler, make_tracker, eval_fn, bt = case
    n_frames = sum(len(sampler[i]) for i in range(len(sampler)))
    exact_tracker = make_tracker()
    rows = []
    # (device_metrics, transfer_dtype): the pipelined path is H2D-bound on
    # this tunnel, so the int16 variant (halved point bytes, in-jit
    # dequant) isolates the transfer cost
    import shutil
    import tempfile

    from open3dsot_tpu.tracking.prep_store import eval_store

    int16_tracker = make_tracker(transfer_dtype="int16")
    store_dir = tempfile.mkdtemp(prefix=f"prep_store_{name}_")
    variants = [
        (True, exact_tracker, None, "device-scored, pipelined"),
        (True, int16_tracker, None,
         "device-scored, pipelined, int16 transfer"),
        (True, int16_tracker,
         lambda: eval_store(store_dir, cfg, int16_tracker, len(sampler), bt),
         "device-scored, pipelined, int16 + warm prep store"),
        (False, exact_tracker, None, "host-scored, serial"),
    ]
    for device_metrics, tr, store_factory, label in variants:
        # warm (compile; also fills the prep store) pass, then 2 timed passes
        kw = dict(batch_tracklets=bt, tracker=tr,
                  device_metrics=device_metrics,
                  prep_cache=store_factory() if store_factory else None)
        eval_fn(model, variables, sampler, cfg, **kw)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            if store_factory is not None:
                # fresh store object per pass: timed passes take the DISK
                # path (npz reads), not a warm object's in-memory layer
                kw["prep_cache"] = store_factory()
            succ, prec = eval_fn(model, variables, sampler, cfg, **kw)
        dt = (time.perf_counter() - t0) / reps
        fps = n_frames / dt
        rows.append((name, label, n_frames, dt, fps, succ, prec))
        print(f"{name:8s} {label:38s} {n_frames} frames in {dt:6.2f} s "
              f"= {fps:8.1f} frames/s  (S {succ:.2f} / P {prec:.2f})",
              flush=True)
    shutil.rmtree(store_dir, ignore_errors=True)
    return rows


def main():
    rows = []
    rows += run_case(m2_case())
    rows += run_case(bat_case())
    rows += run_case(p2b_case())
    out = [
        "# End-to-end dataset eval (TPU, wall-clock incl. host work)",
        "",
        f"device: {jax.devices()[0].device_kind}; synthetic tracklets; "
        "whole evaluate_dataset_scan* call timed (padding + dispatch + "
        "scoring + binning), mean of 2 passes after a compile pass.",
        "",
        "The pipelined eval is bound by the SLOWEST of (host padding/decode, "
        "H2D transfer, device scan), and the three families sit on "
        "different bounds, so no single variant is fastest everywhere:",
        "",
        "- M2's device step is fast (~18.7k frames/s batched), so its e2e "
        "is TRANSFER/HOST-bound on this tunnel (~35 MB/s H2D; each frame "
        "ships max_points*3 f32 = 12 KB of padded points; validity crosses "
        "as per-frame int32 COUNTS, scan_tracker._counts). int16 transfer "
        "(halved point bytes; single-pass native encoder "
        "native/geomlib.cpp::quantize_per_sample — the earlier numpy "
        "encoder cost 57 ms/batch of host time and made int16 a net LOSS) "
        "and the warm prep store (tracking/prep_store.py: packed arrays "
        "from disk, zero dataset decode, zero padding) each cut the "
        "binding stage; their individual wins are larger than the gap "
        "between them, so which of int16 / int16+store lands first can "
        "swap with the tunnel's run-to-run jitter (both stacked cleanly "
        "in the round-4 pass).",
        "- BAT/P2B matching towers are DEVICE-compute-bound (~5.2-6.2k "
        "frames/s batched-scan ceiling, BENCH_DETAILS.md), so transfer/"
        "host savings are worth at most a few percent there: int16's "
        "in-jit dequant adds work to the binding stage, leaving "
        "small run-dependent deltas in either direction rather than "
        "M2-sized wins. (Round-3's 'transfer-bound BAT, int16 1.8x "
        "faster' predates the round-3/4/5 fused-kernel work, 816 -> "
        "~5.8-6.2k frames/s, which moved BAT from transfer-bound to "
        "compute-bound.)",
        "",
        "Locally attached TPUs would go substantially faster still. The "
        "serial rows additionally pay the host polygon clip per frame and "
        "a full pipeline drain per batch. The fastest measured variant "
        "per model is marked **bold**.",
        "",
        "| model | eval loop | frames | s/pass | frames/s |",
        "|---|---|---|---|---|",
    ]
    best = {}
    for name, label, n, dt, fps, _, _ in rows:
        if fps > best.get(name, (None, 0.0))[1]:
            best[name] = (label, fps)
    for name, label, n, dt, fps, _, _ in rows:
        mark = "**" if best[name][0] == label else ""
        out.append(f"| {name} | {mark}{label}{mark} | {n} | {dt:.2f} "
                   f"| {mark}{fps:.1f}{mark} |")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BENCH_E2E_EVAL.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
