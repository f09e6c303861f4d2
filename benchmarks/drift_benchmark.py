"""Host-vs-scan eval drift on a statistically meaningful benchmark.

VERDICT r1 item 5: the scan tracker substitutes deterministic resampling for
the reference's seeded np.random.choice; round 1 only measured the metric
gap on a 4-tracklet fixture. This script:

1. builds a synthetic benchmark of >=64 tracklets x >=32 frames,
2. trains M2-Track on the synthetic train split (real TPU, a few minutes),
3. evaluates the SAME trained weights through
   - the host fidelity path (seeded RNG resampling, per-frame loop),
   - the scan path with resample mode 'first' (round-1 behavior),
   - the scan path with resample mode 'strided' (evenly-spaced, default),
4. writes DRIFT.md with |dSuccess| / |dPrecision| per mode.

Usage: python benchmarks/drift_benchmark.py [--tracklets 64] [--frames 32]
       [--epochs 40]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracklets", type=int, default=64)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.eval import evaluate_dataset
    from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan
    from open3dsot_tpu.train.trainer import Trainer

    cfg = make_config(
        dict(
            dataset="synthetic", net_model="m2track", category_name="Car",
            bb_scale=1.25, bb_offset=2, point_sample_size=512, degrees=False,
            up_axis=[0, 0, 1], train_type="train_motion", num_candidates=1,
            motion_threshold=0.15, box_aware=True, use_z=True, limit_box=False,
            IoU_space=3, center_weight=2.0, angle_weight=10.0, seg_weight=0.1,
            bc_weight=1.0, motion_cls_seg_weight=0.1, lr=1e-3,
            optimizer="Adam", lr_decay_step=max(args.epochs // 3, 1),
            lr_decay_rate=0.2, wd=0.0, gradient_clip_val=1.0,
            batch_size=args.batch, epoch=args.epochs, workers=0,
            check_val_every_n_epoch=10**9,  # no mid-train validation
            syn_num_tracklets=args.tracklets, syn_tracklet_len=args.frames,
            seed=3, log_dir="/tmp/drift_run",
        )
    )
    model = get_model("m2track")(cfg)
    train_sampler = get_dataset(cfg, "train_motion", "train")
    test_sampler = get_dataset(cfg, "test", "test")

    t0 = time.time()
    trainer = Trainer(model, cfg, work_dir="/tmp/drift_run", log_every=50)
    state = trainer.fit(train_sampler, None, epochs=args.epochs)
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    train_s = time.time() - t0
    print(f"trained {args.epochs} epochs in {train_s:.0f}s", flush=True)

    rows = []
    t0 = time.time()
    host_s, host_p = evaluate_dataset(model, variables, test_sampler, cfg)
    host_t = time.time() - t0
    rows.append(("host (seeded RNG, fidelity)", host_s, host_p, host_t, "-", "-"))
    print(f"host: S {host_s:.2f} P {host_p:.2f} ({host_t:.0f}s)", flush=True)

    for mode in ("first", "strided"):
        c = copy.deepcopy(cfg)
        c.scan_resample = mode
        t0 = time.time()
        s, p = evaluate_dataset_scan(model, variables, test_sampler, c,
                                     max_points=1024)
        dt = time.time() - t0
        rows.append((f"scan resample={mode}", s, p, dt,
                     f"{abs(s - host_s):.2f}", f"{abs(p - host_p):.2f}"))
        print(f"scan[{mode}]: S {s:.2f} P {p:.2f} "
              f"|dS| {abs(s-host_s):.2f} |dP| {abs(p-host_p):.2f} ({dt:.0f}s)",
              flush=True)

    frames_total = sum(len(test_sampler[i]) for i in range(len(test_sampler)))
    out = [
        "# Host-vs-scan eval drift (trained M2-Track, synthetic benchmark)",
        "",
        f"device: {jax.devices()[0].device_kind}; benchmark: "
        f"{args.tracklets} tracklets x {args.frames} frames "
        f"({frames_total} frames); trained {args.epochs} epochs "
        f"({train_s:.0f}s) on the synthetic train split.",
        "",
        "| eval path | Success | Precision | wall s | abs dS vs host | abs dP vs host |",
        "|---|---|---|---|---|---|",
    ]
    for name, s, p, dt, ds, dp in rows:
        out.append(f"| {name} | {s:.2f} | {p:.2f} | {dt:.0f} | {ds} | {dp} |")
    out += [
        "",
        "Drift source: the scan path replaces the host's seeded "
        "`np.random.choice` resampling (points_utils.py:24-40, seed=1 at "
        "eval) with deterministic selection; 'strided' picks evenly-spaced "
        "cropped points (closest to a uniform subset), 'first' is the "
        "round-1 prefix+cyclic fill. Exact RNG replication on device is not "
        "feasible (PCG64 choice-without-replacement inside a scan).",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "DRIFT.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("wrote DRIFT.md")


if __name__ == "__main__":
    main()
