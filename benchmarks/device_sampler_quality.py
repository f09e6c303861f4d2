"""Training-quality check for the on-device sample builder.

Trains the same M2-Track twice on the synthetic benchmark — once with the
host numpy sampler (reference-parity labels), once with the on-device
builder (data/device_sampler.py, distribution-equivalent randomness) — and
evaluates BOTH with the same host fidelity tracker. If the device builder
is faithful, final Success/Precision should land within the seed-to-seed
noise band.

Writes results into DRIFT.md (appended section).
Usage: python benchmarks/device_sampler_quality.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracklets", type=int, default=48)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    a = ap.parse_args()

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan
    from open3dsot_tpu.train.trainer import Trainer

    base = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=512, degrees=False,
        up_axis=[0, 0, 1], train_type="train_motion", num_candidates=4,
        motion_threshold=0.15, box_aware=True, bc_weight=1.0,
        use_augmentation=True, data_limit_box=True, use_z=True,
        limit_box=False, IoU_space=3, center_weight=2.0, angle_weight=10.0,
        seg_weight=0.1, motion_cls_seg_weight=0.1, lr=1e-3, optimizer="Adam",
        lr_decay_step=max(a.epochs // 3, 1), lr_decay_rate=0.2, wd=0.0,
        gradient_clip_val=1.0, batch_size=a.batch, epoch=a.epochs, workers=0,
        check_val_every_n_epoch=10 ** 9, bf16=True,
        syn_num_tracklets=a.tracklets, syn_tracklet_len=a.frames, seed=0,
        log_dir="/tmp/dsq",
    ))

    results = {}
    for mode in ("host", "device"):
        cfg = copy.deepcopy(base)
        cfg.device_sampler = mode == "device"
        model = get_model("m2track")(cfg)
        sampler = get_dataset(cfg, "train_motion", "train")
        trainer = Trainer(model, cfg, work_dir=f"/tmp/dsq_{mode}",
                          log_every=10 ** 9)
        t0 = time.time()
        state = trainer.fit(sampler, val_sampler=None, epochs=a.epochs)
        fit_s = time.time() - t0
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        test_sampler = get_dataset(cfg, "test", "test")
        s, p = evaluate_dataset_scan(model, variables, test_sampler, cfg,
                                     max_points=1024, batch_tracklets=8)
        results[mode] = (s, p, fit_s)
        print(f"{mode}: Success {s:.2f} Precision {p:.2f} (fit {fit_s:.0f}s)")

    (sh, ph, th), (sd, pd, td) = results["host"], results["device"]
    lines = [
        "",
        "## Device-sampler training quality "
        f"({a.tracklets}x{a.frames} synthetic, {a.epochs} epochs, bf16)",
        "",
        "| pipeline | Success | Precision | fit wall-clock |",
        "|---|---|---|---|",
        f"| host numpy sampler | {sh:.2f} | {ph:.2f} | {th:.0f}s |",
        f"| on-device builder  | {sd:.2f} | {pd:.2f} | {td:.0f}s |",
        f"| delta | {sd - sh:+.2f} | {pd - ph:+.2f} | {th / max(td, 1e-9):.2f}x faster |",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "DRIFT.md")
    with open(path, "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
