"""Root-cause ablation for the P2B scan-vs-host eval drift (VERDICT r4 #1).

DRIFT.md measured the P2B family (camera mode + use_z=False + limit_box=True,
cfgs/P2B_Car.yaml) at +5.83 Success / +8.42 Precision scan-over-host — 10x the
re-seeded-host noise floor — while M2/BAT drift ~0.1-0.3 under the identical
deterministic-resample deviation. This script bisects the mechanism with the
SAME trained weights (/tmp/drift_run_p2b/ckpt_best from the round-4 drift run):

1. reproduce the base rows (host 42.80/55.53, scan 48.63/63.95);
2. score the SCAN trajectories with the HOST scorer (device_metrics=False) —
   if that lands at the host number the divergence is in the device scorer,
   if it stays at the scan number the divergence is in the tracking itself;
3. run the HOST tracker with the scan's deterministic substitutions patched
   in (regularize_pc -> strided selection, limit_box re-draw -> 0): if
   host_strided lands at the scan number, the whole drift is the documented
   resampling/re-draw deviation (the reference's upsample-with-replacement
   drops ~15% of unique crop points; strided cyclic fill keeps them all),
   not a behavioral bug — scripts/bisect_p2b_scan.py separately proves the
   two paths are input-identical under matched determinism;
4. ablate each unique-to-P2B config axis one at a time:
   limit_box=False, use_z=True, up_axis=[0,0,1] (z-up synthetic scene) —
   whichever ablation collapses the drift names the mechanism.

Host evals are ~10 min each on this 1-core machine; run in the background.
"""

from __future__ import annotations

import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def base_config():
    from open3dsot_tpu.config import make_config

    with open(os.path.join(REPO, "cfgs", "P2B_Car.yaml")) as f:
        base = yaml.safe_load(f)
    base.update(batch_size=32)
    base.update(
        dataset="synthetic",
        syn_num_tracklets=64,
        syn_tracklet_len=32,
        workers=0,
        epoch=120,
        lr_decay_step=40,
        lr_decay_rate=0.2,
        check_val_every_n_epoch=15,
        val_tracker="scan",
        device_sampler=True,
        bf16=True,
        seed=3,
        log_dir="/tmp/drift_run_p2b",
    )
    return make_config(base)


def main():
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.eval import evaluate_dataset
    from open3dsot_tpu.tracking.scan_matching import evaluate_dataset_scan_matching
    from open3dsot_tpu.train.trainer import Trainer

    restored = Trainer.load_checkpoint("/tmp/drift_run_p2b/ckpt_best")
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    cfg0 = base_config()

    # (label, config overrides, which paths)
    variants = [
        ("base", {}, ("host", "host_strided", "scan", "scan_hostscored")),
        ("limit_box=False", {"limit_box": False}, ("host", "scan")),
        ("use_z=True", {"use_z": True}, ("host", "scan")),
        ("zup (up_axis=[0,0,1])",
         {"up_axis": [0, 0, 1], "coordinate_mode": "velodyne"},
         ("host", "scan")),
    ]

    print("| variant | path | Success | Precision | wall s |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for label, overrides, paths in variants:
        cfg = copy.deepcopy(cfg0)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        cfg.bf16 = False
        cfg.scan_resample = "strided"
        test_sampler = get_dataset(cfg, "test", "test")
        for path in paths:
            c = copy.deepcopy(cfg)
            t0 = time.time()
            if path == "host":
                np.random.seed(0)  # fixed process history for the limit_box
                s, p = evaluate_dataset(
                    get_model(c.net_model)(c), variables, test_sampler, c)
            elif path == "host_strided":
                # the HOST loop with the scan's deterministic substitutions
                # patched in: isolates the resampling/re-draw deviation from
                # any (dis)proof of scan-path behavior
                from open3dsot_tpu.geometry import points_utils
                from scripts.bisect_p2b_scan import strided_regularize

                orig_reg = points_utils.regularize_pc
                orig_uniform = np.random.uniform
                points_utils.regularize_pc = strided_regularize
                np.random.uniform = lambda *a, **k: 0.0
                try:
                    s, p = evaluate_dataset(
                        get_model(c.net_model)(c), variables, test_sampler, c)
                finally:
                    points_utils.regularize_pc = orig_reg
                    np.random.uniform = orig_uniform
            else:
                s, p = evaluate_dataset_scan_matching(
                    get_model(c.net_model)(c), variables, test_sampler, c,
                    max_points=1024,
                    device_metrics=(path == "scan"))
            print(f"| {label} | {path} | {s:.2f} | {p:.2f} | "
                  f"{time.time() - t0:.0f} |", flush=True)


if __name__ == "__main__":
    main()
