"""Checkpoint-parity harness: released torch .ckpt -> flax -> full eval.

Reproduces the reference's `--test` workflow (README.md:144-158) from a
released Lightning checkpoint:

    python scripts/eval_released_ckpt.py \
        --cfg cfgs/BAT_Car.yaml --ckpt bat_kitti_car.ckpt \
        --data /path/to/kitti [--tracker host|scan] [--max_tracklets N]

Prints Success/Precision to compare against BASELINE.md. The torch->flax
mapping is numerically validated in tests/test_import*.py; this script is the
end-to-end parity check once the released checkpoints and dataset are
available (neither ships in this environment).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--ckpt", required=True, help="released torch .ckpt")
    parser.add_argument("--data", required=True, help="dataset root")
    parser.add_argument("--tracker", default="host", choices=["host", "scan"])
    parser.add_argument("--max_tracklets", type=int, default=None)
    args = parser.parse_args()

    from open3dsot_tpu.config import load_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.import_torch import import_checkpoint
    from open3dsot_tpu.models import get_model

    cfg = load_config(args.cfg, {"path": args.data})
    model = get_model(cfg.net_model)(cfg)
    variables = import_checkpoint(args.ckpt, cfg, model=model)
    print(f"imported {args.ckpt} into {cfg.net_model}")

    test_sampler = get_dataset(cfg, "test", cfg.test_split)
    if args.tracker == "scan" and cfg.net_model.lower() == "m2track":
        from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan

        succ, prec = evaluate_dataset_scan(
            model, variables, test_sampler, cfg, max_tracklets=args.max_tracklets
        )
    elif args.tracker == "scan":
        from open3dsot_tpu.tracking.scan_matching import (
            evaluate_dataset_scan_matching,
        )

        succ, prec = evaluate_dataset_scan_matching(
            model, variables, test_sampler, cfg, max_tracklets=args.max_tracklets
        )
    else:
        from open3dsot_tpu.tracking.eval import evaluate_dataset

        succ, prec = evaluate_dataset(
            model, variables, test_sampler, cfg,
            max_tracklets=args.max_tracklets, verbose=True,
        )
    print(f"success/test: {succ:.2f}  precision/test: {prec:.2f}")
    print("compare against BASELINE.md (reference README reproduction table)")


if __name__ == "__main__":
    main()
