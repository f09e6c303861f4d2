#!/usr/bin/env python
"""Offline Waymo SOT info generation — batch CLI over splits x classes.

Mirrors the reference's offline driver
(/root/reference/datasets/generate_waymo_sot.py:56-62), which loops
splits=['train','val'] x classes=['VEHICLE','PEDESTRIAN','CYCLIST'] over a
hardcoded root; here root is a required argument and the loops are flags.
Reuses open3dsot_tpu.data.waymo_data.generate_waymo_data — the same function
WaymoDataset triggers lazily when `sot_infos_{cat}_{split}.pkl` is missing
(data/waymo_data.py:80-83).

Usage:
    python scripts/generate_waymo_sot.py ROOT
    python scripts/generate_waymo_sot.py ROOT --splits train --classes vehicle,cyclist
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open3dsot_tpu.data.waymo_data import generate_waymo_data


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", help="Waymo root containing "
                    "infos_{split}_01sweeps_filter_zero_gt.pkl")
    ap.add_argument("--splits", default="train,val",
                    help="comma-separated (default: train,val)")
    ap.add_argument("--classes", default="vehicle,pedestrian,cyclist",
                    help="comma-separated (default: vehicle,pedestrian,cyclist)")
    args = ap.parse_args(argv)

    splits = [s.strip().lower() for s in args.splits.split(",") if s.strip()]
    classes = [c.strip().lower() for c in args.classes.split(",") if c.strip()]
    for split in splits:
        infos = os.path.join(
            args.root, f"infos_{split}_01sweeps_filter_zero_gt.pkl")
        if not os.path.isfile(infos):
            ap.error(f"missing {infos}")
    for split in splits:
        for cla in classes:
            print(f"Generate {cla} class for {split} set", flush=True)
            t0 = time.time()
            generate_waymo_data(args.root, cla, split)
            out = os.path.join(args.root, f"sot_infos_{cla}_{split}.pkl")
            print(f"  wrote {out} ({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
