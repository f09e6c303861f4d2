"""Convert a --save_results JSONL file into viewable box meshes.

For each requested tracklet, writes the predicted trajectory as per-frame PLY
cylinder-edge box meshes (utils/visualization.write_bbox — the counterpart
of the reference's debug writers, /root/reference/datasets/utils.py:79-206),
color-coded by per-frame IoU (green >= 0.7, yellow >= 0.3, red below), plus
a PLY polyline of the predicted centers.

Usage:
    python scripts/results_to_meshes.py results.jsonl out_dir [--tracklets 0,3]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def box_corners(rec_box: np.ndarray) -> np.ndarray:
    """(15,) record box (cx cy cz w l h r00..r22) -> (8, 3) corners, the
    same corner convention as geometry.data_classes.Box.corners().T."""
    center, wlh, R = rec_box[:3], rec_box[3:6], rec_box[6:].reshape(3, 3)
    w, l, h = wlh
    # x along length, y along width, z up (data_classes.py corners order)
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    return (R @ np.stack([x, y, z])).T + center


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", help="JSONL from --save_results")
    ap.add_argument("out_dir")
    ap.add_argument("--tracklets", type=str, default=None,
                    help="comma-separated record indices (default: all)")
    args = ap.parse_args()

    from open3dsot_tpu.tracking.results import read_results
    from open3dsot_tpu.utils.visualization import write_bbox, write_ply

    header, records = read_results(args.results)
    os.makedirs(args.out_dir, exist_ok=True)
    wanted = (None if args.tracklets is None
              else {int(t) for t in args.tracklets.split(",")})
    n_files = 0
    for rec in records:
        tid = rec["tracklet"]
        if wanted is not None and tid not in wanted:
            continue
        boxes = np.asarray(rec["boxes"], np.float64)
        ious = rec["ious"]
        base = os.path.join(args.out_dir, f"tracklet_{tid:04d}")
        for t, (b, iou) in enumerate(zip(boxes, ious)):
            color = 2 if iou >= 0.7 else (1 if iou >= 0.3 else 0)
            write_bbox(box_corners(b), color, f"{base}_f{t:03d}.ply")
            n_files += 1
        write_ply(boxes[:, :3].astype(np.float32), f"{base}_centers.ply")
        n_files += 1
    print(f"wrote {n_files} mesh files for "
          f"{len(records) if wanted is None else len(wanted)} tracklet(s) "
          f"({header['net_model']}/{header['category_name']}) "
          f"to {args.out_dir}")


if __name__ == "__main__":
    main()
