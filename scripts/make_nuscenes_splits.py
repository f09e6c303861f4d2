"""Vendor the full nuScenes v1.0 scene-split constants in-tree.

The split lists (train 700 / val 150 / test 150 / train_detect 350 /
train_track 350 scene names) are fixed published constants defined in
nuscenes-devkit `nuscenes/utils/splits.py` (the reference consumes them at
/root/reference/datasets/nuscenes_data.py:82). This script extracts them
once — from an importable devkit, or from a devkit source tree on disk
without installing it — and writes
open3dsot_tpu/data/nuscenes_splits_full.json, after which
open3dsot_tpu.data.nuscenes_splits serves every split with no devkit.

Usage:
    python scripts/make_nuscenes_splits.py                # importable devkit
    python scripts/make_nuscenes_splits.py --devkit /path/to/nuscenes-devkit
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "open3dsot_tpu", "data", "nuscenes_splits_full.json",
)
SPLIT_NAMES = ["train", "val", "test", "train_detect", "train_track",
               "mini_train", "mini_val"]


def _load_splits_module(devkit_path: str | None):
    if devkit_path is None:
        from nuscenes.utils import splits  # type: ignore

        return splits
    # load splits.py straight from a source tree, no install needed
    candidates = [
        os.path.join(devkit_path, "python-sdk", "nuscenes", "utils", "splits.py"),
        os.path.join(devkit_path, "nuscenes", "utils", "splits.py"),
        os.path.join(devkit_path, "utils", "splits.py"),
        devkit_path if devkit_path.endswith(".py") else None,
    ]
    for cand in candidates:
        if cand and os.path.isfile(cand):
            spec = importlib.util.spec_from_file_location("_nusc_splits", cand)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)  # type: ignore[union-attr]
            return mod
    raise FileNotFoundError(
        f"could not find nuscenes/utils/splits.py under {devkit_path!r}"
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devkit", default=None,
                    help="path to a nuscenes-devkit checkout or splits.py "
                         "(default: import the installed devkit)")
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--force", action="store_true",
                    help="write even if the extracted lists fail the v1.0 "
                         "structural checks (sizes/disjointness)")
    args = ap.parse_args()

    mod = _load_splits_module(args.devkit)
    if hasattr(mod, "create_splits_scenes"):
        table = mod.create_splits_scenes()
    else:  # raw module constants
        table = {name: getattr(mod, name) for name in SPLIT_NAMES
                 if hasattr(mod, name)}
    out = {name: list(table[name]) for name in SPLIT_NAMES if name in table}

    # same structural validation the loader applies at resolution time
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from open3dsot_tpu.data.nuscenes_splits import _validate_full

    try:
        _validate_full(out, args.devkit or "installed devkit")
    except ValueError as e:
        if not args.force:
            raise SystemExit(f"refusing to write: {e} (use --force to override)")
        print(f"WARNING (--force): {e}")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=0)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}={len(v)}" for k, v in out.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
