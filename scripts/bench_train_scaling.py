"""Fused-train batch scaling with TRUE TFLOP/s (run on the real TPU).

VERDICT r3 item 2: the 'flat-to-negative' fused-train scaling in NOTES.md
(bf16 BAT 2,189 -> 1,872 samples/s from B=16 -> 64) was measured BEFORE the
per-batch-element accumulator rework that removed the serialized
global-accumulator revisits — and the fused rows' TFLOP/s columns were
nonsense because XLA counts Pallas calls as zero. This sweep re-measures
the curves with the calibrated chain timer and adds the closed-form Pallas
dot counts (ops/flops.py), so samples/s AND true MFU are trustworthy.

Usage: python scripts/bench_train_scaling.py [--models bat,p2b,m2track]
       [--batches 16,32,64] [--out BENCH_TRAIN_SCALING.md]
"""
from __future__ import annotations

import argparse
import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BAT_BASE = dict(
    dataset="synthetic", net_model="bat", category_name="Car",
    search_bb_scale=1.25, search_bb_offset=2, model_bb_scale=1.25,
    model_bb_offset=0, template_size=512, search_size=1024, degrees=True,
    up_axis=[0, 0, 1], box_aware=True, use_fps=True, normalize_xyz=False,
    feature_channel=256, hidden_channel=256, out_channel=256,
    vote_channel=256, num_proposal=64, k=4, bc_channel=9,
    reference_BB="previous_result", shape_aggregation="firstandprevious",
    use_z=True, limit_box=False, IoU_space=3, train_type="train_siamese",
    objectiveness_weight=1.5, box_weight=0.2, seg_weight=0.2,
    vote_weight=1.0, bc_weight=1.0, lr=1e-3, optimizer="Adam",
    lr_decay_step=12, lr_decay_rate=0.2, wd=0.0, gradient_clip_val=0.0,
    syn_num_tracklets=4, syn_tracklet_len=32, seed=7, bf16=True,
)

M2_BASE = dict(
    dataset="synthetic", net_model="m2track", category_name="Car",
    bb_scale=1.25, bb_offset=2, point_sample_size=1024, degrees=False,
    up_axis=[0, 0, 1], box_aware=True, use_z=True, limit_box=False,
    IoU_space=3, motion_threshold=0.15, train_type="train_motion",
    center_weight=2.0, angle_weight=10.0, seg_weight=0.1, bc_weight=1.0,
    motion_cls_seg_weight=0.1, lr=1e-3, optimizer="Adam",
    lr_decay_step=20, lr_decay_rate=0.1, wd=0.0, gradient_clip_val=0.0,
    syn_num_tracklets=4, syn_tracklet_len=32, seed=7, bf16=True,
)


def measure(model_name: str, B: int, fused: bool):
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.ops.flops import lower_recording
    from open3dsot_tpu.train.optim import make_optimizer
    from open3dsot_tpu.train.trainer import create_train_state, make_train_step

    base = copy.deepcopy(M2_BASE if model_name == "m2track" else BAT_BASE)
    base["net_model"] = model_name
    if model_name == "p2b":
        base["box_aware"] = False
    base["batch_size"] = B
    base["fused_sa_train"] = fused and model_name != "m2track"
    cfg = make_config(base)
    model = get_model(model_name)(cfg)
    optimizer = make_optimizer(cfg, 100)
    state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(model, optimizer, mesh=None, donate=False)
    rng = np.random.default_rng(0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(size=x.shape).astype(x.dtype)
            if np.issubdtype(x.dtype, np.floating) else x),
        model.dummy_batch(B),
    )
    t = chain_timed(step, (state, batch), iters=30)
    # lower_recording, NOT step.lower: after chain_timed the trace cache is
    # warm and a plain lower() skips tracing, so the Pallas recorder counts
    # zero and the row silently reverts to the XLA-only FLOPs.
    lowered, rec = lower_recording(step, state, batch)
    fl = float(lowered.compile().cost_analysis()["flops"]) + rec["flops"]
    return t, B / t, fl / t / 1e12, fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="bat,p2b,m2track")
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_TRAIN_SCALING.md"))
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in dev.device_kind else None
    lines = [
        "# Fused-train batch scaling (true TFLOP/s)", "",
        f"device: {dev.device_kind}; bf16 mixed precision "
        "(params/BN stats f32); calibrated chain timing "
        "(benchmarks/profile_bat.py). TFLOP/s = (XLA cost analysis + "
        "closed-form Pallas dot counts, ops/flops.py) / step time; "
        "MFU vs 197 TFLOP/s bf16 peak.", "",
        "| model | SA kernels | batch | ms/step | samples/s | TFLOP/s | MFU |",
        "|---|---|---|---|---|---|---|",
    ]
    for model_name in args.models.split(","):
        model_name = {"m2": "m2track"}.get(model_name, model_name)
        fused_opts = [True, False] if model_name != "m2track" else [False]
        for fused in fused_opts:
            # unfused rows are context, not the scaling question: B=16 only
            bs = batches if (fused or model_name == "m2track") else [16]
            for B in bs:
                t, sps, tfs, fl = measure(model_name, B, fused)
                mfu = f"{tfs * 1e12 / peak * 100:.1f}%" if peak else "-"
                tag = ("fused (ops/sa_fused_train.py)" if fused
                       else ("n/a (no SA)" if model_name == "m2track"
                             else "unfused"))
                row = (f"| {model_name} | {tag} | {B} | {t * 1e3:.1f} | "
                       f"{sps:.0f} | {tfs:.1f} | {mfu} |")
                print(row, flush=True)
                lines.append(row)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
