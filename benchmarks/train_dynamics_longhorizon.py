"""Long-horizon training dynamics vs the LIVE reference (VERDICT r4 #4).

DRIFT.md's M2 convergence trace oscillates hard (ep25 S=67.4 -> ep50 45.4 ->
ep250 69.6 -> ep300 45.6) and the round-4 judge asked whether that is a
late-epoch LR/BN-schedule mismatch or benign val variance. The schedule
surfaces are now pinned exactly (tests/test_optim.py::
test_300_epochs_match_live_torch_steplr; BN momentum is constant in both —
the reference never wires its BNMomentumScheduler into any tracker,
models/*.py have no bnm callback). This benchmark answers the DYNAMICS
question empirically: train the LIVE torch reference M2TRACK
(/root/reference/models/m2track.py) and our model side-by-side from
IDENTICAL imported initial weights on IDENTICAL per-epoch batches (built
once by our live-parity-transcribed host sampler, fed to both), at a
CPU-feasible scale (point_sample_size=128, batch 8, 16x8-frame synthetic
tracklets), across several LR decay boundaries (lr_decay_step=15 over 50
epochs), with periodic in-training validation through each side's own host
tracker. Writes TRAIN_DYNAMICS.md: per-epoch loss for both, periodic val
Success/Precision for both, and the envelope comparison — if the torch
reference's val trajectory swings with the same magnitude, the DRIFT.md
oscillation is task/val variance, not a port bug.

Run on CPU (the torch side is CPU-only anyway):
    python benchmarks/train_dynamics_longhorizon.py [--epochs 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_MD = os.path.join(REPO, "TRAIN_DYNAMICS.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--val-every", type=int, default=5)
    ap.add_argument("--tracklets", type=int, default=16)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample-size", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from tests._reference_live import load_reference

    REF = load_reference()
    assert REF is not None, "reference repo unavailable"

    from flax.core import FrozenDict
    import jax.numpy as jnp

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.data.loader import BatchLoader
    from open3dsot_tpu.geometry.data_classes import Box as OurBox  # noqa: F401
    from open3dsot_tpu.import_torch import import_checkpoint
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.eval import Tracker
    from open3dsot_tpu.train.optim import make_optimizer
    from open3dsot_tpu.train.trainer import TrainState, make_train_step
    from open3dsot_tpu.utils.metrics import Precision, Success

    with open(os.path.join(REPO, "cfgs", "M2_track_kitti.yaml")) as f:
        cfg_dict = yaml.safe_load(f)
    cfg_dict.update(
        dataset="synthetic",
        syn_num_tracklets=args.tracklets,
        syn_tracklet_len=args.frames,
        category_name="Car",
        point_sample_size=args.sample_size,
        batch_size=args.batch,
        epoch=args.epochs,
        lr_decay_step=15,  # several decay boundaries inside the run
        lr_decay_rate=0.1,
        workers=0,
        seed=7,
    )
    our_cfg = make_config(cfg_dict)

    torch.manual_seed(11)
    ref_model = REF["m2track"].M2TRACK(REF["EasyDict"](cfg_dict))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = get_model("m2track")(our_cfg)
    variables = import_checkpoint(sd, our_cfg, model=model)

    train_sampler = get_dataset(our_cfg, our_cfg.train_type, "train")
    val_sampler = get_dataset(our_cfg, "test", "test")
    loader = BatchLoader(train_sampler, args.batch, shuffle=True,
                         drop_last=True, seed=7)

    # --- torch side -------------------------------------------------------
    opt_cfg = ref_model.configure_optimizers()
    t_opt, t_sched = opt_cfg["optimizer"], opt_cfg["lr_scheduler"]

    # --- our side ---------------------------------------------------------
    steps_per_epoch = len(train_sampler) // args.batch
    optimizer = make_optimizer(our_cfg, steps_per_epoch=steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=optimizer.init(variables["params"]),
    )
    step_fn = make_train_step(model, optimizer, mesh=None, donate=False)

    def ref_sequences():
        out = []
        for i in range(len(val_sampler)):
            seq = val_sampler[i]
            rseq = []
            for fr in seq:
                b = fr["3d_bbox"]
                rseq.append({
                    "pc": REF["data_classes"].PointCloud(fr["pc"].points.copy()),
                    "3d_bbox": REF["data_classes"].Box(
                        np.asarray(b.center).tolist(),
                        np.asarray(b.wlh).tolist(), b.orientation),
                })
            out.append(rseq)
        return out

    ref_val_seqs = ref_sequences()

    def validate():
        # ours (host fidelity tracker)
        s, p = Success(), Precision()
        vars_now = {"params": state.params, "batch_stats": state.batch_stats}
        tracker = Tracker(model, vars_now)
        for i in range(len(val_sampler)):
            ious, dists, _ = tracker.evaluate_one_sequence(val_sampler[i], our_cfg)
            s.update(ious), p.update(dists)
        ours = (s.compute(), p.compute())
        # reference (its own evaluate_one_sequence)
        s, p = Success(), Precision()
        ref_model.eval()
        with torch.no_grad():
            for rseq in ref_val_seqs:
                ious, dists, _ = ref_model.evaluate_one_sequence(rseq)
                s.update(ious), p.update(dists)
        ref_model.train()
        return ours, (s.compute(), p.compute())

    rows = []
    t0 = time.time()
    ref_model.train()
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        batches = [dict(b) for b in loader]
        r_losses, o_losses = [], []
        for batch in batches:
            tb = {}
            for k, v in batch.items():
                a = np.asarray(v)
                if np.issubdtype(a.dtype, np.integer):
                    a = a.astype(np.int64)  # torch loss targets want Long
                tb[k] = torch.from_numpy(a)
            loss = ref_model.training_step(tb, 0)
            t_opt.zero_grad()
            loss.backward()
            t_opt.step()
            r_losses.append(float(loss.detach()))
            state, loss_dict = step_fn(state, batch)
            o_losses.append(float(loss_dict["loss_total"]))
        t_sched.step()
        row = dict(epoch=epoch + 1,
                   ref_loss=float(np.mean(r_losses)),
                   our_loss=float(np.mean(o_losses)))
        if (epoch + 1) % args.val_every == 0 or epoch + 1 == args.epochs:
            (os_, op), (rs, rp) = validate()
            row.update(our_S=os_, our_P=op, ref_S=rs, ref_P=rp)
            print(f"ep{epoch+1}: loss ref {row['ref_loss']:.4f} ours "
                  f"{row['our_loss']:.4f} | val ref S {rs:.1f}/P {rp:.1f} "
                  f"ours S {os_:.1f}/P {op:.1f} ({time.time()-t0:.0f}s)",
                  flush=True)
        else:
            print(f"ep{epoch+1}: loss ref {row['ref_loss']:.4f} ours "
                  f"{row['our_loss']:.4f}", flush=True)
        rows.append(row)

    # --- write TRAIN_DYNAMICS.md ------------------------------------------
    val_rows = [r for r in rows if "ref_S" in r]
    ref_swing = max(r["ref_S"] for r in val_rows) - min(r["ref_S"] for r in val_rows)
    our_swing = max(r["our_S"] for r in val_rows) - min(r["our_S"] for r in val_rows)
    lines = [
        "# Long-horizon training dynamics: live torch reference vs ours",
        "",
        f"M2-Track, identical imported init weights, identical per-epoch "
        f"batches (built once by the transcribed host sampler, fed to both "
        f"sides), {args.epochs} epochs x {len(rows[0]) and steps_per_epoch} "
        f"steps, batch {args.batch}, point_sample_size {args.sample_size}, "
        f"synthetic {args.tracklets}x{args.frames}; lr_decay_step=15 "
        f"(boundaries at ep15/30/45), CPU f32 both sides. Validation: each "
        f"side's own host tracker over the {len(val_sampler)}-tracklet test "
        "split (VERDICT r4 #4; generated by "
        "benchmarks/train_dynamics_longhorizon.py).",
        "",
        "| epoch | ref loss | our loss | ref S | ref P | our S | our P |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        v = ("| {ref_S:.1f} | {ref_P:.1f} | {our_S:.1f} | {our_P:.1f} |"
             .format(**r) if "ref_S" in r else "| | | | |")
        lines.append(f"| {r['epoch']} | {r['ref_loss']:.4f} | "
                     f"{r['our_loss']:.4f} " + v)
    lines += [
        "",
        f"Val-Success swing (max-min over val points): reference "
        f"{ref_swing:.1f}, ours {our_swing:.1f}. Schedule surfaces are "
        "pinned exactly elsewhere (LR: tests/test_optim.py 300-epoch live "
        "StepLR comparison; BN momentum: constant in both, the reference "
        "never wires BNMomentumScheduler into any tracker).",
        "",
    ]
    with open(OUT_MD, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    main()
