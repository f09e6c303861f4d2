"""Where does the M2-Track train step's time go? (run on the real TPU)

Same chained in-graph methodology as profile_bat.py (the remote tunnel makes
naive timing wrong in both directions — see that file's docstring). Stages:
the full train step, forward, fwd+grad, and the three network blocks
standalone (SegPointNet on the stacked 2-frame cloud, MiniPointNet embed,
second-stage MiniPointNet), plus SegPointNet's first per-point MLP alone —
its 1024-wide layer produces the largest activation (B*2N x 1024) and is
the prime HBM-traffic suspect.

Writes PROFILE_M2.md. Usage: python benchmarks/profile_m2.py [--batch 64]
[--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed, flops_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--bf16", action="store_true", default=False)
    cli = ap.parse_args()
    B, ITERS = cli.batch, cli.iters

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.models.layers import MLP
    from open3dsot_tpu.models.pointnet import MiniPointNet, SegPointNet
    from open3dsot_tpu.train.optim import make_optimizer
    from open3dsot_tpu.train.trainer import create_train_state, make_train_step

    cfg = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        point_sample_size=1024, bb_scale=1.25, bb_offset=2, degrees=False,
        box_aware=True, use_z=True, limit_box=False, IoU_space=3,
        motion_threshold=0.15, center_weight=2.0, angle_weight=10.0,
        seg_weight=0.1, bc_weight=1.0, motion_cls_seg_weight=0.1,
        lr=0.001, optimizer="Adam", lr_decay_step=20, lr_decay_rate=0.1,
        wd=0.0, gradient_clip_val=0.0, batch_size=B, seed=0,
        train_type="train_motion", bf16=cli.bf16,
    ))
    model = get_model("m2track")(cfg)
    dtype = jnp.bfloat16 if cli.bf16 else None
    N2 = 2 * cfg.point_sample_size  # stacked 2-frame cloud

    rng = np.random.default_rng(0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(size=x.shape).astype(x.dtype)
            if np.issubdtype(x.dtype, np.floating) else x),
        model.dummy_batch(B),
    )

    rows = []

    def add(name, seconds, flops=float("nan")):
        tflops = flops / seconds / 1e12 if np.isfinite(flops) else float("nan")
        rows.append((name, seconds * 1e3,
                     flops / 1e9 if np.isfinite(flops) else float("nan"), tflops))
        print(f"{name:48s} {seconds*1e3:9.3f} ms   {tflops:8.3f} TFLOP/s",
              flush=True)

    optimizer = make_optimizer(cfg, 100)
    state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(model, optimizer, mesh=None, donate=False)

    def steps_looped(state0, b):
        def body(s, _):
            s2, ld = step(s, b)
            return s2, ld["loss_total"]
        _, losses = jax.lax.scan(body, state0, None, length=ITERS)
        return losses[-1]

    g = jax.jit(steps_looped)
    float(g(state, batch))
    t0 = time.perf_counter()
    outs = [g(state, batch) for _ in range(3)]
    _ = [float(o) for o in outs]
    add("train step (fwd+bwd+opt)", (time.perf_counter() - t0) / (3 * ITERS),
        flops_of(step, state, batch))

    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))

    def fwd(v, b):
        return model.apply(v, b, train=True)

    t = chain_timed(fwd, (variables, batch), iters=ITERS)
    add("forward only (train mode)", t, flops_of(fwd, variables, batch))

    # ---- blocks standalone ------------------------------------------------
    x14 = jnp.asarray(rng.normal(size=(B, N2, 14)).astype(np.float32))

    seg = SegPointNet(per_point_mlp1=[64, 64, 64, 128, 1024],
                      per_point_mlp2=[512, 256, 128, 128], output_size=11,
                      dtype=dtype)
    seg_vars = seg.init(jax.random.PRNGKey(0), x14[:2], train=True)

    def seg_loss(v, x):
        out, _ = seg.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    t = chain_timed(jax.grad(seg_loss), (seg_vars, x14), iters=ITERS)
    add(f"SegPointNet fwd+bwd ({B},{N2},14)", t,
        flops_of(jax.grad(seg_loss), seg_vars, x14))

    mlp1 = MLP([64, 64, 64, 128, 1024], dtype=dtype)
    m1_vars = mlp1.init(jax.random.PRNGKey(0), x14[:2], train=True)

    def m1_loss(v, x):
        out, _ = mlp1.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    t = chain_timed(jax.grad(m1_loss), (m1_vars, x14), iters=ITERS)
    add(f"  seg per-point MLP1 fwd+bwd (..1024)", t,
        flops_of(jax.grad(m1_loss), m1_vars, x14))

    mini = MiniPointNet(per_point_mlp=[64, 128, 256, 512],
                        hidden_mlp=[512, 256], output_size=-1, dtype=dtype)
    mini_vars = mini.init(jax.random.PRNGKey(0), x14[:2], train=True)

    def mini_loss(v, x):
        out, _ = mini.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    t = chain_timed(jax.grad(mini_loss), (mini_vars, x14), iters=ITERS)
    add(f"MiniPointNet fwd+bwd ({B},{N2},14)", t,
        flops_of(jax.grad(mini_loss), mini_vars, x14))

    suffix = "_bf16" if cli.bf16 else ""
    out = [f"# M2-Track train-step profile (TPU, chained in-graph timing{', bf16' if cli.bf16 else ''})",
           "",
           f"device: {jax.devices()[0].device_kind}, batch: {B}, "
           f"2x{cfg.point_sample_size} pts, {ITERS} iterations per dispatch",
           "", "| stage | ms | GFLOP | TFLOP/s |", "|---|---|---|---|"]
    for name, ms, gf, tf2 in rows:
        out.append(f"| {name} | {ms:.3f} | {gf:.2f} | {tf2:.3f} |")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        f"PROFILE_M2{suffix}.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
