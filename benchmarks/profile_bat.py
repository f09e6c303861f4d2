"""Where does the BAT train step's time go? (run on the real TPU)

Round-1 verdict #3: BAT trained at ~100 ms/step @ batch 16 with no analysis.

Measurement methodology (the remote-TPU tunnel adds ~30 ms per dispatch and
caps D2H at ~30 MB/s, so naive per-call timing with output fetches measures
the tunnel, not the chip):
- every stage runs K iterations inside ONE `lax.scan` dispatch, with a real
  (but numerically negligible, *1e-30) data dependency between iterations so
  XLA cannot hoist the body out of the loop;
- only a f32 scalar crosses the tunnel; timing divides by K (K defaults
  to 100 so the ~30 ms tunnel dispatch latency adds <0.5 ms per sample);
- the whole-train-step loop threads the real TrainState through the scan —
  the actual steady-state training recurrence.

Writes PROFILE_BAT.md. Usage: python benchmarks/profile_bat.py [--batch 16]
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


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def chain_timed(f, args, iters=20, repeats=3, calibrate=True):
    """Seconds per call of f(*args), amortized over `iters` in-graph loops.

    With calibrate=True (default), the per-dispatch fixed overhead — ~30 ms
    of tunnel latency on this remote-TPU setup, measured by
    scripts/probe_chain_overhead.py — is cancelled exactly by timing the
    same chain at two scan lengths K and 5K and differencing:
    t_dispatch(K) = overhead + K*work, so
    work = (T(5K) - T(K)) / (4K). Without calibration a K=50 chain
    overstates every stage by ~0.6 ms (which once made 5 stage timings sum
    to 2.4x the full forward they compose into). Costs a second compile.
    """

    def make(K):
        def looped(*xs):
            def body(acc, _):
                # Data-depend every numeric input on the carry so XLA cannot
                # hoist a loop-invariant f out of the scan (it did: an
                # all-int8 dot measured 0.000 ms before ints were perturbed).
                # acc*1e-30 underflows to exactly 0.0 (and casts to int 0),
                # so the math is unchanged at runtime.
                perturbed = jax.tree_util.tree_map(
                    lambda a: a + (acc * 1e-30).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.number)
                    else a,
                    xs,
                )
                out = f(*perturbed)
                return acc + _scalarize(out) * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return acc

        return jax.jit(looped)

    def timed(g):
        float(g(*args))  # compile + warm
        t0 = time.perf_counter()
        outs = [g(*args) for _ in range(repeats)]
        _ = [float(o) for o in outs]
        return (time.perf_counter() - t0) / repeats

    if not calibrate:
        return timed(make(iters)) / iters
    k1, k2 = iters, 5 * iters
    t1, t2 = timed(make(k1)), timed(make(k2))
    return max((t2 - t1) / (k2 - k1), 0.0)


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        return float(c.cost_analysis()["flops"])
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--bf16", action="store_true", default=False)
    args_cli = ap.parse_args()
    B = args_cli.batch
    ITERS = args_cli.iters

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.models.pointnet import PointnetBackbone
    from open3dsot_tpu.models.rpn import P2BVoteNetRPN
    from open3dsot_tpu.models.xcorr import BoxAwareXCorr
    from open3dsot_tpu.ops import ball_query, furthest_point_sample, group_points
    from open3dsot_tpu.train.optim import make_optimizer
    from open3dsot_tpu.train.trainer import (
        create_train_state,
        init_variables,
        make_train_step,
    )

    cfg = make_config(
        dict(
            dataset="synthetic", net_model="bat", category_name="Car",
            template_size=512, search_size=1024, point_sample_size=512,
            feature_channel=256, hidden_channel=256, out_channel=256,
            vote_channel=256, num_proposal=64, k=4, bc_channel=9,
            use_fps=True, normalize_xyz=False, degrees=True, use_z=False,
            limit_box=True, IoU_space=3, bb_scale=1.0, bb_offset=2,
            objectiveness_weight=1.5, box_weight=0.2, seg_weight=0.2,
            vote_weight=1.0, bc_weight=1.0,
            lr=0.001, optimizer="Adam", lr_decay_step=12, lr_decay_rate=0.2,
            wd=0.0, gradient_clip_val=0.0, batch_size=B, seed=0,
            bf16=args_cli.bf16,
        )
    )
    model = get_model("bat")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), batch_size=2)
    optimizer = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, jax.random.PRNGKey(0), optimizer)

    rng = np.random.default_rng(0)
    M, N = cfg.template_size, cfg.search_size
    batch = {
        "template_points": rng.normal(size=(B, M, 3)).astype(np.float32) * 2,
        "search_points": rng.normal(size=(B, N, 3)).astype(np.float32) * 2,
        "points2cc_dist_t": np.abs(rng.normal(size=(B, M, 9))).astype(np.float32),
        "points2cc_dist_s": np.abs(rng.normal(size=(B, N, 9))).astype(np.float32),
        "box_label": rng.normal(size=(B, 4)).astype(np.float32),
        "seg_label": (rng.uniform(size=(B, N)) > 0.5).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    rows = []

    def add(name, seconds, flops=float("nan")):
        tflops = flops / seconds / 1e12 if np.isfinite(flops) else float("nan")
        rows.append((name, seconds * 1e3,
                     flops / 1e9 if np.isfinite(flops) else float("nan"), tflops))
        print(f"{name:48s} {seconds*1e3:9.3f} ms   {tflops:8.3f} TFLOP/s", flush=True)

    # ---- full train step (threads the real state through the scan) --------
    step = make_train_step(model, optimizer, mesh=None, donate=False)

    def steps_looped(state0, b):
        def body(s, _):
            s2, ld = step(s, b)
            return s2, ld["loss_total"]

        s_final, losses = jax.lax.scan(body, state0, None, length=ITERS)
        return losses[-1]

    g = jax.jit(steps_looped)
    float(g(state, jb))
    t0 = time.perf_counter()
    outs = [g(state, jb) for _ in range(3)]
    _ = [float(o) for o in outs]
    t = (time.perf_counter() - t0) / (3 * ITERS)
    fl = float("nan")
    try:
        fl = float(step.lower(state, jb).compile().cost_analysis()["flops"])
    except Exception:
        pass
    add("train step (fwd+bwd+opt)", t, fl)

    # ---- forward only (train mode) -----------------------------------------
    def fwd(v, b):
        return model.apply(v, b, train=True)

    t = chain_timed(fwd, (variables, jb), iters=ITERS)
    add("forward only (train mode)", t, flops_of(fwd, variables, jb))

    # ---- fwd+loss+grad (no optimizer) ---------------------------------------
    def loss_fn(params, bstats, b):
        out, _ = model.net.apply(
            {"params": params, "batch_stats": bstats},
            b["template_points"], b["search_points"], b["points2cc_dist_t"],
            train=True, mutable=["batch_stats"],
        )
        return model.loss(cfg, b, out)["loss_total"]

    gradf = jax.grad(loss_fn)
    t = chain_timed(gradf, (variables["params"], variables["batch_stats"], jb),
                    iters=ITERS)
    add("fwd+loss+grad", t, flops_of(gradf, variables["params"],
                                     variables["batch_stats"], jb))

    # ---- FPS kernel at both tower shapes -------------------------------------
    for (n, s) in [(N, N // 2), (M, M // 2)]:
        xyz = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32))
        t = chain_timed(lambda x, s=s: furthest_point_sample(x, s), (xyz,), iters=ITERS)
        add(f"fps ({B},{n})->{s}", t)

    # ---- ball query at each SA layer shape ------------------------------------
    for (n, s, r) in [(N, N // 2, 0.3), (N // 2, N // 4, 0.5), (N // 4, N // 8, 0.7)]:
        xyz = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32) * 2)
        ctr = xyz[:, :s]
        t = chain_timed(lambda x, c, r=r: ball_query(r, 32, x, c), (xyz, ctr), iters=ITERS)
        add(f"ball_query ({B},{n})x{s} r={r}", t)

    # ---- group_points at layer-1 shape -----------------------------------------
    feats = jnp.asarray(rng.normal(size=(B, N, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, N // 2, 32)).astype(np.int32))
    t = chain_timed(group_points, (feats, idx), iters=ITERS)
    add(f"group_points ({B},{N},128) k=32", t)

    # ---- group_points backward (scatter-add VJP) --------------------------------
    gp_bwd = jax.grad(lambda f, i: jnp.sum(group_points(f, i) ** 2))
    t = chain_timed(gp_bwd, (feats, idx), iters=ITERS)
    add(f"group_points bwd ({B},{N},128) k=32", t)

    # ---- per-SA-layer fwd / fwd+bwd at the search-tower shapes ------------------
    # separates neighborhood machinery (fps/ball-query/gather/scatter) from the
    # grid MLP: "SA{i}" rows run the full layer, "gridMLP{i}" rows run the same
    # SharedMLP on a pre-gathered (B,S,K,C+3) grid (matmul+BN+relu+max only)
    from open3dsot_tpu.models.pointnet import SetAbstraction
    from open3dsot_tpu.models.layers import MLP as SharedMLP

    sa_shapes = [
        (N, N // 2, 0.3, 0, [64, 64, 128], True),
        (N // 2, N // 4, 0.5, 128, [128, 128, 256], False),
        (N // 4, N // 8, 0.7, 256, [256, 256, 256], False),
    ]
    for li, (n, s, r, c, mlp_ch, fps) in enumerate(sa_shapes):
        xyz = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32) * 2)
        fin = (jnp.asarray(rng.normal(size=(B, n, c)).astype(np.float32))
               if c else None)
        sa = SetAbstraction(mlp=mlp_ch, radius=r, nsample=32, use_fps=fps)
        sa_vars = sa.init(jax.random.PRNGKey(0), xyz[:2],
                          None if fin is None else fin[:2], s, train=True)

        def sa_fwd(v, x, f, sa=sa, s=s):
            return sa.apply(v, x, f, s, train=True, mutable=["batch_stats"])

        args_sa = (sa_vars, xyz, fin)
        t = chain_timed(sa_fwd, args_sa, iters=ITERS)
        add(f"SA{li} fwd ({B},{n},{c})->{s}", t, flops_of(sa_fwd, *args_sa))

        def sa_loss(v, x, f, sa=sa, s=s):
            out, _ = sa.apply(v, x, f, s, train=True, mutable=["batch_stats"])
            return jnp.sum(out[1] ** 2)

        # grad wrt params (+ incoming features when present) only — in the
        # real step positions feed the non-differentiable FPS/ball-query
        # index path and receive no cotangent
        gsa = (jax.grad(sa_loss, argnums=0)
               if fin is None else jax.grad(sa_loss, argnums=(0, 2)))
        t = chain_timed(gsa, args_sa, iters=ITERS)
        add(f"SA{li} fwd+bwd ({B},{n},{c})->{s}", t, flops_of(gsa, *args_sa))

        grid = jnp.asarray(
            rng.normal(size=(B, s, 32, c + 3)).astype(np.float32))
        gm = SharedMLP(mlp_ch)
        gm_vars = gm.init(jax.random.PRNGKey(0), grid[:2], train=True)

        def gm_loss(v, g, gm=gm):
            out, _ = gm.apply(v, g, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.max(out, axis=2) ** 2)

        ggm = jax.grad(gm_loss, argnums=(0, 1))
        t = chain_timed(ggm, (gm_vars, grid), iters=ITERS)
        add(f"gridMLP{li} fwd+bwd ({B},{s},32,{c + 3})", t,
            flops_of(ggm, gm_vars, grid))

    # ---- backbone standalone (search tower) -------------------------------------
    bb = PointnetBackbone(use_fps=True, normalize_xyz=False)
    bb_vars = bb.init(jax.random.PRNGKey(0), jb["search_points"][:2],
                      [N // 2, N // 4, N // 8], train=True)

    def bb_fwd(v, x):
        return bb.apply(v, x, [N // 2, N // 4, N // 8], train=True,
                        mutable=["batch_stats"])

    t = chain_timed(bb_fwd, (bb_vars, jb["search_points"]), iters=ITERS)
    add(f"backbone fwd (search {N})", t, flops_of(bb_fwd, bb_vars, jb["search_points"]))

    def bb_loss(v, x):
        out, _ = bb.apply(v, x, [N // 2, N // 4, N // 8], train=True,
                          mutable=["batch_stats"])
        return jnp.sum(out[1] ** 2)

    gbb = jax.grad(bb_loss)
    t = chain_timed(gbb, (bb_vars, jb["search_points"]), iters=ITERS)
    add(f"backbone fwd+bwd (search {N})", t, flops_of(gbb, bb_vars, jb["search_points"]))

    # ---- xcorr standalone ----------------------------------------------------------
    xc = BoxAwareXCorr(hidden_channel=256, out_channel=256, k=4)
    tf_ = jnp.asarray(rng.normal(size=(B, M // 8, 256)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(B, N // 8, 256)).astype(np.float32))
    tx = jnp.asarray(rng.normal(size=(B, M // 8, 3)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(B, N // 8, 3)).astype(np.float32))
    tbc = jnp.asarray(rng.normal(size=(B, M // 8, 9)).astype(np.float32))
    sbc = jnp.asarray(rng.normal(size=(B, N // 8, 9)).astype(np.float32))
    xc_vars = xc.init(jax.random.PRNGKey(0), tf_[:2], sf[:2], tx[:2], sx[:2],
                      tbc[:2], sbc[:2], train=True)

    def xc_fwd(v, *a):
        return xc.apply(v, *a, train=True, mutable=["batch_stats"])

    t = chain_timed(xc_fwd, (xc_vars, tf_, sf, tx, sx, tbc, sbc), iters=ITERS)
    add("xcorr fwd", t, flops_of(xc_fwd, xc_vars, tf_, sf, tx, sx, tbc, sbc))

    # ---- RPN standalone --------------------------------------------------------------
    rpn = P2BVoteNetRPN(feature_channel=256, vote_channel=256, num_proposal=64)
    fus = jnp.asarray(rng.normal(size=(B, N // 8, 256)).astype(np.float32))
    rpn_vars = rpn.init(jax.random.PRNGKey(0), sx[:2], fus[:2], train=True)

    def rpn_fwd(v, *a):
        return rpn.apply(v, *a, train=True, mutable=["batch_stats"])

    t = chain_timed(rpn_fwd, (rpn_vars, sx, fus), iters=ITERS)
    add("rpn fwd", t, flops_of(rpn_fwd, rpn_vars, sx, fus))

    # ---- write report ------------------------------------------------------------------
    out = [f"# BAT train-step profile (TPU, chained in-graph timing{', bf16' if args_cli.bf16 else ''})", "",
           f"device: {jax.devices()[0].device_kind}, batch: {B}, "
           f"template {M} / search {N}, {ITERS} iterations per dispatch", "",
           "| stage | ms | GFLOP | TFLOP/s |", "|---|---|---|---|"]
    for name, ms, gf, tf2 in rows:
        out.append(f"| {name} | {ms:.3f} | {gf:.2f} | {tf2:.3f} |")
    suffix = "_bf16" if args_cli.bf16 else ""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", f"PROFILE_BAT{suffix}.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
