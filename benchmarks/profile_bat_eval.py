"""Where does the BAT eval scan step's time go? (run on the real TPU)

The batched matching-scan pipeline (tracking/scan_matching.py) measures
~flat throughput across 8/16/32 tracklets/dispatch (~5.4-5.7k frames/s,
scripts/bench_bat_scan_scaling.py) — compute-bound per frame. This breaks
the per-frame step into its stages (eval mode, fused SA kernels on) with
the same chained in-graph methodology as profile_bat.py, at the scan
shapes: template 512 / search 1024, batch 8.

Writes PROFILE_BAT_EVAL.md. Usage: python benchmarks/profile_bat_eval.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed, flops_of


def main():
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.geometry import rigid
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import init_variables

    B, M, N = 8, 512, 1024
    ITERS = 50
    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=M, search_size=N, point_sample_size=N,
        feature_channel=256, hidden_channel=256, out_channel=256,
        vote_channel=256, num_proposal=64, k=4, bc_channel=9,
        box_aware=True, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        fused_sa=True,
    ))
    model = get_model("bat")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    search = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 2)
    wlh = jnp.asarray(np.abs(rng.normal(size=(B, 3))).astype(np.float32) + 1)
    canonical = jnp.zeros((B, 4), jnp.float32)
    tbc = rigid.box_cloud(template, canonical, wlh)
    batch = {"template_points": template, "search_points": search,
             "points2cc_dist_t": tbc}

    rows = []

    def add(name, seconds, flops=float("nan")):
        ms = seconds * 1e3
        gf = flops / 1e9
        tf = flops / seconds / 1e12
        rows.append((name, ms, gf, tf))
        print(f"{name:48s} {ms:8.3f} ms  {gf:8.2f} GF  {tf:7.3f} TF/s",
              flush=True)

    # ---- full eval forward ------------------------------------------------
    def fwd(v, b):
        return model.apply(v, b, train=False)

    t = chain_timed(fwd, (variables, batch), iters=ITERS)
    add(f"BAT eval forward (B={B})", t, flops_of(fwd, variables, batch))

    # ---- sample build (crop + fixed-resample + boxcloud) ------------------
    from open3dsot_tpu.tracking.scan_tracker import _select_fixed

    raw_pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 3)
    raw_valid = jnp.asarray(rng.uniform(size=(B, N)) > 0.3)
    ref_box = jnp.concatenate(
        [rng.normal(size=(B, 3)).astype(np.float32),
         rng.uniform(-3, 3, size=(B, 1)).astype(np.float32)], axis=-1)
    ref_box = jnp.asarray(ref_box)

    def build(pts, valid, box, wlh):
        half = jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], axis=-1) * 0.625
        local = rigid.remove_transform_points(pts, box)
        inside = jnp.all((local < half[:, None]) & (local > -half[:, None]),
                         axis=-1)
        tpl = _select_fixed(local, inside & valid, M, mode="strided")
        s_half = half + 2.0
        inside_s = jnp.all(
            (local < s_half[:, None]) & (local > -s_half[:, None]), axis=-1)
        sr = _select_fixed(local, inside_s & valid, N, mode="strided")
        bc = rigid.box_cloud(tpl, jnp.zeros((B, 4), tpl.dtype), wlh)
        return tpl, sr, bc

    t = chain_timed(build, (raw_pts, raw_valid, ref_box, wlh), iters=ITERS)
    add("sample build (2x crop+resample+boxcloud)", t,
        flops_of(build, raw_pts, raw_valid, ref_box, wlh))

    # ---- backbone towers (eval, fused SA) ---------------------------------
    from open3dsot_tpu.models.pointnet import PointnetBackbone

    for name, n, x in (("search", N, search), ("template", M, template)):
        bb = PointnetBackbone(use_fps=True, normalize_xyz=False,
                              fused_eval=True)
        npts = [n // 2, n // 4, n // 8]
        bb_vars = bb.init(jax.random.PRNGKey(0), x[:2], npts, train=False)

        def bb_fwd(v, x, bb=bb, npts=npts):
            return bb.apply(v, x, npts, train=False)

        t = chain_timed(bb_fwd, (bb_vars, x), iters=ITERS)
        add(f"backbone eval fwd ({name} {n})", t, flops_of(bb_fwd, bb_vars, x))

    # ---- FPS standalone at layer-1 shape ----------------------------------
    from open3dsot_tpu.ops.fps_pallas import furthest_point_sample_pallas

    def fps_run(x):
        return furthest_point_sample_pallas(x, N // 2)

    t = chain_timed(fps_run, (search,), iters=ITERS)
    add(f"FPS pallas ({B},{N})->{N // 2}", t)

    # ---- xcorr (eval) ------------------------------------------------------
    from open3dsot_tpu.models.xcorr import BoxAwareXCorr

    xc = BoxAwareXCorr(hidden_channel=256, out_channel=256, k=4)
    tf_ = jnp.asarray(rng.normal(size=(B, M // 8, 256)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(B, N // 8, 256)).astype(np.float32))
    tx = jnp.asarray(rng.normal(size=(B, M // 8, 3)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(B, N // 8, 3)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(B, M // 8, 9)).astype(np.float32))
    sb = jnp.asarray(rng.normal(size=(B, N // 8, 9)).astype(np.float32))
    xc_vars = xc.init(jax.random.PRNGKey(0), tf_[:2], sf[:2], tx[:2], sx[:2],
                      tb[:2], sb[:2], train=False)

    def xc_fwd(v, *a):
        return xc.apply(v, *a, train=False)

    t = chain_timed(xc_fwd, (xc_vars, tf_, sf, tx, sx, tb, sb), iters=ITERS)
    add("xcorr eval fwd", t, flops_of(xc_fwd, xc_vars, tf_, sf, tx, sx, tb, sb))

    # ---- RPN (eval, fused vote SA) ----------------------------------------
    from open3dsot_tpu.models.rpn import P2BVoteNetRPN

    rpn = P2BVoteNetRPN(feature_channel=256, vote_channel=256,
                        num_proposal=64, fused_eval=True)
    fus = jnp.asarray(rng.normal(size=(B, N // 8, 256)).astype(np.float32))
    rpn_vars = rpn.init(jax.random.PRNGKey(0), sx[:2], fus[:2], train=False)

    def rpn_fwd(v, *a):
        return rpn.apply(v, *a, train=False)

    t = chain_timed(rpn_fwd, (rpn_vars, sx, fus), iters=ITERS)
    add("rpn eval fwd", t, flops_of(rpn_fwd, rpn_vars, sx, fus))

    out = ["# BAT eval scan-step profile (TPU, calibrated chained timing)", "",
           f"device: {jax.devices()[0].device_kind}, batch: {B}, "
           f"template {M} / search {N}, two-length chains ({ITERS}/{5 * ITERS} "
           "iterations) differenced to cancel the ~30 ms tunnel dispatch "
           "overhead, eval mode, fused SA kernels on", "",
           "| stage | ms | GFLOP | TFLOP/s |", "|---|---|---|---|"]
    for name, ms, gf, tf2 in rows:
        out.append(f"| {name} | {ms:.3f} | {gf:.2f} | {tf2:.3f} |")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "PROFILE_BAT_EVAL.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
