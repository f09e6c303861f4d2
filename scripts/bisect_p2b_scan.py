"""Frame-level host-vs-scan bisection for the P2B drift (VERDICT r4 #1b).

DRIFT.md measured the P2B family (camera + use_z=False + limit_box=True,
cfgs/P2B_Car.yaml) at +5.83 S / +8.42 P scan-over-host. The scan path
deliberately substitutes two stochastic host surfaces with deterministic/
jax-PRNG equivalents (resampling, limit_box re-draw) — so trajectories can
never be compared directly. This script CLOSES that gap: it monkeypatches
the HOST tracker's two stochastic surfaces with the exact deterministic
choices the scan path makes:

  * points_utils.regularize_pc  -> the scan's 'strided' selection
    (floor(k*N/n) downsample / k%N cyclic upsample — scan_tracker
    _select_fixed semantics, including repeating 1-2 point crops instead
    of the reference's zeros-for-N<=2 quirk), and
  * getOffsetBB's limit_box np.random.uniform(-1, 1) re-draw -> 0.0
    (the scan's limit_box_redraw='zero' emulation).

With both patched, host and scan compute THE SAME tracker by construction:
any per-frame trajectory divergence beyond forward-noise chaos is a
behavioral bug, and the first divergent frame names the mechanism. The
script reports, per tracklet, the first frame where the carried boxes
disagree (center/theta), and whether the frame's model INPUTS (template /
search point sets) already differed — inputs differing means a crop/select
bug; identical inputs with diverging outputs means fp-noise argmax chaos.

Run on CPU (weights optional): JAX_PLATFORMS=cpu python scripts/bisect_p2b_scan.py
With the drift checkpoint:     ... --ckpt /tmp/drift_run_p2b/ckpt_best
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def strided_regularize(points, sample_size, seed=None):
    """Host twin of scan_tracker._select_fixed(mode='strided') (also
    replicates the scan's N<=2 handling: real points repeated, zeros only
    for an empty crop — the reference zeroes N<=2 crops entirely)."""
    N = points.shape[0]
    if N == 0:
        return np.zeros((sample_size, 3), dtype="float32"), None
    if N >= sample_size:
        idx = (np.arange(sample_size) * N) // sample_size
    else:
        idx = np.arange(sample_size) % N
    return points[idx, :], idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (e.g. /tmp/drift_run_p2b/ckpt_best); "
                         "random init if omitted")
    ap.add_argument("--tracklets", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--zup", action="store_true",
                    help="ablate camera mode: run the whole comparison z-up")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the axon TPU backend (default: force CPU — "
                         "the axon sitecustomize pins jax_platforms to "
                         "'axon,cpu' at import, so env vars alone can't)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.geometry import points_utils, rigid
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.eval import Tracker
    from open3dsot_tpu.tracking.scan_matching import MatchScanTracker

    with open(os.path.join(REPO, "cfgs", "P2B_Car.yaml")) as f:
        base = yaml.safe_load(f)
    base.update(
        dataset="synthetic", syn_num_tracklets=args.tracklets,
        syn_tracklet_len=args.frames, workers=0,
        scan_resample="strided", limit_box_redraw="zero",
    )
    if args.zup:
        base.update(coordinate_mode="velodyne", up_axis=[0, 0, 1])
    cfg = make_config(base)

    model = get_model(cfg.net_model)(cfg)
    if args.ckpt:
        from open3dsot_tpu.train.trainer import Trainer

        restored = Trainer.load_checkpoint(args.ckpt)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        print(f"weights: {args.ckpt}")
    else:
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(1))
        print("weights: random init")

    sampler = get_dataset(cfg, "test", "test")
    sequences = [sampler[i] for i in range(len(sampler))]

    # --- patch the host stochastic surfaces to the scan's choices ---------
    orig_reg = points_utils.regularize_pc
    orig_uniform = np.random.uniform
    points_utils.regularize_pc = strided_regularize
    np.random.uniform = lambda *a, **k: 0.0  # limit_box re-draw -> 'zero'
    try:
        host_tracker = Tracker(model, variables)
        host_trajs = []
        with jax.default_matmul_precision("highest"):
            for seq in sequences:
                _, _, bbs = host_tracker.evaluate_one_sequence(seq, cfg)
                host_trajs.append(bbs)
    finally:
        points_utils.regularize_pc = orig_reg
        np.random.uniform = orig_uniform

    # --- scan path, same determinism --------------------------------------
    with jax.default_matmul_precision("highest"):
        scan = MatchScanTracker(model, variables, cfg, max_points=1024)
        scan_boxes = scan.track_batch(sequences)  # list of (T-1, 4)

    A = rigid.up_frame(cfg.up_axis)
    A_np = None if A is None else np.asarray(A)

    n_div = 0
    for b, (seq, host_bbs, sboxes) in enumerate(
            zip(sequences, host_trajs, scan_boxes)):
        first_div = None
        for t in range(1, len(seq)):
            hb = host_bbs[t]
            hparams = np.append(
                hb.center, rigid.theta_from_rotation(hb.rotation_matrix, A_np))
            sparams = np.asarray(sboxes[t - 1], np.float64)
            d = np.abs(hparams - sparams)
            d[3] = abs((hparams[3] - sparams[3] + np.pi) % (2 * np.pi) - np.pi)
            if d.max() > args.tol:
                first_div = (t, d)
                break
        if first_div is None:
            print(f"tracklet {b}: EQUAL over {len(seq)} frames "
                  f"(max tol {args.tol})")
            continue
        n_div += 1
        t, d = first_div
        print(f"tracklet {b}: FIRST DIVERGENCE at frame {t}: "
              f"|dc|=({d[0]:.4f},{d[1]:.4f},{d[2]:.4f}) |dtheta|={d[3]:.4f}")
        # was the divergence already in the model INPUTS at frame t?
        # rebuild the host inputs at frame t from the HOST chain prefix,
        # and the scan inputs from the SAME prefix via the step fn pieces.
        points_utils.regularize_pc = strided_regularize
        np.random.uniform = lambda *a, **k: 0.0
        try:
            data_dict, ref_bb = model.build_input_dict(seq, t, host_bbs[:t])
        finally:
            points_utils.regularize_pc = orig_reg
            np.random.uniform = orig_uniform
        scan_in = _scan_inputs_at(scan, model, variables, cfg, A, seq, t,
                                  host_bbs[:t])
        for key in ("template_points", "search_points"):
            hv = np.asarray(data_dict[key])[0]
            sv = np.asarray(scan_in[key])[0]
            # set-level comparison: sort rows lexicographically
            hs = hv[np.lexsort(hv.T)]
            ss = sv[np.lexsort(sv.T)]
            dmax = np.abs(hs - ss).max()
            print(f"  frame {t} {key}: max|host-scan| (sorted rows) = "
                  f"{dmax:.6f}" + ("  <-- INPUT MISMATCH" if dmax > 1e-4 else
                                   "  (inputs agree; fp-chaos downstream)"))
    print(f"\n{n_div}/{len(sequences)} tracklets diverged")


def _scan_inputs_at(scan, model, variables, cfg, A, seq, t, host_prefix):
    """Run ONE scan step at frame t seeded from the HOST chain prefix and
    capture the model inputs it would feed (template/search)."""
    import jax.numpy as jnp

    from open3dsot_tpu.geometry import points_utils, rigid
    from open3dsot_tpu.tracking.scan_matching import make_match_step
    from open3dsot_tpu.tracking.scan_tracker import pad_frame

    A_np = None if A is None else np.asarray(A)
    captured = {}

    class SpyModel:
        name = model.name
        net = model.net

        @staticmethod
        def apply(variables, batch, train=False):
            captured.update({k: np.asarray(v) for k, v in batch.items()})
            return model.apply(variables, batch, train=train)

    step = make_match_step(SpyModel, cfg, A, scan.is_bat, scan._agg_mode,
                           scan._gt_mode)
    first_box = seq[0]["3d_bbox"]
    crop, _ = points_utils.cropAndCenterPC(
        seq[0]["pc"], first_box,
        scale=cfg.model_bb_scale, offset=cfg.model_bb_offset)
    fp = crop.points.T.astype(np.float32)[: scan.first_crop_points]
    first_pts = np.zeros((1, scan.first_crop_points, 3), np.float32)
    first_pts[0, : len(fp)] = fp
    first_valid = np.zeros((1, scan.first_crop_points), bool)
    first_valid[0, : len(fp)] = True

    ref = host_prefix[-1]
    theta = rigid.theta_from_rotation(ref.rotation_matrix, A_np)
    ref_box = jnp.asarray(np.append(ref.center, theta)[None], jnp.float32)
    wlh = jnp.asarray(np.asarray(first_box.wlh)[None], jnp.float32)

    prev_p, prev_v = pad_frame(seq[t - 1]["pc"].points.T, scan.max_points)
    this_p, this_v = pad_frame(seq[t]["pc"].points.T, scan.max_points)
    xs = (jnp.asarray(prev_p[None]), jnp.asarray(prev_v[None]),
          jnp.asarray(this_p[None]), jnp.asarray(this_v[None]))
    carry = (ref_box, wlh)
    step(variables, wlh, jnp.asarray(first_pts), jnp.asarray(first_valid),
         carry, xs)
    return captured


if __name__ == "__main__":
    main()
