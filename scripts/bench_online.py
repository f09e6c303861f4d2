"""Online-serving latency/throughput benchmark (tracking/online.py).

Two numbers per (model, streams) point:

- end-to-end per-step latency: wall clock of `tracker.step()` including the
  host padding + H2D of one frame per stream and the D2H of the (B, 4)
  boxes. On this environment's tunnel that is dominated by the ~30 ms
  dispatch latency — a co-located serving host would not pay it.
- device-only per-step latency: a K-step `lax.scan` over the SAME advance
  function, timed at two chain lengths and differenced (the calibrated-
  chain method, benchmarks/profile_bat.py) — the compute floor per frame
  batch.

Usage: python scripts/bench_online.py [--streams 8,16,32] [--steps 50]
Writes/updates BENCH_ONLINE.md.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _cases():
    """PRODUCTION-scale configs (same sizes as benchmarks/bench_e2e_eval.py:
    1024-point frames, 256-channel BAT towers, 512/1024 template/search) —
    not the tiny test stubs, so the rows are comparable to BENCH_DETAILS.md."""
    from open3dsot_tpu.config import make_config

    cfg_m2 = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=1024, degrees=False,
        up_axis=[0, 0, 1], box_aware=True, use_z=True, limit_box=False,
        IoU_space=3, motion_threshold=0.15, train_type="train_motion",
        syn_num_tracklets=2, syn_tracklet_len=64, seed=7,
    ))
    cfg_bat = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=512, search_size=1024, point_sample_size=1024,
        feature_channel=256, hidden_channel=256, out_channel=256,
        vote_channel=256, num_proposal=64, k=4, bc_channel=9,
        box_aware=True, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        syn_num_tracklets=2, syn_tracklet_len=64, seed=7,
    ))
    cfg_p2b = make_config(dict(
        dataset="synthetic", net_model="p2b", category_name="Car",
        template_size=512, search_size=1024, point_sample_size=1024,
        feature_channel=256, hidden_channel=256, out_channel=256,
        vote_channel=256, num_proposal=64, k=4, bc_channel=9,
        box_aware=False, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        syn_num_tracklets=2, syn_tracklet_len=64, seed=7,
    ))
    return [("m2track", cfg_m2), ("bat", cfg_bat), ("p2b", cfg_p2b)]


def _device_step_s(tracker, iters=32):
    """Calibrated device-only seconds/step of the online advance."""
    variables, state = tracker.variables, tracker._state
    B, P = tracker.max_streams, tracker.max_points
    pts = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(B, P, 3)).astype(np.float32))
    valid = jnp.ones((B, P), bool)

    def chain(K):
        @jax.jit
        def run(variables, state, pts, valid):
            def body(st, _):
                st2, boxes = tracker._advance(variables, st, pts, valid)
                return st2, boxes.sum()
            st, sums = jax.lax.scan(body, state, None, length=K)
            return sums.sum()

        run(variables, state, pts, valid).block_until_ready()  # compile
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(variables, state, pts, valid).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    k = iters
    t1, t5 = chain(k), chain(5 * k)
    return (t5 - t1) / (4 * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=str, default="8,16,32")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--models", type=str, default="m2track,bat,p2b",
                    help="comma-separated subset (CPU smoke: m2track only)")
    args = ap.parse_args()
    stream_counts = [int(s) for s in args.streams.split(",")]
    model_subset = set(args.models.split(","))

    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.tracking.online import make_online_tracker

    rows = []
    for name, cfg in _cases():
        if name not in model_subset:
            continue
        model = get_model(name)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = sampler[0]
        frames = [f["pc"].points.T.astype(np.float32) for f in seq]
        for B in stream_counts:
            kw = dict(max_streams=B, max_points=args.points)
            if name != "m2track":
                kw["first_crop_points"] = 512
            tracker = make_online_tracker(model, variables, cfg, **kw)
            for slot in range(B):
                tracker.reset(slot, frames[0], seq[0]["3d_bbox"])
            feed = {s: frames[1 + (s % (len(frames) - 1))] for s in range(B)}
            tracker.step(feed)  # compile
            t0 = time.perf_counter()
            for i in range(args.steps):
                tracker.step(feed)
            e2e = (time.perf_counter() - t0) / args.steps
            dev = _device_step_s(tracker)
            rows.append((name, B, e2e * 1e3, B / e2e, dev * 1e3, B / dev))
            print(f"{name:8s} B={B:3d}  e2e {e2e*1e3:7.2f} ms/step "
                  f"({B/e2e:8.1f} fr/s)   device-only {dev*1e3:7.2f} ms/step "
                  f"({B/dev:8.1f} fr/s)", flush=True)

    backend = jax.devices()[0].platform
    lines = [
        "# Online serving benchmark (tracking/online.py)",
        "",
        f"Backend: {backend}. End-to-end includes host padding + per-step "
        "dispatch (this tunnel adds ~30 ms/dispatch — a co-located host "
        "would not pay it); device-only is the calibrated two-length "
        "chained scan of the same advance function.",
        "",
        "| Model | Streams | e2e ms/step | e2e frames/s | device ms/step | device frames/s |",
        "|---|---|---|---|---|---|",
    ]
    for name, B, e2e_ms, e2e_fps, dev_ms, dev_fps in rows:
        lines.append(f"| {name} | {B} | {e2e_ms:.2f} | {e2e_fps:.0f} "
                     f"| {dev_ms:.2f} | {dev_fps:.0f} |")
    Path("BENCH_ONLINE.md").write_text("\n".join(lines) + "\n")
    print("wrote BENCH_ONLINE.md")


if __name__ == "__main__":
    main()
