"""Distributed SCAN-path eval across REAL processes (jax.distributed, CPU).

tests/test_multiprocess_eval.py covers the per-frame host tracker; this
covers the batched on-device scan path with device metrics: each process
buckets and tracks its tracklet shard (scan_tracker.evaluate_dataset_scan
shard_across_processes=True, scoring on device via geometry/iou_device.py)
and the AUC count-vectors are allgather-summed. Both ranks must converge to
the single-process result exactly (count-vector merge is integer-exact).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan

cfg = make_config(dict(
    dataset="synthetic", net_model="m2track", category_name="Car",
    bb_scale=1.25, bb_offset=2, point_sample_size=32, degrees=False,
    up_axis=[0, 0, 1], train_type="train_motion", motion_threshold=0.15,
    box_aware=False, use_second_stage=False, use_prev_refinement=False,
    use_motion_cls=False, use_z=True, limit_box=False, IoU_space=3,
    syn_num_tracklets=5, syn_tracklet_len=3, seed=0,
))
model = get_model("m2track")(cfg)
variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
sampler = get_dataset(cfg, "test", "test")
succ, prec = evaluate_dataset_scan(
    model, variables, sampler, cfg, max_points=256, batch_tracklets=2,
    device_metrics=True, shard_across_processes=(nproc > 1))
print(f"RANK{pid} RESULT {succ:.6f} {prec:.6f}", flush=True)
"""


def test_two_process_scan_eval_matches_single():
    with socket.socket() as s:
        s.bind(("", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), "2", port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RANK"):
                rank, _, s_, p_ = line.split()
                results[rank] = (float(s_), float(p_))
    assert set(results) == {"RANK0", "RANK1"}
    assert results["RANK0"] == pytest.approx(results["RANK1"])

    # single process, no distributed group: identical metrics (the shard
    # walk changes only bucketing order; the count-vector sum is exact)
    single = subprocess.run(
        [sys.executable, "-c", WORKER, "0", "1", port],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stderr[-2000:]
    line = [ln for ln in single.stdout.splitlines() if ln.startswith("RANK")][0]
    _, _, s_, p_ = line.split()
    assert results["RANK0"] == pytest.approx((float(s_), float(p_)), abs=1e-4)
