"""--save_results: per-tracklet trajectory persistence (tracking/results.py)."""

import json

import jax
import numpy as np
import pytest

from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.eval import evaluate_dataset
from open3dsot_tpu.tracking.results import ResultsWriter, read_results
from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan
from open3dsot_tpu.utils.metrics import Precision, Success

from tests.test_scan_tracker import m2_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    return cfg, model, variables, sampler


def _check_file(path, cfg, sampler, succ, prec, n):
    header, records = read_results(path)
    assert header["net_model"] == cfg.net_model
    assert header["up_axis"] == list(cfg.up_axis)
    assert len(records) == n
    s2, p2 = Success(), Precision()
    for rec in records:
        seq = sampler[rec["tracklet"]]
        assert rec["n_frames"] == len(seq)
        assert len(rec["boxes"]) == len(rec["ious"]) == len(rec["distances"])
        # frame 0 is the gt box: iou 1, distance 0, box == gt
        assert rec["ious"][0] == pytest.approx(1.0)
        assert rec["distances"][0] == pytest.approx(0.0, abs=1e-6)
        b0 = np.asarray(rec["boxes"][0])
        gt = seq[0]["3d_bbox"]
        assert np.allclose(b0[:3], gt.center, atol=1e-5)
        assert np.allclose(b0[3:6], gt.wlh, atol=1e-5)
        assert np.allclose(b0[6:].reshape(3, 3), gt.rotation_matrix, atol=1e-5)
        s2.update(rec["ious"])
        p2.update(rec["distances"])
    # the saved per-frame scores recompute the reported metrics exactly
    assert s2.compute() == pytest.approx(succ)
    assert p2.compute() == pytest.approx(prec)


def test_host_eval_writes_consistent_results(setup, tmp_path):
    cfg, model, variables, sampler = setup
    path = str(tmp_path / "host.jsonl")
    with ResultsWriter(path, cfg) as w:
        succ, prec = evaluate_dataset(model, variables, sampler, cfg,
                                      results_writer=w)
    _check_file(path, cfg, sampler, succ, prec, len(sampler))


def test_scan_eval_writes_consistent_results(setup, tmp_path):
    cfg, model, variables, sampler = setup
    path = str(tmp_path / "scan.jsonl")
    with ResultsWriter(path, cfg) as w:
        succ, prec = evaluate_dataset_scan(model, variables, sampler, cfg,
                                           max_points=256, results_writer=w)
    _check_file(path, cfg, sampler, succ, prec, len(sampler))


def test_records_are_plain_json(setup, tmp_path):
    cfg, model, variables, sampler = setup
    path = str(tmp_path / "plain.jsonl")
    with ResultsWriter(path, cfg) as w:
        evaluate_dataset(model, variables, sampler, cfg, max_tracklets=1,
                         results_writer=w)
    with open(path) as f:
        for line in f:
            json.loads(line)  # every line valid standalone JSON


def test_matching_scan_eval_writes_consistent_results(tmp_path):
    from open3dsot_tpu.tracking.scan_matching import (
        evaluate_dataset_scan_matching,
    )

    from tests.test_scan_matching import cfg_for as match_cfg

    cfg = match_cfg("p2b")
    model = get_model("p2b")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    path = str(tmp_path / "match.jsonl")
    with ResultsWriter(path, cfg) as w:
        succ, prec = evaluate_dataset_scan_matching(
            model, variables, sampler, cfg, max_points=1024, results_writer=w
        )
    _check_file(path, cfg, sampler, succ, prec, len(sampler))
