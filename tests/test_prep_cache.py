"""Padded-array prep cache for repeated scan eval (in-training validation):
second and later calls must do zero host padding and return identical
metrics (prep_cache= on evaluate_dataset_scan / evaluate_dataset_scan_matching)."""

import jax
import numpy as np
import pytest

from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_matching import (
    MatchScanTracker,
    evaluate_dataset_scan_matching,
)
from open3dsot_tpu.tracking.scan_tracker import (
    M2ScanTracker,
    evaluate_dataset_scan,
)

from tests.test_scan_matching import cfg_for as match_cfg
from tests.test_scan_tracker import m2_cfg


def _count_prepare(tracker):
    calls = {"n": 0}
    orig = tracker._prepare

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    tracker._prepare = counted
    return calls


def test_m2_cached_eval_identical_and_skips_padding():
    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    tracker = M2ScanTracker(model, variables, cfg, max_points=256)
    calls = _count_prepare(tracker)

    cache = {}
    s1, p1 = evaluate_dataset_scan(model, variables, sampler, cfg,
                                   tracker=tracker, prep_cache=cache)
    n_first = calls["n"]
    assert n_first > 0 and "batches" in cache
    s2, p2 = evaluate_dataset_scan(model, variables, sampler, cfg,
                                   tracker=tracker, prep_cache=cache)
    assert calls["n"] == n_first, "cached eval must not re-pad"
    assert (s1, p1) == (s2, p2)
    # and identical to a cache-free run
    s3, p3 = evaluate_dataset_scan(model, variables, sampler, cfg,
                                   tracker=tracker)
    assert (s1, p1) == (s3, p3)


def test_m2_cache_correct_under_variable_swap():
    """The cache stores data only; swapping variables (each validation
    epoch) must still produce the fresh model's metrics."""
    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    v1 = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    v2 = model.init(jax.random.PRNGKey(7), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    tracker = M2ScanTracker(model, v1, cfg, max_points=256)
    cache = {}
    evaluate_dataset_scan(model, v1, sampler, cfg, tracker=tracker,
                          prep_cache=cache)
    s_cached, p_cached = evaluate_dataset_scan(
        model, v2, sampler, cfg, tracker=tracker, prep_cache=cache
    )
    s_fresh, p_fresh = evaluate_dataset_scan(
        model, v2, sampler, cfg, tracker=tracker
    )
    assert (s_cached, p_cached) == (s_fresh, p_fresh)


def test_match_cached_eval_identical_and_skips_padding():
    cfg = match_cfg("p2b")
    model = get_model("p2b")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    tracker = MatchScanTracker(model, variables, cfg, max_points=256,
                               first_crop_points=128)
    calls = _count_prepare(tracker)
    cache = {}
    s1, p1 = evaluate_dataset_scan_matching(model, variables, sampler, cfg,
                                            tracker=tracker, prep_cache=cache)
    n_first = calls["n"]
    assert n_first > 0
    s2, p2 = evaluate_dataset_scan_matching(model, variables, sampler, cfg,
                                            tracker=tracker, prep_cache=cache)
    assert calls["n"] == n_first, "cached eval must not re-pad"
    assert (s1, p1) == (s2, p2)
