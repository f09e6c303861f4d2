"""PackedPrepStore: disk-backed eval prep cache (tracking/prep_store.py).

Pins the three contracts: (1) an eval through a cold store returns exactly
the plain eval's metrics, (2) a warm store serves the whole eval without a
single sampler read (poisoned sampler), (3) a fingerprint mismatch fails
loudly instead of serving stale arrays.
"""

import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.prep_store import PackedPrepStore, eval_store
from open3dsot_tpu.train.trainer import init_variables


class _PoisonedSampler:
    """Raises on any item access; len() still works."""

    def __init__(self, n):
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        raise AssertionError(f"sampler read on warm store (tracklet {i})")


def _m2_setup():
    import jax

    cfg = make_config(dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=128, degrees=False,
        up_axis=[0, 0, 1], box_aware=True, use_z=True, limit_box=False,
        IoU_space=3, motion_threshold=0.15, train_type="train_motion",
        syn_num_tracklets=4, syn_tracklet_len=6, seed=11,
    ))
    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")
    return cfg, model, variables, sampler


@pytest.mark.parametrize("transfer_quant", [False, True])
def test_m2_store_cold_equals_plain_and_warm_reads_nothing(
        tmp_path, transfer_quant):
    from open3dsot_tpu.tracking.scan_tracker import (
        M2ScanTracker, evaluate_dataset_scan)

    cfg, model, variables, sampler = _m2_setup()
    cfg.transfer_quant = "int16" if transfer_quant else None
    tracker = M2ScanTracker(model, variables, cfg, max_points=256,
                            frame_bucket=4)

    plain = evaluate_dataset_scan(model, variables, sampler, cfg,
                                  tracker=tracker, batch_tracklets=2)

    store = eval_store(str(tmp_path / "store"), cfg, tracker,
                       n=len(sampler), batch_tracklets=2)
    cold = evaluate_dataset_scan(model, variables, sampler, cfg,
                                 tracker=tracker, batch_tracklets=2,
                                 prep_cache=store)
    assert cold == plain

    # fresh store object on the same dir; sampler access is poisoned
    store2 = eval_store(str(tmp_path / "store"), cfg, tracker,
                        n=len(sampler), batch_tracklets=2)
    warm = evaluate_dataset_scan(model, variables,
                                 _PoisonedSampler(len(sampler)), cfg,
                                 tracker=tracker, batch_tracklets=2,
                                 prep_cache=store2)
    assert warm == plain


def test_matching_store_warm(tmp_path):
    from open3dsot_tpu.tracking.scan_matching import (
        MatchScanTracker, evaluate_dataset_scan_matching)

    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=64, search_size=128, point_sample_size=128,
        feature_channel=32, hidden_channel=32, out_channel=32,
        vote_channel=32, num_proposal=8, k=2, bc_channel=9,
        box_aware=True, use_fps=True, normalize_xyz=False, degrees=True,
        use_z=False, limit_box=False, IoU_space=3,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        shape_aggregation="firstandprevious", reference_BB="previous_result",
        bb_scale=1.25, bb_offset=2.0, train_type="train_siamese",
        syn_num_tracklets=3, syn_tracklet_len=5, seed=5,
    ))
    import jax

    model = get_model("bat")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler = get_dataset(cfg, "test", "test")
    tracker = MatchScanTracker(model, variables, cfg, max_points=256,
                               frame_bucket=4)

    plain = evaluate_dataset_scan_matching(
        model, variables, sampler, cfg, tracker=tracker, batch_tracklets=2)
    store = eval_store(str(tmp_path / "s"), cfg, tracker,
                       n=len(sampler), batch_tracklets=2)
    cold = evaluate_dataset_scan_matching(
        model, variables, sampler, cfg, tracker=tracker, batch_tracklets=2,
        prep_cache=store)
    assert cold == plain
    store2 = eval_store(str(tmp_path / "s"), cfg, tracker,
                        n=len(sampler), batch_tracklets=2)
    warm = evaluate_dataset_scan_matching(
        model, variables, _PoisonedSampler(len(sampler)), cfg,
        tracker=tracker, batch_tracklets=2, prep_cache=store2)
    assert warm == plain


def test_fingerprint_mismatch_raises(tmp_path):
    PackedPrepStore(str(tmp_path / "x"), {"a": 1})
    PackedPrepStore(str(tmp_path / "x"), {"a": 1})  # same: fine
    with pytest.raises(ValueError, match="different fingerprint"):
        PackedPrepStore(str(tmp_path / "x"), {"a": 2})


def test_fingerprint_pins_dataset_content(tmp_path):
    """A warm store must not serve another dataset's frames: changing any
    content-determining config (here the synthetic seed) must fail loudly,
    not validate on shape-only identity."""
    from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker

    cfg, model, variables, _ = _m2_setup()
    tracker = M2ScanTracker(model, variables, cfg, max_points=256,
                            frame_bucket=4)
    eval_store(str(tmp_path / "c"), cfg, tracker, n=4, batch_tracklets=2)
    cfg.seed = cfg.seed + 1  # same shapes, different point clouds
    with pytest.raises(ValueError, match="different fingerprint"):
        eval_store(str(tmp_path / "c"), cfg, tracker, n=4,
                   batch_tracklets=2)


def test_sharded_processes_use_disjoint_subdirs(tmp_path, monkeypatch):
    """Multi-process sharded eval with ONE shared --eval_prep_cache dir:
    each process must get its own meta.json (stripe is part of the
    fingerprint), so the stores must live in per-shard subdirectories."""
    import jax

    from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker

    cfg, model, variables, _ = _m2_setup()
    tracker = M2ScanTracker(model, variables, cfg, max_points=256,
                            frame_bucket=4)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    paths = []
    for idx in range(2):
        monkeypatch.setattr(jax, "process_index", lambda idx=idx: idx)
        store = eval_store(str(tmp_path / "shared"), cfg, tracker, n=4,
                           batch_tracklets=2, shard_across_processes=True)
        paths.append(store.path)
    assert paths[0] != paths[1]
    assert all(str(tmp_path / "shared") in p for p in paths)


def test_host_scored_eval_ignores_stub_store(tmp_path):
    """device_metrics=False needs real frames: a warm store must be skipped,
    not crash on stub access."""
    from open3dsot_tpu.tracking.scan_tracker import (
        M2ScanTracker, evaluate_dataset_scan)

    cfg, model, variables, sampler = _m2_setup()
    tracker = M2ScanTracker(model, variables, cfg, max_points=256,
                            frame_bucket=4)
    store = eval_store(str(tmp_path / "h"), cfg, tracker,
                       n=len(sampler), batch_tracklets=2)
    evaluate_dataset_scan(model, variables, sampler, cfg, tracker=tracker,
                          batch_tracklets=2, prep_cache=store)  # warm it
    host = evaluate_dataset_scan(model, variables, sampler, cfg,
                                 tracker=tracker, batch_tracklets=2,
                                 device_metrics=False, prep_cache=store)
    assert all(np.isfinite(v) for v in host)
