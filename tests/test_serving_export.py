"""Serialized serving bundles (tracking/serving_export.py).

A bundle must round-trip: the loaded tracker — whose step/reset functions
come back as deserialized StableHLO, with NO flax model constructed — must
produce exactly the trajectories of the exporting tracker on the same
frames."""

import numpy as np
import jax
import pytest

from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.online import OnlineM2Tracker, OnlineMatchTracker
from open3dsot_tpu.tracking.serving_export import (
    load_serving_bundle,
    save_serving_bundle,
)

from tests.test_online import _frames
from tests.test_scan_matching import cfg_for as match_cfg
from tests.test_scan_tracker import m2_cfg


def _run(tracker, seqs):
    """Drive any online tracker over the sequences; return trajectories."""
    for slot, seq in enumerate(seqs):
        f = _frames(seq)[0]
        tracker.reset(slot, f, seq[0]["3d_bbox"])
    T = max(len(s) for s in seqs)
    out = [[] for _ in seqs]
    for t in range(1, T):
        frames = {s: _frames(seq)[t]
                  for s, seq in enumerate(seqs) if t < len(seq)}
        boxes = tracker.step(frames)
        for s in frames:
            out[s].append(boxes[s])
    return [np.stack(o) for o in out]


@pytest.mark.parametrize("transfer_dtype", [None, "int16"])
def test_m2_bundle_round_trip(tmp_path, transfer_dtype):
    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    seqs = [sampler[0], sampler[1]]

    live = OnlineM2Tracker(model, variables, cfg, max_streams=4,
                           max_points=256, transfer_dtype=transfer_dtype)
    want = _run(live, seqs)

    save_serving_bundle(live, tmp_path / "bundle")
    served = load_serving_bundle(tmp_path / "bundle")
    assert served.model is None  # no model code needed to serve
    assert served.transfer_dtype == transfer_dtype
    got = _run(served, seqs)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_match_bundle_round_trip(tmp_path):
    cfg = match_cfg("bat")
    model = get_model("bat")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    seqs = [sampler[0]]

    live = OnlineMatchTracker(model, variables, cfg, max_streams=2,
                              max_points=256, first_crop_points=128)
    want = _run(live, seqs)

    save_serving_bundle(live, tmp_path / "bundle")
    served = load_serving_bundle(tmp_path / "bundle")
    assert served.first_crop_points == 128
    got = _run(served, seqs)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_bundle_is_self_describing(tmp_path):
    import json

    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    live = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                           max_points=64)
    save_serving_bundle(live, tmp_path / "b")
    meta = json.loads((tmp_path / "b" / "meta.json").read_text())
    assert meta["family"] == "m2track"
    assert meta["max_streams"] == 2 and meta["max_points"] == 64
    # format versioning: a future-format bundle must refuse to load
    meta["format_version"] = 999
    (tmp_path / "b" / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format"):
        load_serving_bundle(tmp_path / "b")


def test_multi_platform_bundle(tmp_path):
    """platforms=["cpu", "tpu"] lowers one program for both backends — the
    deployment shape: export once on a CPU build host, serve on TPU. (Here
    only the cpu leg can execute; lowering for tpu must still succeed and
    the bundle must round-trip.)"""
    import json

    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    seqs = [sampler[0]]
    live = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                           max_points=256)
    want = _run(live, seqs)
    save_serving_bundle(live, tmp_path / "b", platforms=["cpu", "tpu"])
    meta = json.loads((tmp_path / "b" / "meta.json").read_text())
    assert meta["platforms"] == ["cpu", "tpu"]
    got = _run(load_serving_bundle(tmp_path / "b"), seqs)
    np.testing.assert_array_equal(want[0], got[0])


def test_mesh_tracker_refuses_export(tmp_path):
    from open3dsot_tpu.parallel.mesh import make_mesh

    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    mesh = make_mesh()
    live = OnlineM2Tracker(model, variables, cfg, max_streams=8,
                           max_points=64, mesh=mesh)
    with pytest.raises(ValueError, match="mesh"):
        save_serving_bundle(live, tmp_path / "b")
