"""Online (streaming) serving trackers (tracking/online.py).

The online step IS the offline scan step (make_m2_step / make_match_step),
so online trajectories must equal the scan trackers' up to compile-level
float reassociation (the two compilations may fuse differently; measured
~1e-6 on the matching towers, bit-exact on M2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.online import (
    OnlineM2Tracker,
    OnlineMatchTracker,
    make_online_tracker,
)
from open3dsot_tpu.tracking.scan_matching import MatchScanTracker
from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker

from tests.test_scan_matching import cfg_for as match_cfg
from tests.test_scan_tracker import m2_cfg


def _m2_setup(**over):
    cfg = m2_cfg()
    for k, v in over.items():
        setattr(cfg, k, v)
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    return cfg, model, variables, sampler


def _frames(seq):
    return [f["pc"].points.T.astype(np.float32) for f in seq]


class TestOnlineM2:
    def test_matches_offline_scan_exactly(self):
        cfg, model, variables, sampler = _m2_setup()
        seqs = [sampler[0], sampler[1]]
        scan = M2ScanTracker(model, variables, cfg, max_points=256)
        want = scan.track_batch(seqs)

        online = OnlineM2Tracker(model, variables, cfg, max_streams=4,
                                 max_points=256)
        for slot, seq in enumerate(seqs):
            online.reset(slot, _frames(seq)[0], seq[0]["3d_bbox"])
        T = max(len(s) for s in seqs)
        got = [[] for _ in seqs]
        for t in range(1, T):
            frames = {
                slot: _frames(seq)[t]
                for slot, seq in enumerate(seqs) if t < len(seq)
            }
            boxes = online.step(frames)
            for slot in frames:
                got[slot].append(boxes[slot])
        for w, g in zip(want, got):
            assert np.array_equal(w, np.stack(g)), "online != offline scan"

    def test_staggered_streams_independent(self):
        """A stream started mid-flight (while another is already running)
        must produce the same trajectory as when run alone."""
        cfg, model, variables, sampler = _m2_setup()
        seq_a, seq_b = sampler[0], sampler[1]

        online = OnlineM2Tracker(model, variables, cfg, max_streams=4,
                                 max_points=256)
        online.reset(0, _frames(seq_a)[0], seq_a[0]["3d_bbox"])
        boxes_b = []
        fa, fb = _frames(seq_a), _frames(seq_b)
        for t in range(1, len(seq_a)):
            if t == 2:  # stream b enters mid-flight
                online.reset(1, fb[0], seq_b[0]["3d_bbox"])
            frames = {0: fa[t]}
            if t >= 2 and (t - 1) < len(seq_b):
                frames[1] = fb[t - 1]
            out = online.step(frames)
            if 1 in out:
                boxes_b.append(out[1])

        solo = OnlineM2Tracker(model, variables, cfg, max_streams=4,
                               max_points=256)
        solo.reset(2, fb[0], seq_b[0]["3d_bbox"])
        solo_boxes = [solo.step({2: fb[t]})[2] for t in range(1, len(boxes_b) + 1)]
        assert np.array_equal(np.stack(boxes_b), np.stack(solo_boxes))

    def test_slot_reuse_after_stop(self):
        cfg, model, variables, sampler = _m2_setup()
        seq = sampler[0]
        f = _frames(seq)
        online = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                                 max_points=256)
        online.reset(0, f[0], seq[0]["3d_bbox"])
        online.step({0: f[1]})
        online.stop(0)
        assert 0 in online.free_slots()
        # restart the same slot from scratch: trajectory starts over
        online.reset(0, f[0], seq[0]["3d_bbox"])
        first = online.step({0: f[1]})[0]
        fresh = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                                max_points=256)
        fresh.reset(0, f[0], seq[0]["3d_bbox"])
        assert np.array_equal(first, fresh.step({0: f[1]})[0])

    def test_inactive_slot_rejected(self):
        cfg, model, variables, sampler = _m2_setup()
        online = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                                 max_points=256)
        with pytest.raises(ValueError):
            online.step({0: np.zeros((4, 3), np.float32)})

    def test_active_slot_must_be_fed(self):
        cfg, model, variables, sampler = _m2_setup()
        seq = sampler[0]
        online = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                                 max_points=256)
        online.reset(0, _frames(seq)[0], seq[0]["3d_bbox"])
        with pytest.raises(ValueError):
            online.step({})


@pytest.mark.parametrize("net", ["p2b", "bat"])
class TestOnlineMatch:
    def test_matches_offline_scan_exactly(self, net):
        cfg = match_cfg(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[0], sampler[1]]
        scan = MatchScanTracker(model, variables, cfg, max_points=256,
                                first_crop_points=128)
        want = scan.track_batch(seqs)

        online = OnlineMatchTracker(model, variables, cfg, max_streams=4,
                                    max_points=256, first_crop_points=128)
        for slot, seq in enumerate(seqs):
            online.reset(slot, seq[0]["pc"], seq[0]["3d_bbox"])
        T = max(len(s) for s in seqs)
        got = [[] for _ in seqs]
        for t in range(1, T):
            frames = {
                slot: _frames(seq)[t]
                for slot, seq in enumerate(seqs) if t < len(seq)
            }
            boxes = online.step(frames)
            for slot in frames:
                got[slot].append(boxes[slot])
        for w, g in zip(want, got):
            # the two compilations fuse the deep matching towers differently;
            # measured ~1e-6 reassociation noise per step
            assert np.allclose(w, np.stack(g), atol=1e-4), \
                "online != offline scan"

    def test_gt_modes_rejected(self, net):
        cfg = match_cfg(net, reference_BB="current_gt")
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        with pytest.raises(ValueError, match="serving time"):
            OnlineMatchTracker(model, variables, cfg)


def test_limit_box_uniform_online_matches_offline():
    """limit_box + 'uniform' re-draws carry a per-slot age through the
    online state; staggered or not, the draws key off each slot's own step
    count, so online trajectories must still equal the offline scan."""
    cfg = match_cfg("p2b", limit_box=True)  # limit_box_redraw defaults to uniform
    model = get_model("p2b")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    sampler = get_dataset(cfg, "test", "test")
    seqs = [sampler[0], sampler[1]]
    scan = MatchScanTracker(model, variables, cfg, max_points=256,
                            first_crop_points=128)
    want = scan.track_batch(seqs)
    online = OnlineMatchTracker(model, variables, cfg, max_streams=4,
                                max_points=256, first_crop_points=128)
    assert "age" in jax.tree_util.tree_map(lambda x: x, online._state)
    for slot, seq in enumerate(seqs):
        online.reset(slot, seq[0]["pc"], seq[0]["3d_bbox"])
    T = max(len(s) for s in seqs)
    got = [[] for _ in seqs]
    for t in range(1, T):
        frames = {slot: _frames(seq)[t]
                  for slot, seq in enumerate(seqs) if t < len(seq)}
        boxes = online.step(frames)
        for slot in frames:
            got[slot].append(boxes[slot])
    for w, g in zip(want, got):
        assert np.allclose(w, np.stack(g), atol=1e-4)


def test_factory_picks_family():
    cfg, model, variables, _ = _m2_setup()
    assert isinstance(
        make_online_tracker(model, variables, cfg, max_points=128),
        OnlineM2Tracker,
    )
    cfg2 = match_cfg("p2b")
    model2 = get_model("p2b")(cfg2)
    variables2 = model2.init(jax.random.PRNGKey(0), model2.dummy_batch(2))
    assert isinstance(
        make_online_tracker(model2, variables2, cfg2, max_points=128),
        OnlineMatchTracker,
    )


def test_mesh_online_matches_unsharded():
    """Slot axis sharded over an 8-device mesh (GSPMD) must reproduce the
    single-device online trajectories."""
    from jax.sharding import Mesh

    cfg, model, variables, sampler = _m2_setup()
    seqs = [sampler[0], sampler[1]]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    def run(mesh_arg):
        online = OnlineM2Tracker(model, variables, cfg, max_streams=8,
                                 max_points=256, mesh=mesh_arg)
        for slot, seq in enumerate(seqs):
            online.reset(slot, _frames(seq)[0], seq[0]["3d_bbox"])
        out = []
        for t in range(1, min(len(s) for s in seqs)):
            frames = {slot: _frames(seq)[t] for slot, seq in enumerate(seqs)}
            boxes = online.step(frames)
            out.append(np.stack([boxes[s] for s in sorted(frames)]))
        return np.stack(out)

    got, want = run(mesh), run(None)
    assert np.allclose(got, want, atol=1e-5)


def test_mesh_online_requires_divisible_slots():
    from jax.sharding import Mesh

    cfg, model, variables, _ = _m2_setup()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError, match="divisible"):
        OnlineM2Tracker(model, variables, cfg, max_streams=6,
                        max_points=256, mesh=mesh)


def test_int16_transfer_matches_dequantized_f32():
    """The online int16 path must equal the f32 path fed the same
    dequantized frames (only WHERE the decode runs differs)."""
    from open3dsot_tpu.utils.quant import dequantize, quantize_per_sample

    cfg, model, variables, sampler = _m2_setup()
    seq = sampler[0]
    f = _frames(seq)
    tr_q = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                           max_points=256, transfer_dtype="int16")
    tr_f = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                           max_points=256)
    tr_q.reset(0, f[0], seq[0]["3d_bbox"])
    tr_f.reset(0, f[0], seq[0]["3d_bbox"])
    from open3dsot_tpu.tracking.online import _pad_one

    for t in range(1, len(seq)):
        b_q = tr_q.step({0: f[t]})[0]
        # feed the f32 tracker the dequantized REAL rows the int16 path saw
        # (its pad rows re-pad to exact zeros; both are valid-masked out)
        pts = np.zeros((2, 256, 3), np.float32)
        valid = np.zeros((2, 256), bool)
        pts[0], valid[0] = _pad_one(f[t], 256)
        q, scale, off = quantize_per_sample(pts, valid)
        deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                    jnp.asarray(off)))
        n = min(len(f[t]), 256)
        b_f = tr_f.step({0: deq[0][:n]})[0]
        assert np.array_equal(b_q, b_f)


def test_slot_range_validated():
    """Out-of-range and negative slots raise ValueError (negative numpy
    indexing would silently alias another stream)."""
    cfg, model, variables, sampler = _m2_setup()
    seq = sampler[0]
    f = _frames(seq)
    online = OnlineM2Tracker(model, variables, cfg, max_streams=2,
                             max_points=256)
    with pytest.raises(ValueError, match="slot"):
        online.reset(-1, f[0], seq[0]["3d_bbox"])
    with pytest.raises(ValueError, match="slot"):
        online.reset(2, f[0], seq[0]["3d_bbox"])
    online.reset(1, f[0], seq[0]["3d_bbox"])
    with pytest.raises(ValueError, match="slot"):
        online.step({-1: f[1], 1: f[1]})
