"""Matching-model (P2B/BAT) on-device scan tracker."""

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_matching import MatchScanTracker


def cfg_for(net, **over):
    base = dict(
        dataset="synthetic",
        net_model=net,
        category_name="Car",
        search_bb_scale=1.25,
        search_bb_offset=2,
        model_bb_scale=1.25,
        model_bb_offset=0,
        template_size=64,
        search_size=128,
        degrees=True,
        up_axis=[0, 0, 1],
        data_limit_box=False,
        train_type="train_siamese",
        num_candidates=1,
        box_aware=(net == "bat"),
        use_fps=(net == "bat"),
        normalize_xyz=False,
        feature_channel=32,
        hidden_channel=32,
        out_channel=32,
        vote_channel=32,
        num_proposal=16,
        k=4,
        bc_channel=9,
        reference_BB="previous_result",
        shape_aggregation="firstandprevious",
        use_z=True,
        limit_box=False,
        IoU_space=3,
        syn_num_tracklets=2,
        syn_tracklet_len=4,
        seed=0,
    )
    base.update(over)
    return make_config(base)


@pytest.mark.parametrize("net", ["p2b", "bat"])
class TestMatchScanTracker:
    def test_runs_and_scores(self, net):
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        ious, distances, boxes = tracker.evaluate_one_sequence(sampler[0], cfg)
        assert len(ious) == len(sampler[0])
        assert all(0.0 <= v <= 1.0 for v in ious)
        assert len(boxes) == len(sampler[0])

    def test_batched_matches_single(self, net):
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        seqs = [sampler[0], sampler[1]]
        batched = tracker.track_batch(seqs)
        singles = [tracker.track_batch([s])[0] for s in seqs]
        for b, s in zip(batched, singles):
            assert np.allclose(b, s, atol=1e-4)

    def test_dispatch_scored_matches_host_score(self, net):
        """On-device trajectory scoring must reproduce the host _score of
        the same boxes per frame."""
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        seqs = [sampler[0], sampler[1]]
        iou_d, dist_d = (np.asarray(x) for x in tracker.dispatch_scored(seqs))
        for b, (ious, dists, _) in enumerate(
            tracker.evaluate_sequences(seqs, cfg)
        ):
            T = len(seqs[b])
            assert np.allclose(iou_d[b, :T], ious, atol=2e-4)
            assert np.allclose(dist_d[b, :T], dists, atol=2e-4)


class TestLimitBox:
    def test_limit_box_config_runs(self):
        """limit_box configs (all P2B + BAT nuScenes/Waymo/Pedestrian) now
        track on device via the deterministic re-draw emulation."""
        cfg = cfg_for("p2b", limit_box=True)
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        ious, distances, boxes = tracker.evaluate_one_sequence(sampler[0], cfg)
        assert len(ious) == len(sampler[0])
        assert all(np.isfinite(v) for v in distances)

    def test_limit_box_offset_semantics(self):
        """Emulation preserves the reference's quirks
        (points_utils.py:70-76): only POSITIVE overshoot triggers, the y
        bound is min(l, 2), z only with use_z (and is exactly 0 there)."""
        import jax.numpy as jnp

        from open3dsot_tpu.geometry import rigid

        wlh = jnp.asarray([[1.5, 3.0, 1.4]], np.float32)  # (w, l, h)
        off = lambda dx, dy, dz, th: jnp.asarray([[dx, dy, dz, th]], np.float32)

        out = rigid.limit_box_offset(off(2.0, 0.1, 0.0, 0.3), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.1, 0.0, 0.3]])
        # negative overshoot does NOT trigger (signed comparison quirk)
        out = rigid.limit_box_offset(off(-9.0, -9.0, -9.0, 0.3), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[-9.0, -9.0, -9.0, 0.3]])
        # y bound is min(l, 2) = 2 here
        out = rigid.limit_box_offset(off(0.0, 2.5, 0.0, 0.0), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 0.0, 0.0]])
        # z redraw is exact 0, and only with use_z
        out = rigid.limit_box_offset(off(0.0, 0.0, 2.0, 0.0), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 0.0, 0.0]])
        out = rigid.limit_box_offset(off(0.0, 0.0, 2.0, 0.0), wlh, use_z=False)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 2.0, 0.0]])
