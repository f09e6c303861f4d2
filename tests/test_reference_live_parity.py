"""Live parity vs the ACTUAL reference code (not hand-written replicas).

Round-1 VERDICT item 4: the reference's M2-Track forward and all of
datasets/points_utils.py are CPU-runnable. These tests import them read-only
(tests/_reference_live.py stubs the missing third-party deps) and assert our
implementations reproduce the real reference outputs on seeded inputs:

- geometry core: getOffsetBB / getModel / cropAndCenterPC /
  generate_subwindow / transform_box / get_in_box_mask /
  get_point_to_box_distance / regularize_pc / apply_augmentation
  (reference datasets/points_utils.py)
- training label builders: siamese_processing / motion_processing
  (reference datasets/sampler.py:16-180)
- metric AUC math: Success / Precision vs TorchSuccess / TorchPrecision
  (reference utils/metrics.py:75-125)
- the full M2-Track forward through the torch-ckpt importer
  (reference models/m2track.py:73-151)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests._reference_live import load_reference  # noqa: E402

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo unavailable")

from open3dsot_tpu.geometry import points_utils as our_pu  # noqa: E402
from open3dsot_tpu.geometry.data_classes import Box as OurBox  # noqa: E402
from open3dsot_tpu.geometry.data_classes import PointCloud as OurPC  # noqa: E402
from open3dsot_tpu.geometry.quaternion import Quaternion  # noqa: E402


def _mk_boxes(rng, n=1):
    """Paired (reference Box, our Box) from the same parameters."""
    out = []
    for _ in range(n):
        center = rng.uniform(-10, 10, 3)
        wlh = rng.uniform(0.5, 4.0, 3)
        theta = rng.uniform(-np.pi, np.pi)
        q = Quaternion(axis=[0, 0, 1], radians=theta)
        ref_box = REF["data_classes"].Box(center.tolist(), wlh.tolist(), q)
        our_box = OurBox(center.tolist(), wlh.tolist(), q)
        out.append((ref_box, our_box))
    return out[0] if n == 1 else out


def _mk_cloud(rng, n=400, spread=6.0):
    pts = rng.normal(scale=spread, size=(3, n)).astype(np.float64)
    return REF["data_classes"].PointCloud(pts.copy()), OurPC(pts.copy())


def _assert_box_eq(ref_box, our_box, atol=1e-9):
    np.testing.assert_allclose(ref_box.center, our_box.center, atol=atol)
    np.testing.assert_allclose(ref_box.wlh, our_box.wlh, atol=atol)
    np.testing.assert_allclose(
        ref_box.rotation_matrix, our_box.rotation_matrix, atol=atol
    )


class TestGeometryLive:
    @pytest.mark.parametrize("degrees", [True, False])
    @pytest.mark.parametrize("use_z", [True, False])
    @pytest.mark.parametrize("limit_box", [True, False])
    @pytest.mark.parametrize("dof", [3, 4])
    def test_getOffsetBB(self, degrees, use_z, limit_box, dof):
        rng = np.random.default_rng(42)
        for _ in range(5):
            ref_box, our_box = _mk_boxes(rng)
            offset = rng.uniform(-3, 3, dof)
            # limit_box re-draws via np.random.uniform: pin the global stream
            np.random.seed(7)
            got_ref = REF["points_utils"].getOffsetBB(
                ref_box, offset.copy(), degrees=degrees, use_z=use_z, limit_box=limit_box
            )
            np.random.seed(7)
            got_ours = our_pu.getOffsetBB(
                our_box, offset.copy(), degrees=degrees, use_z=use_z, limit_box=limit_box
            )
            _assert_box_eq(got_ref, got_ours)

    def test_regularize_pc_seeded_and_unseeded(self):
        rng = np.random.default_rng(0)
        for n, size in [(10, 128), (500, 128), (128, 128), (2, 64)]:
            pts = rng.normal(size=(n, 3))
            ref_pts, ref_idx = REF["points_utils"].regularize_pc(pts.copy(), size, seed=1)
            our_pts, our_idx = our_pu.regularize_pc(pts.copy(), size, seed=1)
            np.testing.assert_array_equal(ref_pts, our_pts)
            if ref_idx is None:
                assert our_idx is None
            else:
                np.testing.assert_array_equal(ref_idx, our_idx)
            np.random.seed(3)
            ref_pts, _ = REF["points_utils"].regularize_pc(pts.copy(), size)
            np.random.seed(3)
            our_pts, _ = our_pu.regularize_pc(pts.copy(), size)
            np.testing.assert_array_equal(ref_pts, our_pts)

    def test_crop_center_model_subwindow(self):
        rng = np.random.default_rng(1)
        for _ in range(4):
            (rb1, ob1), (rb2, ob2) = _mk_boxes(rng, 2)
            rpc1, opc1 = _mk_cloud(rng)
            rpc2, opc2 = _mk_cloud(rng)

            ref_crop, ref_box = REF["points_utils"].cropAndCenterPC(
                rpc1, rb1, offset=2, scale=1.25
            )
            our_crop, our_box = our_pu.cropAndCenterPC(opc1, ob1, offset=2, scale=1.25)
            # our PointCloud stores float32 (device-bound arrays); the
            # reference computes in float64 — agree to f32 precision
            np.testing.assert_allclose(ref_crop.points, our_crop.points, atol=1e-5)
            _assert_box_eq(ref_box, our_box)

            ref_pc, ref_mbox = REF["points_utils"].getModel(
                [rpc1, rpc2], [rb1, rb2], scale=1.25, offset=0
            )
            our_pc, our_mbox = our_pu.getModel([opc1, opc2], [ob1, ob2], scale=1.25, offset=0)
            # the reference's getModel seeds the concat with a float32 empty
            # array, demoting its output to float32 — compare at f32 precision
            np.testing.assert_allclose(ref_pc.points, our_pc.points, atol=1e-5)
            _assert_box_eq(ref_mbox, our_mbox)

            ref_sub = REF["points_utils"].generate_subwindow(
                rpc1, rb1, scale=1.25, offset=2
            )
            our_sub = our_pu.generate_subwindow(opc1, ob1, scale=1.25, offset=2)
            np.testing.assert_allclose(ref_sub.points, our_sub.points, atol=1e-5)

            got_ref = REF["points_utils"].transform_box(rb1, rb2)
            got_ours = our_pu.transform_box(ob1, ob2)
            _assert_box_eq(got_ref, got_ours)

    def test_in_box_mask_and_boxcloud(self):
        rng = np.random.default_rng(2)
        ref_box, our_box = _mk_boxes(rng)
        # cluster the cloud on the box so the mask is non-vacuous
        pts = (np.asarray(ref_box.center)[:, None]
               + rng.normal(scale=1.5, size=(3, 800)))
        rpc = REF["data_classes"].PointCloud(pts.copy())
        opc = OurPC(pts.copy())
        ref_mask = REF["points_utils"].get_in_box_mask(rpc, ref_box)
        our_mask = our_pu.get_in_box_mask(opc, our_box)
        np.testing.assert_array_equal(ref_mask, our_mask)
        assert ref_mask.sum() > 0  # non-vacuous

        pts = rpc.points.T
        ref_bc = REF["points_utils"].get_point_to_box_distance(pts.copy(), ref_box)
        our_bc = our_pu.get_point_to_box_distance(pts.copy(), our_box)
        np.testing.assert_allclose(ref_bc, our_bc, atol=1e-9)

    def test_apply_augmentation(self):
        rng = np.random.default_rng(3)
        ref_box, our_box = _mk_boxes(rng)
        rpc, opc = _mk_cloud(rng, n=600, spread=2.0)
        np.random.seed(11)
        ref_pc, ref_b = REF["points_utils"].apply_augmentation(rpc, ref_box)
        np.random.seed(11)
        our_pc, our_b = our_pu.apply_augmentation(opc, our_box)
        np.testing.assert_allclose(ref_pc.points, our_pc.points, atol=1e-9)
        _assert_box_eq(ref_b, our_b)


def _frame(rng, ref_dc, around=None, n=600):
    center = rng.uniform(-4, 4, 3) if around is None else around + rng.uniform(-0.4, 0.4, 3)
    wlh = rng.uniform(1.2, 3.5, 3)
    theta = rng.uniform(-np.pi, np.pi)
    q = Quaternion(axis=[0, 0, 1], radians=theta)
    # cloud clustered near the box so min-point asserts pass
    pts = (center[:, None] + rng.normal(scale=2.0, size=(3, n))).astype(np.float64)
    ref = {"pc": ref_dc.PointCloud(pts.copy()), "3d_bbox": ref_dc.Box(center.tolist(), wlh.tolist(), q)}
    ours = {"pc": OurPC(pts.copy()), "3d_bbox": OurBox(center.tolist(), wlh.tolist(), q)}
    return ref, ours, center


class TestSamplerLive:
    def _configs(self, extra_ref=None, extra_ours=None):
        base = dict(
            degrees=False,
            data_limit_box=False,
            num_candidates=4,
            model_bb_scale=1.25,
            model_bb_offset=0.0,
            search_bb_scale=1.25,
            search_bb_offset=2.0,
            template_size=256,
            search_size=512,
            point_sample_size=512,
            bb_scale=1.25,
            bb_offset=2.0,
            box_aware=True,
            motion_threshold=0.15,
            use_z=True,
            limit_box=False,
            IoU_space=3,
            up_axis=[0, 0, 1],
        )
        ref_cfg = REF["EasyDict"](dict(base, **(extra_ref or {})))
        from open3dsot_tpu.config import make_config

        our_cfg = make_config(
            dict(base, dataset="synthetic", net_model="m2track",
                 category_name="Car", **(extra_ours or {}))
        )
        return ref_cfg, our_cfg

    @pytest.mark.parametrize("candidate_id", [0, 1])
    def test_siamese_processing(self, candidate_id):
        from open3dsot_tpu.data.sampler import siamese_processing as ours_fn

        ref_cfg, our_cfg = self._configs()
        rng = np.random.default_rng(5)
        f0r, f0o, c0 = _frame(rng, REF["data_classes"])
        f1r, f1o, _ = _frame(rng, REF["data_classes"], around=c0)
        f2r, f2o, _ = _frame(rng, REF["data_classes"], around=c0)
        ref_data = {"first_frame": f0r, "template_frame": f1r,
                    "search_frame": f2r, "candidate_id": candidate_id}
        our_data = {"first_frame": f0o, "template_frame": f1o,
                    "search_frame": f2o, "candidate_id": candidate_id}
        np.random.seed(23)
        want = REF["sampler"].siamese_processing(ref_data, ref_cfg)
        np.random.seed(23)
        got = ours_fn(our_data, our_cfg)
        assert set(want) <= set(got)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(want[k]), np.asarray(got[k]), atol=1e-5, err_msg=k
            )

    @pytest.mark.parametrize("candidate_id", [0, 2])
    def test_motion_processing(self, candidate_id):
        from open3dsot_tpu.data.sampler import motion_processing as ours_fn

        ref_cfg, our_cfg = self._configs()
        rng = np.random.default_rng(9)
        f0r, f0o, c0 = _frame(rng, REF["data_classes"])
        f1r, f1o, _ = _frame(rng, REF["data_classes"], around=c0)
        f2r, f2o, _ = _frame(rng, REF["data_classes"], around=c0)
        ref_data = {"prev_frame": f1r, "this_frame": f2r,
                    "candidate_id": candidate_id}
        our_data = {"prev_frame": f1o, "this_frame": f2o,
                    "candidate_id": candidate_id}
        np.random.seed(31)
        want = REF["sampler"].motion_processing(ref_data, ref_cfg)
        np.random.seed(31)
        got = ours_fn(our_data, our_cfg)
        assert set(want) <= set(got)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(want[k], dtype=np.float64),
                np.asarray(got[k], dtype=np.float64),
                atol=1e-5,
                err_msg=k,
            )


class TestMetricsLive:
    def test_auc_matches_torchmetrics_math(self):
        from open3dsot_tpu.utils.metrics import Precision, Success

        rng = np.random.default_rng(12)
        ious = rng.uniform(0, 1, 97)
        dists = rng.uniform(0, 2.5, 97)

        ref_s = REF["metrics"].TorchSuccess()
        ref_p = REF["metrics"].TorchPrecision()
        ref_s.update(torch.from_numpy(ious))
        ref_p.update(torch.from_numpy(dists))

        our_s, our_p = Success(), Precision()
        our_s.update(ious)
        our_p.update(dists)

        assert abs(float(ref_s.compute()) - our_s.compute()) < 1e-4
        assert abs(float(ref_p.compute()) - our_p.compute()) < 1e-4


class TestM2TrackForwardLive:
    def test_forward_matches_reference_model(self):
        from open3dsot_tpu.config import make_config
        from open3dsot_tpu.import_torch import import_checkpoint
        from open3dsot_tpu.models import get_model

        cfg_dict = dict(
            net_model="m2track", box_aware=True, point_sample_size=64,
            degrees=False, use_z=True, limit_box=False,
        )
        ref_cfg = REF["EasyDict"](cfg_dict)
        torch.manual_seed(0)
        ref_model = REF["m2track"].M2TRACK(ref_cfg)
        # randomize BN stats so eval-mode normalization is non-trivial
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                with torch.no_grad():
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.2)
        ref_model.eval()
        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

        our_cfg = make_config(cfg_dict)
        model = get_model("m2track")(our_cfg)
        variables = import_checkpoint(sd, our_cfg, model=model)

        rng = np.random.default_rng(0)
        n = our_cfg.point_sample_size
        points = rng.normal(size=(2, 2 * n, 5)).astype(np.float32)
        bc = np.abs(rng.normal(size=(2, 2 * n, 9))).astype(np.float32)

        with torch.no_grad():
            want = ref_model({
                "points": torch.from_numpy(points),
                "candidate_bc": torch.from_numpy(bc),
            })

        with jax.default_matmul_precision("highest"):
            got = model.apply(variables, {"points": points, "candidate_bc": bc},
                              train=False)

        np.testing.assert_allclose(
            np.asarray(got["seg_logits"]),
            want["seg_logits"].numpy().transpose(0, 2, 1),
            atol=2e-3,
        )
        for key in ["aux_estimation_boxes", "estimation_boxes", "motion_pred",
                    "motion_cls", "estimation_boxes_prev"]:
            np.testing.assert_allclose(
                np.asarray(got[key]), want[key].numpy(), atol=5e-3, err_msg=key
            )
