"""On-device training-sample builder vs the host numpy sampler.

The deterministic surfaces (crop bounds, canonicalization, labels, masks,
BoxClouds) must agree exactly with motion_processing; the random surfaces
(resampling, offsets, augmentation) are distribution-equivalent and are
checked via invariants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data.device_sampler import (
    RawMotionSampler,
    make_motion_builder,
    random_select,
)
from open3dsot_tpu.data.sampler import motion_processing
from open3dsot_tpu.geometry.data_classes import Box, PointCloud
from open3dsot_tpu.geometry.quaternion import Quaternion


def _cfg(**over):
    base = dict(
        dataset="synthetic",
        net_model="m2track",
        category_name="Car",
        point_sample_size=64,
        bb_scale=1.0,
        bb_offset=0.1,
        degrees=False,
        up_axis=[0, 0, 1],
        train_type="train_motion",
        num_candidates=2,
        box_aware=True,
        use_augmentation=False,
        data_limit_box=False,
        motion_threshold=0.15,
        syn_num_tracklets=2,
        syn_tracklet_len=6,
        seed=0,
    )
    base.update(over)
    return make_config(base)


def _frame(points_w, box):
    return {"pc": PointCloud(points_w.T.copy()), "3d_bbox": box}


def _mk_box(center, theta, wlh):
    return Box(list(center), list(wlh), Quaternion(axis=[0, 0, 1], radians=theta))


def test_deterministic_case_matches_host():
    """candidate 0 (ref box == prev box), no augmentation, and exactly n
    points inside each subwindow -> both paths are deterministic and must
    agree to float tolerance."""
    cfg = _cfg()
    n = cfg.point_sample_size
    rng = np.random.default_rng(3)
    wlh = np.array([1.8, 4.2, 1.6], np.float32)
    prev_box = _mk_box([10.0, -4.0, 0.5], 0.7, wlh)
    this_box = _mk_box([10.4, -3.8, 0.55], 0.8, wlh)

    # n points strictly inside the prev-box subwindow (local coords), half
    # inside the box itself so seg labels are non-trivial
    half = np.array([wlh[1], wlh[0], wlh[2]]) * cfg.bb_scale / 2 + cfg.bb_offset
    local = (rng.random((n, 3)) * 2 - 1) * (half * 0.95)
    local[: n // 2] *= 0.2  # cluster half the points near the center
    R = prev_box.rotation_matrix
    world_prev = local @ R.T + prev_box.center
    world_this = (local * 0.9) @ R.T + prev_box.center

    data = {
        "prev_frame": _frame(world_prev, prev_box),
        "this_frame": _frame(world_this, this_box),
        "candidate_id": 0,
    }
    host = motion_processing(data, cfg)

    raw = {
        "prev_pts": jnp.asarray(world_prev, jnp.float32)[None],
        "prev_valid": jnp.ones((1, n), bool),
        "this_pts": jnp.asarray(world_this, jnp.float32)[None],
        "this_valid": jnp.ones((1, n), bool),
        "prev_box": jnp.asarray(
            np.append(prev_box.center, 0.7), jnp.float32)[None],
        "this_box": jnp.asarray(
            np.append(this_box.center, 0.8), jnp.float32)[None],
        "wlh": jnp.asarray(wlh)[None],
        "candidate_zero": jnp.asarray([True]),
    }
    build = make_motion_builder(cfg)
    dev = jax.jit(build)(raw, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(dev["points"][0]), host["points"], atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(dev["seg_label"][0]), host["seg_label"]
    )
    for k in ("box_label", "box_label_prev", "motion_label"):
        np.testing.assert_allclose(
            np.asarray(dev[k][0]), host[k], atol=2e-5, rtol=1e-5
        )
    assert int(dev["motion_state_label"][0]) == int(host["motion_state_label"])
    np.testing.assert_allclose(np.asarray(dev["bbox_size"][0]), host["bbox_size"])
    for k in ("prev_bc", "this_bc", "candidate_bc"):
        np.testing.assert_allclose(
            np.asarray(dev[k][0]), host[k], atol=2e-4, rtol=1e-4
        )


@pytest.mark.parametrize("m,n", [(48, 16), (16, 16), (7, 16), (2, 16)])
def test_random_select_choice_semantics(m, n):
    P = 128
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((1, P, 3)), jnp.float32)
    valid = jnp.asarray((np.arange(P) % 2 == 0) & (np.arange(P) < 2 * m))[None]
    assert int(valid.sum()) == m
    sel = np.asarray(random_select(pts, valid, n, jax.random.PRNGKey(1))[0])
    valid_rows = np.asarray(pts[0])[np.asarray(valid[0])]
    if m <= 2:
        assert np.all(sel == 0.0)
        return
    # every selected row is one of the valid rows
    d = np.abs(sel[:, None, :] - valid_rows[None, :, :]).sum(-1).min(1)
    assert np.max(d) < 1e-6
    if m > n:  # without replacement: all distinct
        assert len({tuple(r) for r in sel.round(5)}) == n
    if m == n:  # identity in index order
        np.testing.assert_allclose(sel, valid_rows)


def test_raw_sampler_and_jit_build_end_to_end():
    cfg = _cfg(point_sample_size=32, use_augmentation=True, num_candidates=2)
    from open3dsot_tpu.data import get_dataset

    ds = get_dataset(cfg, "train_motion", "train").dataset  # unwrap sampler
    raw_sampler = RawMotionSampler(ds, cfg, max_raw_points=128)
    assert len(raw_sampler) == raw_sampler.num_annos * 2
    from open3dsot_tpu.data.loader import collate

    batch = collate([raw_sampler[i] for i in [0, 1, 5, 7]])
    raw = {k: jnp.asarray(v) for k, v in batch.items()}
    build = jax.jit(make_motion_builder(cfg))
    out = build(raw, jax.random.PRNGKey(7))
    n = cfg.point_sample_size
    assert out["points"].shape == (4, 2 * n, 5)
    assert out["seg_label"].shape == (4, 2 * n)
    assert out["candidate_bc"].shape == (4, 2 * n, 9)
    pts = np.asarray(out["points"])
    # timestamp channels: 0.0 first half, 0.1 second half
    assert np.all(pts[:, :n, 3] == 0.0) and np.allclose(pts[:, n:, 3], 0.1)
    # prev mask soft values for candidate!=0 rows, hard for candidate 0
    cand0 = np.asarray(raw["candidate_zero"])
    for b in range(4):
        vals = np.unique(pts[b, :n, 4]).astype(np.float64)
        allowed = [0.0, 1.0] if cand0[b] else [0.2, 0.8]
        assert all(any(abs(v - a) < 1e-6 for a in allowed) for v in vals), vals
    assert np.allclose(pts[:, n:, 4], 0.5)


def test_augmentation_preserves_point_count_and_moves_box():
    cfg = _cfg(use_augmentation=True)
    from open3dsot_tpu.data.device_sampler import _augment

    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)) * 3, jnp.float32)
    valid = jnp.ones((2, 64), bool)
    box = jnp.asarray([[0.0, 0, 0, 0.3], [1.0, 2, 0, -0.5]], jnp.float32)
    wlh = jnp.asarray([[2.0, 4, 2], [2.0, 4, 2]], jnp.float32)
    new_pts, new_box = _augment(pts, valid, box, wlh, jax.random.PRNGKey(3))
    assert new_pts.shape == pts.shape
    # out-of-box points untouched
    from open3dsot_tpu.geometry import rigid

    mask = np.asarray(rigid.points_in_box(pts, box, wlh, 1.25))
    np.testing.assert_allclose(
        np.asarray(new_pts)[~mask], np.asarray(pts)[~mask]
    )
    # box moved but stayed near (|t| <= 0.3*sqrt(3), theta may flip by pi)
    d = np.linalg.norm(np.asarray(new_box[:, :3] - box[:, :3]), axis=-1)
    assert np.all(d <= 0.3 * np.sqrt(3) + 1e-6)


def test_trainer_fit_with_device_sampler(tmp_path):
    """End-to-end: Trainer.fit with device_sampler=True swaps in the raw
    sampler and builds samples inside the jitted step."""
    from tests.test_trainer import cfg_for_trainer
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import Trainer

    cfg = cfg_for_trainer(tmp_path, device_sampler=True, max_raw_points=128,
                          box_aware=True, use_augmentation=True, bc_weight=1.0)
    model = get_model("m2track")(cfg)
    train_sampler = get_dataset(cfg, "train_motion", "train")
    trainer = Trainer(model, cfg, work_dir=str(tmp_path))
    state = trainer.fit(train_sampler, val_sampler=None, epochs=1)
    assert int(state.step) > 0
    assert np.isfinite(trainer.history[-1]["loss"])


def test_siamese_deterministic_case_matches_host():
    """Siamese builder vs host siamese_processing: candidate 0 (template and
    search offsets both zero when num_candidates > 1), no augmentation,
    crop counts exactly equal to the template/search sizes."""
    from open3dsot_tpu.data.device_sampler import make_siamese_builder
    from open3dsot_tpu.data.sampler import siamese_processing

    t_size, s_size = 48, 64
    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=t_size, search_size=s_size,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        degrees=True, up_axis=[0, 0, 1], data_limit_box=False,
        train_type="train_siamese", num_candidates=4, box_aware=True,
        use_augmentation=False, syn_num_tracklets=2, syn_tracklet_len=4,
        seed=0,
    ))
    rng = np.random.default_rng(11)
    wlh = np.array([1.7, 4.0, 1.5], np.float32)
    first_box = _mk_box([2.0, 1.0, 0.2], 0.4, wlh)
    tmpl_box = _mk_box([2.5, 1.5, 0.25], 0.5, wlh)
    srch_box = _mk_box([3.0, 2.0, 0.3], 0.6, wlh)

    def pts_inside(box, count, scale, offset, squeeze=0.9):
        half = (np.array([wlh[1], wlh[0], wlh[2]]) * scale / 2 + offset) * squeeze
        local = (rng.random((count, 3)) * 2 - 1) * half
        local[: count // 2] *= 0.15  # some points inside the box itself
        return local @ box.rotation_matrix.T + box.center

    n_first, n_tmpl = 20, t_size - 20
    w_first = pts_inside(first_box, n_first, cfg.model_bb_scale, cfg.model_bb_offset)
    w_tmpl = pts_inside(tmpl_box, n_tmpl, cfg.model_bb_scale, cfg.model_bb_offset)
    w_srch = pts_inside(srch_box, s_size, cfg.search_bb_scale, cfg.search_bb_offset)

    host = siamese_processing({
        "first_frame": _frame(w_first, first_box),
        "template_frame": _frame(w_tmpl, tmpl_box),
        "search_frame": _frame(w_srch, srch_box),
        "candidate_id": 0,
    }, cfg)

    P = 80

    def pad(w):
        out = np.zeros((P, 3), np.float32)
        out[: len(w)] = w
        v = np.zeros((P,), bool)
        v[: len(w)] = True
        return out[None], v[None]

    fp, fv = pad(w_first)
    tp, tv = pad(w_tmpl)
    sp, sv = pad(w_srch)
    raw = {
        "first_pts": jnp.asarray(fp), "first_valid": jnp.asarray(fv),
        "template_pts": jnp.asarray(tp), "template_valid": jnp.asarray(tv),
        "search_pts": jnp.asarray(sp), "search_valid": jnp.asarray(sv),
        "first_box": jnp.asarray(np.append(first_box.center, 0.4), jnp.float32)[None],
        "template_box": jnp.asarray(np.append(tmpl_box.center, 0.5), jnp.float32)[None],
        "search_box": jnp.asarray(np.append(srch_box.center, 0.6), jnp.float32)[None],
        "wlh": jnp.asarray(wlh)[None],
        "candidate_zero": jnp.asarray([True]),
    }
    dev = jax.jit(make_siamese_builder(cfg))(raw, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(dev["template_points"][0]), host["template_points"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(dev["search_points"][0]), host["search_points"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(dev["box_label"][0]), host["box_label"], atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(dev["seg_label"][0]), host["seg_label"])
    np.testing.assert_allclose(np.asarray(dev["bbox_size"][0]), host["bbox_size"])
    for k in ("points2cc_dist_t", "points2cc_dist_s"):
        np.testing.assert_allclose(
            np.asarray(dev[k][0]), host[k], atol=2e-4, rtol=1e-4)


def test_trainer_fit_siamese_device_sampler(tmp_path):
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import Trainer

    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=32, search_size=64,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        degrees=True, up_axis=[0, 0, 1], data_limit_box=True,
        train_type="train_siamese", num_candidates=2, box_aware=True,
        use_augmentation=True, feature_channel=16, hidden_channel=16,
        out_channel=16, vote_channel=16, num_proposal=8, k=2, bc_channel=9,
        use_fps=True, normalize_xyz=False,
        objectiveness_weight=1.0, box_weight=0.2, seg_weight=0.1,
        vote_weight=1.0, bc_weight=1.0,
        batch_size=4, epoch=1, lr=1e-3, optimizer="Adam",
        lr_decay_step=20, lr_decay_rate=0.1, wd=0.0, gradient_clip_val=0.0,
        log_dir=str(tmp_path), syn_num_tracklets=2, syn_tracklet_len=4,
        seed=0, device_sampler=True, max_raw_points=128,
    ))
    model = get_model("bat")(cfg)
    sampler = get_dataset(cfg, "train_siamese", "train")
    trainer = Trainer(model, cfg, work_dir=str(tmp_path))
    state = trainer.fit(sampler, val_sampler=None, epochs=1)
    assert int(state.step) > 0
    assert np.isfinite(trainer.history[-1]["loss"])


def test_motion_builder_camera_mode_equivariance():
    """Camera-mode (A = Rx(pi/2), up [0,-1,0]) device building: rotating the
    whole world by A and passing A must yield EXACTLY the same box-local
    outputs as the z-up build — every produced quantity is box-frame."""
    from open3dsot_tpu.geometry import rigid

    cfg = _cfg()
    n = cfg.point_sample_size
    rng = np.random.default_rng(9)
    wlh = np.array([1.6, 3.8, 1.5], np.float32)
    A = np.asarray(rigid.up_frame([0, -1, 0]))

    half = np.array([wlh[1], wlh[0], wlh[2]]) * cfg.bb_scale / 2 + cfg.bb_offset
    local = (rng.random((n, 3)) * 2 - 1) * (half * 0.9)
    prev_c, prev_t = np.array([4.0, 2.0, 0.3]), 0.45
    this_c, this_t = np.array([4.3, 2.2, 0.35]), 0.55
    Rz = np.array([[np.cos(prev_t), -np.sin(prev_t), 0],
                   [np.sin(prev_t), np.cos(prev_t), 0], [0, 0, 1]])
    w_prev = local @ Rz.T + prev_c
    w_this = (local * 0.85) @ Rz.T + prev_c

    def raw_for(world_pts_prev, world_pts_this, pc, tc, Abasis):
        return {
            "prev_pts": jnp.asarray(world_pts_prev, jnp.float32)[None],
            "prev_valid": jnp.ones((1, n), bool),
            "this_pts": jnp.asarray(world_pts_this, jnp.float32)[None],
            "this_valid": jnp.ones((1, n), bool),
            "prev_box": jnp.asarray(np.append(pc, prev_t), jnp.float32)[None],
            "this_box": jnp.asarray(np.append(tc, this_t), jnp.float32)[None],
            "wlh": jnp.asarray(wlh)[None],
            "candidate_zero": jnp.asarray([True]),
        }

    from open3dsot_tpu.data.device_sampler import make_motion_builder

    out_z = jax.jit(make_motion_builder(cfg))(
        raw_for(w_prev, w_this, prev_c, this_c, None), jax.random.PRNGKey(0))
    out_cam = jax.jit(make_motion_builder(cfg, A=jnp.asarray(A, jnp.float32)))(
        raw_for(w_prev @ A.T, w_this @ A.T, A @ prev_c, A @ this_c, A),
        jax.random.PRNGKey(0))

    for k in ("points", "seg_label", "box_label", "box_label_prev",
              "motion_label", "candidate_bc"):
        np.testing.assert_allclose(
            np.asarray(out_cam[k], np.float32),
            np.asarray(out_z[k], np.float32), atol=3e-5,
            err_msg=k,
        )


def test_theta_wrap_near_pi_matches_host():
    """Headings crossing the +/-pi cut: raw-subtraction theta labels must
    wrap into (-pi, pi] like the host quaternion extraction (ADVICE r2,
    high). prev theta = 3.1, this theta = -3.1 -> true relative rotation is
    +0.083 rad, NOT -6.2."""
    cfg = _cfg()
    n = cfg.point_sample_size
    rng = np.random.default_rng(11)
    wlh = np.array([1.8, 4.2, 1.6], np.float32)
    prev_t, this_t = 3.1, -3.1
    prev_box = _mk_box([10.0, -4.0, 0.5], prev_t, wlh)
    this_box = _mk_box([10.4, -3.8, 0.55], this_t, wlh)

    half = np.array([wlh[1], wlh[0], wlh[2]]) * cfg.bb_scale / 2 + cfg.bb_offset
    local = (rng.random((n, 3)) * 2 - 1) * (half * 0.95)
    R = prev_box.rotation_matrix
    world_prev = local @ R.T + prev_box.center
    world_this = (local * 0.9) @ R.T + prev_box.center

    data = {
        "prev_frame": _frame(world_prev, prev_box),
        "this_frame": _frame(world_this, this_box),
        "candidate_id": 0,
    }
    host = motion_processing(data, cfg)

    raw = {
        "prev_pts": jnp.asarray(world_prev, jnp.float32)[None],
        "prev_valid": jnp.ones((1, n), bool),
        "this_pts": jnp.asarray(world_this, jnp.float32)[None],
        "this_valid": jnp.ones((1, n), bool),
        "prev_box": jnp.asarray(
            np.append(prev_box.center, prev_t), jnp.float32)[None],
        "this_box": jnp.asarray(
            np.append(this_box.center, this_t), jnp.float32)[None],
        "wlh": jnp.asarray(wlh)[None],
        "candidate_zero": jnp.asarray([True]),
    }
    dev = jax.jit(make_motion_builder(cfg))(raw, jax.random.PRNGKey(0))

    # the un-wrapped difference would be -6.2; host wraps to ~+0.083
    assert abs(float(host["motion_label"][3]) - 0.0832) < 1e-3
    for k in ("box_label", "box_label_prev", "motion_label"):
        np.testing.assert_allclose(
            np.asarray(dev[k][0]), host[k], atol=2e-4, rtol=1e-4, err_msg=k
        )


def test_wrap_angle_range_and_values():
    from open3dsot_tpu.geometry import rigid

    t = jnp.asarray([0.0, np.pi, -np.pi, 6.25, -6.25, 2 * np.pi, 3.5, -3.5])
    w = np.asarray(rigid.wrap_angle(t))
    assert np.all(w > -np.pi - 1e-6) and np.all(w <= np.pi + 1e-6)
    np.testing.assert_allclose(
        w,
        [0.0, np.pi, np.pi, 6.25 - 2 * np.pi, 2 * np.pi - 6.25, 0.0,
         3.5 - 2 * np.pi, 2 * np.pi - 3.5],
        atol=1e-6,
    )


def test_augment_wraps_box_theta():
    """Flip augmentation adds pi to theta; the result must stay in
    (-pi, pi] so downstream raw-subtraction label math can't go off by
    2*pi."""
    from open3dsot_tpu.data.device_sampler import _augment

    rng = np.random.default_rng(7)
    B = 16
    pts = jnp.asarray(rng.standard_normal((B, 64, 3)) * 3, jnp.float32)
    valid = jnp.ones((B, 64), bool)
    # thetas right at the +/-pi cut so any flip without wrapping escapes
    theta0 = np.where(np.arange(B) % 2 == 0, 3.05, -3.05)
    box = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((B, 3)).astype(np.float32),
             theta0[:, None].astype(np.float32)], axis=1))
    wlh = jnp.asarray(np.tile([2.0, 4.0, 2.0], (B, 1)), jnp.float32)
    flipped = False
    for s in range(4):
        _, new_box = _augment(pts, valid, box, wlh, jax.random.PRNGKey(s))
        th = np.asarray(new_box[:, 3])
        assert np.all(th > -np.pi - 1e-6) and np.all(th <= np.pi + 1e-6)
        flipped = flipped or np.any(np.abs(th - theta0) > 1.0)
    assert flipped  # at least one flip branch actually exercised


class TestRawTransferQuant:
    """int16 raw-frame transfer packing on the training path
    (config.transfer_quant + device_sampler): pack_raw_batch /
    dequant_builder / quantize_per_sample."""

    def test_quantize_per_sample_roundtrip_and_ranges(self):
        from open3dsot_tpu.data.device_sampler import quantize_per_sample

        rng = np.random.default_rng(0)
        pts = np.zeros((3, 64, 3), np.float32)
        valid = np.zeros((3, 64), bool)
        # sample 0: near origin; sample 1: far away (global frame);
        # sample 2: empty (all padding)
        pts[0, :40] = rng.normal(size=(40, 3)) * 5
        valid[0, :40] = True
        pts[1, :40] = rng.normal(size=(40, 3)) * 5 + 700
        valid[1, :40] = True
        q, scale, off = quantize_per_sample(pts, valid)
        deq = q.astype(np.float32) * scale[:, None, None] + off[:, None, :]
        for b in range(2):
            v = valid[b]
            assert np.abs(deq[b, v] - pts[b, v]).max() <= scale[b] * 0.501
            # per-sample range: the far sample's step is NOT inflated by
            # its distance from the origin
            assert scale[b] <= 5 * 4 / 32766.0 * 2
        assert np.isfinite(deq).all()

    def test_dequant_builder_matches_unpacked(self):
        """The packed+dequantized path must reproduce the exact builder
        outputs to quantization tolerance (same key, same randoms)."""
        from open3dsot_tpu.data import get_dataset
        from open3dsot_tpu.data.device_sampler import (
            dequant_builder,
            pack_raw_batch,
        )
        from open3dsot_tpu.data.loader import collate

        cfg = _cfg(point_sample_size=32, use_augmentation=True,
                   num_candidates=2)
        ds = get_dataset(cfg, "train_motion", "train").dataset
        raw_sampler = RawMotionSampler(ds, cfg, max_raw_points=128)
        batch = collate([raw_sampler[i] for i in [0, 1, 5, 7]])
        build = jax.jit(make_motion_builder(cfg))
        build_q = jax.jit(dequant_builder(make_motion_builder(cfg)))
        key = jax.random.PRNGKey(7)
        out = build({k: jnp.asarray(v) for k, v in batch.items()}, key)
        packed = pack_raw_batch(batch)
        assert packed["prev_pts"].dtype == np.int16
        out_q = build_q({k: jnp.asarray(v) for k, v in packed.items()}, key)
        assert set(out) == set(out_q)
        # continuous channels: within a few quantization steps
        np.testing.assert_allclose(
            np.asarray(out_q["points"])[..., :3],
            np.asarray(out["points"])[..., :3], atol=5e-3)
        # discrete labels: near-total agreement (only boundary points of the
        # in-box tests can flip under <=2mm perturbation)
        seg_a = np.asarray(out["seg_label"])
        seg_b = np.asarray(out_q["seg_label"])
        assert (seg_a == seg_b).mean() > 0.97
        np.testing.assert_allclose(
            np.asarray(out_q["box_label"]), np.asarray(out["box_label"]),
            atol=1e-2)

    def test_trainer_fit_with_raw_transfer_quant(self, tmp_path):
        from tests.test_trainer import cfg_for_trainer
        from open3dsot_tpu.data import get_dataset
        from open3dsot_tpu.models import get_model
        from open3dsot_tpu.train.trainer import Trainer

        cfg = cfg_for_trainer(tmp_path, device_sampler=True,
                              max_raw_points=128, box_aware=True,
                              bc_weight=1.0, transfer_quant="int16")
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        trainer = Trainer(model, cfg, work_dir=str(tmp_path))
        state = trainer.fit(train_sampler, val_sampler=None, epochs=1)
        assert int(state.step) > 0
        assert np.isfinite(trainer.history[-1]["loss"])


def test_trainer_fit_siamese_raw_transfer_quant(tmp_path):
    """Siamese raw path (first/template/search keys) under int16 packing."""
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import Trainer

    cfg = make_config(dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=32, search_size=64,
        model_bb_scale=1.25, model_bb_offset=0.0,
        search_bb_scale=1.25, search_bb_offset=2.0,
        degrees=True, up_axis=[0, 0, 1], data_limit_box=True,
        train_type="train_siamese", num_candidates=2, box_aware=True,
        use_augmentation=True, feature_channel=16, hidden_channel=16,
        out_channel=16, vote_channel=16, num_proposal=8, k=2, bc_channel=9,
        use_fps=True, normalize_xyz=False,
        objectiveness_weight=1.0, box_weight=0.2, seg_weight=0.1,
        vote_weight=1.0, bc_weight=1.0,
        batch_size=4, epoch=1, lr=1e-3, optimizer="Adam",
        lr_decay_step=20, lr_decay_rate=0.1, wd=0.0, gradient_clip_val=0.0,
        log_dir=str(tmp_path), syn_num_tracklets=2, syn_tracklet_len=4,
        seed=0, device_sampler=True, max_raw_points=128,
        transfer_quant="int16",
    ))
    model = get_model("bat")(cfg)
    sampler = get_dataset(cfg, "train_siamese", "train")
    trainer = Trainer(model, cfg, work_dir=str(tmp_path))
    state = trainer.fit(sampler, val_sampler=None, epochs=1)
    assert int(state.step) > 0
    assert np.isfinite(trainer.history[-1]["loss"])
