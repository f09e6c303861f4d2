"""Data layer: synthetic dataset, samplers, loader."""

import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.data.loader import BatchLoader, collate
from open3dsot_tpu.data.synthetic import SyntheticDataset


def motion_cfg(**over):
    base = dict(
        dataset="synthetic",
        net_model="m2track",
        category_name="Car",
        bb_scale=1.25,
        bb_offset=2,
        point_sample_size=128,
        degrees=False,
        up_axis=[0, 0, 1],
        data_limit_box=True,
        train_type="train_motion",
        num_candidates=2,
        motion_threshold=0.15,
        use_augmentation=False,
        box_aware=True,
        use_z=True,
        limit_box=False,
        IoU_space=3,
        batch_size=4,
        syn_num_tracklets=3,
        syn_tracklet_len=5,
    )
    base.update(over)
    return make_config(base)


def siamese_cfg(**over):
    base = dict(
        dataset="synthetic",
        net_model="p2b",
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
        num_candidates=2,
        box_aware=False,
        use_z=True,
        limit_box=False,
        IoU_space=3,
        batch_size=4,
        syn_num_tracklets=3,
        syn_tracklet_len=5,
    )
    base.update(over)
    return make_config(base)


class TestSynthetic:
    def test_shapes_and_counts(self):
        ds = SyntheticDataset(num_tracklets=2, tracklet_len=4)
        assert ds.get_num_tracklets() == 2
        assert ds.get_num_frames_total() == 8
        frames = ds.get_frames(0, [0, 1])
        assert frames[0]["pc"].points.shape[0] == 3
        assert frames[0]["3d_bbox"].center.shape == (3,)

    def test_deterministic(self):
        a = SyntheticDataset(num_tracklets=1, tracklet_len=2, seed=7)
        b = SyntheticDataset(num_tracklets=1, tracklet_len=2, seed=7)
        assert np.array_equal(a.get_frames(0, [0])[0]["pc"].points,
                              b.get_frames(0, [0])[0]["pc"].points)

    def test_object_points_inside_box(self):
        from open3dsot_tpu.geometry import points_utils

        ds = SyntheticDataset(num_tracklets=1, tracklet_len=1)
        fr = ds.get_frames(0, [0])[0]
        mask = points_utils.points_in_box(fr["3d_bbox"], fr["pc"].points, 1.05)
        assert mask.sum() > 50


class TestMotionSampler:
    def test_sample_keys_and_shapes(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        s = sampler[3]
        n = cfg.point_sample_size
        assert s["points"].shape == (2 * n, 5)
        assert s["seg_label"].shape == (2 * n,)
        assert s["box_label"].shape == (4,)
        assert s["motion_label"].shape == (4,)
        assert s["candidate_bc"].shape == (2 * n, 9)
        assert s["prev_bc"].shape == (n, 9)

    def test_seg_labels_nontrivial(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        s = sampler[0]
        assert 0 < s["seg_label"].sum() < 2 * cfg.point_sample_size

    def test_candidate_zero_unperturbed(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        s = sampler[0]  # candidate 0: ref box == prev gt box
        # prev box canonicalized to ref frame = identity => label ~0
        assert np.allclose(s["box_label_prev"], 0, atol=1e-5)

    def test_len_counts_candidates(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        assert len(sampler) == 3 * 5 * 2


class TestSiameseSampler:
    def test_sample_keys_and_shapes(self):
        cfg = siamese_cfg()
        sampler = get_dataset(cfg, "train_siamese", "train")
        s = sampler[1]
        assert s["template_points"].shape == (64, 3)
        assert s["search_points"].shape == (128, 3)
        assert s["seg_label"].shape == (128,)
        assert s["box_label"].shape == (4,)

    def test_box_aware_adds_boxclouds(self):
        cfg = siamese_cfg(box_aware=True)
        sampler = get_dataset(cfg, "train_siamese", "train")
        s = sampler[0]
        assert s["points2cc_dist_t"].shape == (64, 9)
        assert s["points2cc_dist_s"].shape == (128, 9)


class TestTestSampler:
    def test_returns_whole_tracklet(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "test", "test")
        seq = sampler[0]
        assert len(seq) == 5
        assert "pc" in seq[0] and "3d_bbox" in seq[0]


class TestLoader:
    def test_collate(self):
        samples = [{"a": np.ones(3), "b": 2.0}, {"a": np.zeros(3), "b": 3.0}]
        batch = collate(samples)
        assert batch["a"].shape == (2, 3)
        assert batch["b"].shape == (2,)

    def test_batches_fixed_shape(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        loader = BatchLoader(sampler, batch_size=4, prefetch=2)
        shapes = [b["points"].shape for b in loader]
        assert len(shapes) == len(sampler) // 4
        assert all(s == shapes[0] for s in shapes)

    def test_shuffle_deterministic_per_epoch(self):
        cfg = motion_cfg()
        sampler = get_dataset(cfg, "train_motion", "train")
        l1 = BatchLoader(sampler, batch_size=4, seed=5, prefetch=0)
        l2 = BatchLoader(sampler, batch_size=4, seed=5, prefetch=0)
        assert np.array_equal(l1._indices(), l2._indices())
        l1.set_epoch(1)
        assert not np.array_equal(l1._indices(), l2._indices())
