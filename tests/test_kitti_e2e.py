"""End-to-end rehearsal on a synthetic on-disk KITTI-format dataset.

Generates real KITTI tracking files (label_02 CSVs, calib, velodyne .bin)
with a moving car whose surface carries enough points to satisfy the
samplers' asserts, then drives the FULL production path: kitti loader ->
motion/siamese samplers -> batched trainer step -> tracklet eval.
"""

import os

import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model


def write_kitti_scene(root, scene="0000", n_frames=8, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "velodyne", scene), exist_ok=True)
    os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
    os.makedirs(os.path.join(root, "calib"), exist_ok=True)

    # identity velo<->cam calib
    tr = np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(-1)
    with open(os.path.join(root, "calib", scene + ".txt"), "w") as f:
        f.write("Tr_velo_cam " + " ".join(str(v) for v in tr) + "\n")

    h, w, l = 1.5, 1.7, 4.0
    rows = []
    for t in range(n_frames):
        # camera-frame annotation; with identity calib the velodyne center is
        # (x, y - h/2, z)
        cx, cy, cz = 2.0 + 0.4 * t, 1.0 + 0.1 * t, 10.0
        ry = 0.1 + 0.02 * t
        rows.append(
            f"{t} 1 Car 0 0 0.0 0 0 50 50 {h} {w} {l} {cx} {cy} {cz} {ry}"
        )
        # points on the car surface around the velodyne-frame center
        center_velo = np.array([cx, cy - h / 2, cz])
        local = rng.uniform(-0.5, 0.5, size=(300, 3)) * np.array([l, w, h])
        pts = local + center_velo
        bg = rng.uniform(-1, 1, size=(1500, 3)) * np.array([30, 30, 2]) + np.array(
            [0, 0, 10.0]
        )
        cloud = np.concatenate([pts, bg], axis=0).astype(np.float32)
        cloud4 = np.concatenate(
            [cloud, np.zeros((len(cloud), 1), np.float32)], axis=1
        )
        cloud4.tofile(os.path.join(root, "velodyne", scene, f"{t:06}.bin"))
    with open(os.path.join(root, "label_02", scene + ".txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_e2e"))
    write_kitti_scene(root)
    return root


def m2_cfg(root):
    return make_config(
        dict(
            dataset="kitti",
            path=root,
            net_model="m2track",
            category_name="Car",
            coordinate_mode="velodyne",
            bb_scale=1.25,
            bb_offset=2,
            point_sample_size=128,
            degrees=False,
            up_axis=[0, 0, 1],
            preload_offset=10,
            data_limit_box=True,
            train_type="train_motion",
            train_split="train_tiny",
            val_split="train_tiny",
            test_split="train_tiny",
            num_candidates=2,
            motion_threshold=0.15,
            use_augmentation=True,
            box_aware=True,
            center_weight=2.0,
            angle_weight=10.0,
            seg_weight=0.1,
            bc_weight=1.0,
            motion_cls_seg_weight=0.1,
            use_z=True,
            limit_box=False,
            IoU_space=3,
            batch_size=4,
            epoch=1,
            lr=1e-3,
            optimizer="Adam",
            lr_decay_step=20,
            lr_decay_rate=0.1,
            wd=0.0,
            gradient_clip_val=0.0,
            preloading=True,
            seed=0,
        )
    )


class TestKittiEndToEnd:
    def test_motion_sampler_on_kitti(self, kitti_root):
        cfg = m2_cfg(kitti_root)
        sampler = get_dataset(cfg, "train_motion", cfg.train_split)
        assert len(sampler) == 8 * 2
        s = sampler[3]
        assert s["points"].shape == (256, 5)
        assert 0 < s["seg_label"].sum() < 256

    def test_train_and_eval_on_kitti(self, kitti_root, tmp_path):
        from open3dsot_tpu.tracking.eval import evaluate_dataset
        from open3dsot_tpu.train.trainer import Trainer

        cfg = m2_cfg(kitti_root)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", cfg.train_split)
        trainer = Trainer(model, cfg, work_dir=str(tmp_path))
        state = trainer.fit(train_sampler, None, epochs=1, steps_per_epoch=2)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        test_sampler = get_dataset(cfg, "test", cfg.test_split)
        succ, prec = evaluate_dataset(model, variables, test_sampler, cfg)
        assert 0.0 <= succ <= 100.0
        assert 0.0 <= prec <= 100.0

    def test_siamese_sampler_on_kitti(self, kitti_root):
        cfg = m2_cfg(kitti_root)
        # switch to the siamese pipeline over the same files
        over = cfg.to_dict()
        over.update(
            net_model="bat",
            train_type="train_siamese",
            search_bb_scale=1.25,
            search_bb_offset=2,
            model_bb_scale=1.25,
            model_bb_offset=0,
            template_size=64,
            search_size=128,
            degrees=True,
            box_aware=True,
            use_augmentation=False,
        )
        cfg2 = make_config(over)
        sampler = get_dataset(cfg2, "train_siamese", cfg2.train_split)
        s = sampler[0]
        assert s["template_points"].shape == (64, 3)
        assert s["points2cc_dist_t"].shape == (64, 9)
