"""Real dataset loaders against synthetic on-disk fixtures.

The reference has no loader tests at all; these build miniature KITTI /
Waymo / nuScenes datasets in tmp dirs (correct file formats) and check
tracklet extraction, coordinate transforms, and frame loading.
"""

import json
import os
import pickle

import numpy as np
import pytest




# --------------------------------------------------------------------------
# KITTI fixture
# --------------------------------------------------------------------------
@pytest.fixture()
def kitti_root(tmp_path):
    root = tmp_path / "kitti"
    (root / "velodyne" / "0000").mkdir(parents=True)
    (root / "label_02").mkdir()
    (root / "calib").mkdir()

    # calib: identity velo->cam
    tr = np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(-1)
    with open(root / "calib" / "0000.txt", "w") as f:
        f.write("Tr_velo_cam " + " ".join(str(v) for v in tr) + "\n")

    # two frames, one Car tracklet
    rows = []
    for frame in range(2):
        rows.append(
            f"{frame} 1 Car 0 0 0.0 0 0 50 50 1.5 1.6 3.9 {2.0 + frame} 1.0 10.0 0.1"
        )
    with open(root / "label_02" / "0000.txt", "w") as f:
        f.write("\n".join(rows) + "\n")

    rng = np.random.default_rng(0)
    for frame in range(2):
        pts = rng.uniform(-20, 20, size=(500, 4)).astype(np.float32)
        pts.tofile(root / "velodyne" / "0000" / f"{frame:06}.bin")
    return str(root)


class TestKitti:
    def test_tracklet_and_frames(self, kitti_root):
        from open3dsot_tpu.data.kitti import KittiDataset

        ds = KittiDataset(kitti_root, split="train_tiny", category_name="Car",
                          coordinate_mode="velodyne", preloading=False)
        assert ds.get_num_tracklets() == 1
        assert ds.get_num_frames_tracklet(0) == 2
        frames = ds.get_frames(0, [0, 1])
        assert frames[0]["pc"].points.shape[0] == 3
        box = frames[0]["3d_bbox"]
        # wlh = (width, length, height) from the label
        assert np.allclose(box.wlh, [1.6, 3.9, 1.5])

    def test_velodyne_center_transform(self, kitti_root):
        """With identity calib, velo center = (x, y - h/2, z)."""
        from open3dsot_tpu.data.kitti import KittiDataset

        ds = KittiDataset(kitti_root, split="train_tiny", category_name="Car",
                          coordinate_mode="velodyne", preloading=False)
        box = ds.get_frames(0, [0])[0]["3d_bbox"]
        assert np.allclose(box.center, [2.0, 1.0 - 0.75, 10.0])

    def test_missing_frame_fallback(self, kitti_root):
        from open3dsot_tpu.data.kitti import KittiDataset

        os.remove(os.path.join(kitti_root, "velodyne", "0000", "000001.bin"))
        ds = KittiDataset(kitti_root, split="train_tiny", category_name="Car",
                          coordinate_mode="velodyne", preloading=False)
        frame = ds.get_frames(0, [1])[0]
        assert frame["pc"].points.shape == (3, 1)
        assert np.all(frame["pc"].points == 0)

    def test_preload_cache_roundtrip(self, kitti_root):
        from open3dsot_tpu.data.kitti import KittiDataset

        ds1 = KittiDataset(kitti_root, split="train_tiny", category_name="Car",
                           coordinate_mode="velodyne", preloading=True, preload_offset=10)
        ds2 = KittiDataset(kitti_root, split="train_tiny", category_name="Car",
                           coordinate_mode="velodyne", preloading=True, preload_offset=10)
        a = ds1.get_frames(0, [0])[0]["pc"].points
        b = ds2.get_frames(0, [0])[0]["pc"].points
        assert np.allclose(a, b)


# --------------------------------------------------------------------------
# Waymo fixture
# --------------------------------------------------------------------------
@pytest.fixture()
def waymo_root(tmp_path):
    root = tmp_path / "waymo"
    (root / "lidar").mkdir(parents=True)
    (root / "annos").mkdir()
    rng = np.random.default_rng(1)

    infos = []
    for frame in range(3):
        lidar_rel = f"lidar/seq0_frame{frame}.pkl"
        anno_rel = f"annos/seq0_frame{frame}.pkl"
        pts = rng.uniform(-30, 30, size=(800, 3)).astype(np.float32)
        with open(root / lidar_rel, "wb") as f:
            pickle.dump({"lidars": {"points_xyz": pts},
                         "frame_id": frame, "scene_name": "seq0"}, f)
        with open(root / anno_rel, "wb") as f:
            pickle.dump(
                {
                    "veh_to_global": np.eye(4).reshape(-1),
                    "objects": [
                        {
                            "label": 1,
                            "name": "obj_a",
                            "box": np.array(
                                [1.0 + frame, 2.0, 0.5, 4.0, 1.8, 1.5, 0, 0, 0.3],
                                dtype=np.float32,
                            ),
                        }
                    ],
                },
                f,
            )
        infos.append({"path": str(root / lidar_rel), "anno_path": anno_rel})
    with open(root / "infos_train_01sweeps_filter_zero_gt.pkl", "wb") as f:
        pickle.dump(infos, f)
    return str(root)


class TestWaymo:
    def test_sot_generation_and_loading(self, waymo_root):
        from open3dsot_tpu.data.waymo_data import WaymoDataset

        ds = WaymoDataset(waymo_root, split="train", category_name="Vehicle",
                          preloading=False, preload_offset=-1)
        assert ds.get_num_tracklets() == 1
        assert ds.get_num_frames_tracklet(0) == 3
        frame = ds.get_frames(0, [0])[0]
        box = frame["3d_bbox"]
        # Waymo (l=4.0, w=1.8) swaps into wlh = (w, l, h)
        assert np.allclose(box.wlh, [1.8, 4.0, 1.5])
        assert np.allclose(box.center, [1.0, 2.0, 0.5])
        # heading negated
        theta = box.orientation.radians * box.orientation.axis[-1]
        assert np.isclose(theta, -0.3, atol=1e-6)

    def test_tiny_caps_tracklets(self, waymo_root):
        from open3dsot_tpu.data.waymo_data import WaymoDataset

        ds = WaymoDataset(waymo_root, split="train", category_name="Vehicle",
                          preloading=False, tiny=True, preload_offset=-1)
        assert ds.get_num_tracklets() <= 100

    def test_offline_batch_cli(self, waymo_root):
        """scripts/generate_waymo_sot.py: splits x classes batch driver
        (reference datasets/generate_waymo_sot.py:56-62)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "generate_waymo_sot_cli",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "scripts", "generate_waymo_sot.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main([waymo_root, "--splits", "train",
                  "--classes", "vehicle,pedestrian"])
        with open(os.path.join(waymo_root, "sot_infos_vehicle_train.pkl"),
                  "rb") as f:
            vehicle = pickle.load(f)
        assert set(vehicle) == {"obj_a"} and len(vehicle["obj_a"]) == 3
        # no pedestrian objects in the fixture -> empty dict, still written
        with open(os.path.join(waymo_root, "sot_infos_pedestrian_train.pkl"),
                  "rb") as f:
            assert pickle.load(f) == {}
        # a missing split fails loudly before writing anything
        with pytest.raises(SystemExit):
            mod.main([waymo_root, "--splits", "val"])


# --------------------------------------------------------------------------
# nuScenes fixture (minimal JSON tables)
# --------------------------------------------------------------------------
@pytest.fixture()
def nusc_root(tmp_path):
    root = tmp_path / "nusc"
    version = "v1.0-mini"
    (root / version).mkdir(parents=True)
    (root / "sweeps").mkdir()
    rng = np.random.default_rng(2)

    # one scene, two samples, one instance with a 2-annotation chain
    lidar_files = []
    for i in range(2):
        fn = f"sweeps/lidar_{i}.bin"
        pts = rng.uniform(-20, 20, size=(300, 5)).astype(np.float32)
        pts.tofile(root / fn)
        lidar_files.append(fn)

    tables = {
        "scene": [{"token": "sc0", "name": "scene-0001"}],
        "sample": [
            {"token": f"sa{i}", "scene_token": "sc0", "data": {"LIDAR_TOP": f"sd{i}"}}
            for i in range(2)
        ],
        "sample_data": [
            {
                "token": f"sd{i}",
                "filename": lidar_files[i],
                "is_key_frame": True,
                "calibrated_sensor_token": "cs0",
                "ego_pose_token": f"ep{i}",
            }
            for i in range(2)
        ],
        "calibrated_sensor": [
            {"token": "cs0", "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8]}
        ],
        "ego_pose": [
            {"token": f"ep{i}", "rotation": [1, 0, 0, 0], "translation": [i * 1.0, 0, 0]}
            for i in range(2)
        ],
        "category": [{"token": "cat0", "name": "vehicle.car"}],
        "instance": [
            {
                "token": "inst0",
                "category_token": "cat0",
                "first_annotation_token": "an0",
            }
        ],
        "sample_annotation": [
            {
                "token": "an0",
                "sample_token": "sa0",
                "translation": [5.0, 1.0, 0.5],
                "size": [1.8, 4.2, 1.5],
                "rotation": [1, 0, 0, 0],
                "num_lidar_pts": 30,
                "next": "an1",
            },
            {
                "token": "an1",
                "sample_token": "sa1",
                "translation": [6.0, 1.0, 0.5],
                "size": [1.8, 4.2, 1.5],
                "rotation": [1, 0, 0, 0],
                "num_lidar_pts": 25,
                "next": "",
            },
        ],
    }
    for name, rows in tables.items():
        with open(root / version / f"{name}.json", "w") as f:
            json.dump(rows, f)
    with open(root / "splits.json", "w") as f:
        json.dump({"mini_train": ["scene-0001"]}, f)
    return str(root)


class TestNuScenes:
    def test_chain_walk_and_transforms(self, nusc_root):
        from open3dsot_tpu.data.nuscenes_data import NuScenesDataset

        ds = NuScenesDataset(nusc_root, split="mini_train", category_name="Car",
                             version="v1.0-mini", preloading=False, min_points=1)
        assert ds.get_num_tracklets() == 1
        assert ds.get_num_frames_tracklet(0) == 2
        frame = ds.get_frames(0, [1])[0]
        assert np.allclose(frame["3d_bbox"].center, [6.0, 1.0, 0.5])
        # lidar moved by calibrated_sensor z then ego x
        assert frame["pc"].points.shape[0] == 3

    def test_min_points_filter(self, nusc_root):
        from open3dsot_tpu.data.nuscenes_data import NuScenesDataset

        ds = NuScenesDataset(nusc_root, split="mini_train", category_name="Car",
                             version="v1.0-mini", preloading=False, min_points=100)
        assert ds.get_num_tracklets() == 0


class TestNuScenesSplits:
    """Vendored devkit-free split constants (data/nuscenes_splits.py)."""

    def test_mini_splits_vendored(self):
        from open3dsot_tpu.data.nuscenes_splits import get_split_scenes

        mt = get_split_scenes("mini_train")
        mv = get_split_scenes("mini_val")
        assert len(mt) == 8 and len(mv) == 2
        assert "scene-0061" in mt and "scene-0103" in mv
        assert not set(mt) & set(mv)

    @staticmethod
    def _plausible_full_table():
        """Synthetic table with the published v1.0 cardinalities
        (700/150/150, train = train_detect + train_track)."""
        names = [f"scene-{i:04d}" for i in range(1000)]
        return {"train_detect": names[:350], "train_track": names[350:700],
                "val": names[700:850], "test": names[850:1000]}

    def test_full_json_vendoring(self, tmp_path, monkeypatch):
        from open3dsot_tpu.data import nuscenes_splits as ns

        table = self._plausible_full_table()
        full = tmp_path / "nuscenes_splits_full.json"
        with open(full, "w") as f:
            json.dump(table, f)
        monkeypatch.setattr(ns, "_FULL_JSON", str(full))
        assert ns.get_split_scenes("val") == table["val"]
        assert ns.get_split_scenes("train_track") == table["train_track"]
        # devkit semantics: train = train_detect + train_track
        assert ns.get_split_scenes("train") == (
            table["train_detect"] + table["train_track"])

    @pytest.mark.parametrize("corruption", ["size", "dup", "name", "overlap"])
    def test_full_json_corruption_rejected(self, tmp_path, monkeypatch,
                                           corruption):
        """A corrupted vendored full-split file fails loudly instead of
        silently skewing evaluation."""
        from open3dsot_tpu.data import nuscenes_splits as ns

        table = self._plausible_full_table()
        if corruption == "size":
            table["val"] = table["val"][:-1]  # 149 scenes
        elif corruption == "dup":
            table["val"][1] = table["val"][0]
        elif corruption == "name":
            table["val"][0] = "scene-12"  # malformed
        elif corruption == "overlap":
            table["test"][0] = table["val"][0]
        full = tmp_path / "nuscenes_splits_full.json"
        with open(full, "w") as f:
            json.dump(table, f)
        monkeypatch.setattr(ns, "_FULL_JSON", str(full))
        with pytest.raises(ValueError):
            ns.get_split_scenes("val")

    def test_user_splits_json_allows_custom_sizes(self, tmp_path):
        """{dataroot}/splits.json may carry custom subsets — structural
        checks only, no cardinality enforcement."""
        from open3dsot_tpu.data.nuscenes_splits import get_split_scenes

        with open(tmp_path / "splits.json", "w") as f:
            json.dump({"val": ["scene-0004", "scene-0007"]}, f)
        assert get_split_scenes("val", dataroot=str(tmp_path)) == [
            "scene-0004", "scene-0007"]
        with open(tmp_path / "splits.json", "w") as f:
            json.dump({"val": ["scene-0004", "scene-0004"]}, f)
        with pytest.raises(ValueError):
            get_split_scenes("val", dataroot=str(tmp_path))

    def test_unknown_split_raises_with_script_pointer(self):
        from open3dsot_tpu.data.nuscenes_splits import get_split_scenes

        with pytest.raises(RuntimeError, match="make_nuscenes_splits"):
            get_split_scenes("val")  # full lists not vendored in this checkout

    def test_loader_devkit_free_no_splits_json(self, nusc_root):
        """NuScenesDataset resolves the mini split from the in-tree
        constants with no devkit installed and no splits.json on disk."""
        import os

        from open3dsot_tpu.data.nuscenes_data import NuScenesDataset

        os.remove(os.path.join(nusc_root, "splits.json"))
        # put the fixture scene in the REAL vendored mini_train
        scene_path = os.path.join(nusc_root, "v1.0-mini", "scene.json")
        with open(scene_path) as f:
            scenes = json.load(f)
        scenes[0]["name"] = "scene-0061"
        with open(scene_path, "w") as f:
            json.dump(scenes, f)

        ds = NuScenesDataset(nusc_root, split="mini_train", category_name="Car",
                             version="v1.0-mini", preloading=False, min_points=1)
        assert ds.get_num_tracklets() == 1
