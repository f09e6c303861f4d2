"""Mesh-sharded scan-tracker eval on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.parallel import make_mesh
from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker


@pytest.fixture(scope="module")
def setup():
    cfg = make_config(
        dict(
            dataset="synthetic",
            net_model="m2track",
            category_name="Car",
            bb_scale=1.25,
            bb_offset=2,
            point_sample_size=64,
            degrees=False,
            up_axis=[0, 0, 1],
            data_limit_box=True,
            train_type="train_motion",
            motion_threshold=0.15,
            box_aware=False,
            use_z=True,
            limit_box=False,
            IoU_space=3,
            syn_num_tracklets=4,
            syn_tracklet_len=4,
            seed=0,
        )
    )
    model = get_model("m2track")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    return cfg, model, variables


class TestMeshScanEval:
    def test_sharded_matches_unsharded(self, setup):
        cfg, model, variables = setup
        assert len(jax.devices()) >= 8
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[i] for i in range(4)]

        plain = M2ScanTracker(model, variables, cfg, max_points=512)
        mesh = make_mesh(8)
        sharded = M2ScanTracker(model, variables, cfg, max_points=512, mesh=mesh)

        a = plain.track_batch(seqs)
        b = sharded.track_batch(seqs)  # batch 4 padded to 8 across devices
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-4)

    def test_matching_sharded_matches_unsharded(self):
        from open3dsot_tpu.tracking.scan_matching import MatchScanTracker

        cfg = make_config(
            dict(
                dataset="synthetic", net_model="p2b", category_name="Car",
                template_size=64, search_size=128, point_sample_size=64,
                feature_channel=32, hidden_channel=32, out_channel=32,
                vote_channel=32, num_proposal=16, bb_scale=1.0, bb_offset=2,
                model_bb_scale=1.25, model_bb_offset=2.0,
                search_bb_scale=1.25, search_bb_offset=2.0,
                shape_aggregation="firstandprevious",
                reference_BB="previous_result", degrees=True, use_z=False,
                limit_box=False, IoU_space=3, up_axis=[0, 0, 1],
                syn_num_tracklets=3, syn_tracklet_len=4, seed=0,
            )
        )
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[i] for i in range(3)]

        plain = MatchScanTracker(model, variables, cfg, max_points=512,
                                 first_crop_points=128)
        mesh = make_mesh(8)
        sharded = MatchScanTracker(model, variables, cfg, max_points=512,
                                   first_crop_points=128, mesh=mesh)

        a = plain.track_batch(seqs)
        b = sharded.track_batch(seqs)  # batch 3 padded to 8 across devices
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-4)

    def test_matching_sharded_with_fused_kernels(self):
        """The mesh path uses shard_map, so the fused Pallas eval SA kernel
        (interpret on CPU) runs per device — jit-sharding GSPMD could not
        partition its custom call."""
        from open3dsot_tpu.tracking.scan_matching import MatchScanTracker

        cfg = make_config(
            dict(
                dataset="synthetic", net_model="p2b", category_name="Car",
                template_size=64, search_size=128, point_sample_size=64,
                feature_channel=32, hidden_channel=32, out_channel=32,
                vote_channel=32, num_proposal=16, bb_scale=1.0, bb_offset=2,
                model_bb_scale=1.25, model_bb_offset=2.0,
                search_bb_scale=1.25, search_bb_offset=2.0,
                shape_aggregation="firstandprevious",
                reference_BB="previous_result", degrees=True, use_z=False,
                limit_box=False, IoU_space=3, up_axis=[0, 0, 1],
                syn_num_tracklets=2, syn_tracklet_len=4, seed=0,
                fused_sa=True,
            )
        )
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[i] for i in range(2)]

        plain = MatchScanTracker(model, variables, cfg, max_points=256,
                                 first_crop_points=64)
        mesh = make_mesh(8)
        sharded = MatchScanTracker(model, variables, cfg, max_points=256,
                                   first_crop_points=64, mesh=mesh)
        a = plain.track_batch(seqs)
        b = sharded.track_batch(seqs)
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-4)
