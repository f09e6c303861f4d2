"""Trainer loop: fit + validate + checkpoint + resume on synthetic data."""

import os

import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.train.trainer import Trainer


def cfg_for_trainer(tmp_path, **over):
    base = dict(
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
        num_candidates=1,
        motion_threshold=0.15,
        box_aware=False,
        use_second_stage=False,
        use_prev_refinement=False,
        use_motion_cls=False,
        center_weight=2.0,
        angle_weight=10.0,
        seg_weight=0.1,
        motion_cls_seg_weight=0.1,
        use_z=True,
        limit_box=False,
        IoU_space=3,
        batch_size=4,
        epoch=2,
        lr=1e-3,
        optimizer="Adam",
        lr_decay_step=20,
        lr_decay_rate=0.1,
        wd=0.0,
        gradient_clip_val=1.0,
        check_val_every_n_epoch=1,
        log_dir=str(tmp_path),
        syn_num_tracklets=2,
        syn_tracklet_len=4,
        seed=0,
    )
    base.update(over)
    return make_config(base)


class TestTrainer:
    def test_fit_and_checkpoint(self, tmp_path):
        cfg = cfg_for_trainer(tmp_path)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        val_sampler = get_dataset(cfg, "test", "test")
        trainer = Trainer(model, cfg, work_dir=str(tmp_path), log_every=1)
        state = trainer.fit(train_sampler, val_sampler, epochs=1, steps_per_epoch=2)
        assert int(state.step) == 2
        assert os.path.isdir(os.path.join(str(tmp_path), "ckpt_last"))
        assert len(trainer.history) == 1
        assert "precision" in trainer.history[0]

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = cfg_for_trainer(tmp_path)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        trainer = Trainer(model, cfg, work_dir=str(tmp_path), log_every=1)
        state = trainer.fit(train_sampler, None, epochs=1, steps_per_epoch=1)
        restored = Trainer.load_checkpoint(os.path.join(str(tmp_path), "ckpt_last"))
        leaves_a = np.concatenate(
            [np.ravel(x) for x in _leaves(restored["params"])]
        )
        import jax

        leaves_b = np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(state.params)]
        )
        assert np.allclose(np.sort(leaves_a), np.sort(leaves_b))

    def test_resume(self, tmp_path):
        cfg = cfg_for_trainer(tmp_path)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        trainer = Trainer(model, cfg, work_dir=str(tmp_path), log_every=1)
        trainer.fit(train_sampler, None, epochs=1, steps_per_epoch=2)
        state = trainer.fit(
            train_sampler, None, epochs=2, steps_per_epoch=2,
            resume_from=os.path.join(str(tmp_path), "ckpt_last"),
        )
        assert int(state.step) == 4  # 2 restored + 2 new


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield np.asarray(tree)


class TestFlowLayers:
    def test_flow_embedding_shapes(self):
        import jax
        import jax.numpy as jnp

        from open3dsot_tpu.models.flow import FlowEmbedding

        mod = FlowEmbedding(radius=0.5, nsample=4, mlp=[16, 16])
        rng = np.random.default_rng(0)
        xyz1 = jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32)
        f1 = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), xyz1, xyz2, f1, f2)
        out_xyz, out_feat = mod.apply(variables, xyz1, xyz2, f1, f2)
        assert out_feat.shape == (2, 16, 16)

    def test_set_upconv_shapes(self):
        import jax
        import jax.numpy as jnp

        from open3dsot_tpu.models.flow import PointNetSetUpConv

        mod = PointNetSetUpConv(nsample=4, radius=0.5, mlp=[16], mlp2=[8])
        rng = np.random.default_rng(1)
        xyz1 = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
        f1 = jnp.asarray(rng.normal(size=(2, 32, 4)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(2, 8, 6)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), xyz1, xyz2, f1, f2)
        out = mod.apply(variables, xyz1, xyz2, f1, f2)
        assert out.shape == (2, 32, 8)


class TestProfiling:
    def test_stopwatch(self):
        from open3dsot_tpu.utils.profiling import Stopwatch

        sw = Stopwatch()
        with sw("a"):
            pass
        with sw("a"):
            pass
        s = sw.summary()
        assert s["a"]["count"] == 2
