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

    def test_resume_restores_best_metric_bookkeeping(self, tmp_path):
        """A resumed FRESH Trainer must restore best_metric (and the top-k
        table) from ckpt_meta.json — otherwise its first validation would
        clobber ckpt_best with a worse model (the Lightning ModelCheckpoint
        state the reference carries inside its .ckpt)."""
        import json

        cfg = cfg_for_trainer(tmp_path)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        val_sampler = get_dataset(cfg, "test", "test")
        tr1 = Trainer(model, cfg, work_dir=str(tmp_path), log_every=100)
        tr1.fit(train_sampler, val_sampler, epochs=1, steps_per_epoch=1)
        meta = json.load(open(os.path.join(str(tmp_path), "ckpt_meta.json")))
        assert meta["best_metric"] == tr1.best_metric > -np.inf
        # simulate a converged run: pretend the best seen was much higher
        meta["best_metric"] = 99.0
        json.dump(meta, open(os.path.join(str(tmp_path), "ckpt_meta.json"), "w"))
        tr2 = Trainer(get_model("m2track")(cfg), cfg, work_dir=str(tmp_path),
                      log_every=100)
        tr2.fit(train_sampler, val_sampler, epochs=2, steps_per_epoch=1,
                resume_from=os.path.join(str(tmp_path), "ckpt_last"))
        # the resumed run's (worse) validation must NOT have become "best"
        assert tr2.best_metric == 99.0
        meta2 = json.load(open(os.path.join(str(tmp_path), "ckpt_meta.json")))
        assert meta2["best_metric"] == 99.0

    def test_corrupt_ckpt_meta_does_not_abort_resume(self, tmp_path):
        """The chunked workflow expects processes to be OOM-killed at
        arbitrary points; a truncated ckpt_meta.json must degrade (fresh
        bookkeeping) instead of crashing the resumed run."""
        cfg = cfg_for_trainer(tmp_path)
        model = get_model("m2track")(cfg)
        train_sampler = get_dataset(cfg, "train_motion", "train")
        tr1 = Trainer(model, cfg, work_dir=str(tmp_path), log_every=100)
        tr1.fit(train_sampler, None, epochs=1, steps_per_epoch=1)
        with open(os.path.join(str(tmp_path), "ckpt_meta.json"), "w") as fh:
            fh.write('{"best_metric": 1.')  # truncated mid-write
        tr2 = Trainer(get_model("m2track")(cfg), cfg, work_dir=str(tmp_path),
                      log_every=100)
        state = tr2.fit(
            train_sampler, None, epochs=2, steps_per_epoch=1,
            resume_from=os.path.join(str(tmp_path), "ckpt_last"))
        assert int(state.step) == 2
        assert tr2.best_metric == -np.inf  # degraded, not crashed

    def test_chunked_fit_equals_uninterrupted(self, tmp_path):
        """ckpt_last + opt_state/step resume across FRESH Trainer instances
        must reproduce the uninterrupted run EXACTLY: the loader's shuffle
        order, the device-sampler's fold_in(seed, step) RNG and the LR
        schedule all key off the restored step. This is the property the
        chunked-process training workaround for the tunnel client's
        host-RAM leak relies on (benchmarks/drift_benchmark.py
        --chunk-epochs, scripts/run_drift_v2.sh)."""
        import jax

        cfg_a = cfg_for_trainer(tmp_path / "a", device_sampler=True)
        model = get_model("m2track")(cfg_a)
        sampler = get_dataset(cfg_a, "train_motion", "train")
        tr_a = Trainer(model, cfg_a, work_dir=str(tmp_path / "a"),
                       log_every=100)
        state_a = tr_a.fit(sampler, None, epochs=4)

        cfg_b = cfg_for_trainer(tmp_path / "b", device_sampler=True)
        tr_b1 = Trainer(get_model("m2track")(cfg_b), cfg_b,
                        work_dir=str(tmp_path / "b"), log_every=100)
        tr_b1.fit(sampler, None, epochs=2)
        # second chunk: a brand-new Trainer (fresh-process simulation)
        tr_b2 = Trainer(get_model("m2track")(cfg_b), cfg_b,
                        work_dir=str(tmp_path / "b"), log_every=100)
        state_b = tr_b2.fit(
            sampler, None, epochs=4,
            resume_from=os.path.join(str(tmp_path / "b"), "ckpt_last"),
        )
        assert int(state_a.step) == int(state_b.step)
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                        jax.tree_util.tree_leaves(state_b.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


class TestBNMomentumSchedule:
    """Scheduled BN momentum via running-stat re-blend (train/bn_momentum.py),
    replacing the reference BNMomentumScheduler's live-module mutation
    (pytorch_utils.py:272-297)."""

    def test_reblend_matches_direct_momentum(self):
        import jax.numpy as jnp

        from open3dsot_tpu.train.bn_momentum import reblend_batch_stats

        rng = np.random.default_rng(0)
        old = {"bn": {"mean": rng.normal(size=8).astype(np.float32)}}
        mu = rng.normal(size=8).astype(np.float32)
        # what flax produced with its baked-in momentum 0.9
        flax_new = {"bn": {"mean": 0.9 * old["bn"]["mean"] + 0.1 * mu}}
        for m in (0.99, 0.5, 0.9):
            got = reblend_batch_stats(old, flax_new, jnp.float32(m))
            want = m * old["bn"]["mean"] + (1 - m) * mu
            np.testing.assert_allclose(np.asarray(got["bn"]["mean"]), want,
                                       rtol=1e-5, atol=1e-5)

    def test_trainer_applies_schedule(self, tmp_path):
        import jax

        from open3dsot_tpu.config import make_config
        from open3dsot_tpu.data import get_dataset
        from open3dsot_tpu.models import get_model
        from open3dsot_tpu.train.trainer import Trainer

        base = dict(
            dataset="synthetic", net_model="m2track", category_name="Car",
            bb_scale=1.25, bb_offset=2, point_sample_size=32, degrees=False,
            up_axis=[0, 0, 1], train_type="train_motion", num_candidates=1,
            motion_threshold=0.15, box_aware=False, use_second_stage=False,
            use_prev_refinement=False, use_motion_cls=False, use_z=True,
            center_weight=2.0, angle_weight=10.0, seg_weight=0.1,
            motion_cls_seg_weight=0.1,
            limit_box=False, IoU_space=3, batch_size=4, epoch=1, lr=1e-3,
            optimizer="Adam", lr_decay_step=20, lr_decay_rate=0.1, wd=0.0,
            gradient_clip_val=1.0, log_dir=str(tmp_path),
            syn_num_tracklets=2, syn_tracklet_len=4, seed=0,
        )
        # torch momentum ~0 -> flax momentum ~1 -> stats stay at init;
        # torch momentum ~1 -> flax momentum ~0 -> stats jump to batch stats
        def drift_from_init(**over):
            cfg = make_config(dict(base, **over))
            model = get_model("m2track")(cfg)
            init_stats = model.init(jax.random.PRNGKey(cfg.seed),
                                    model.dummy_batch(2))["batch_stats"]
            tr = Trainer(model, cfg, work_dir=str(tmp_path), log_every=1)
            state = tr.fit(get_dataset(cfg, "train_motion", "train"), None,
                           epochs=1, steps_per_epoch=2)
            a = jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))
            b = jax.tree_util.tree_leaves(jax.device_get(init_stats))
            return float(np.mean([np.abs(np.asarray(x) - np.asarray(y)).mean()
                                  for x, y in zip(a, b)]))

        # the schedule floors at torch momentum 0.01, so 'slow' ends up at
        # 0.01 (2% drift over 2 steps) while 'fast' (0.999) moves the stats
        # essentially all the way to the batch statistics
        slow = drift_from_init(bn_decay_step=10, bn_momentum=1e-6,
                               bn_decay_rate=1.0)
        fast = drift_from_init(bn_decay_step=10, bn_momentum=0.999,
                               bn_decay_rate=1.0)
        assert fast > 10 * slow, (fast, slow)
