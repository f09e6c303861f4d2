"""M2-Track: forward shapes, loss, train step, end-to-end synthetic eval."""

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.data.loader import BatchLoader
from open3dsot_tpu.models import get_model
from open3dsot_tpu.train.optim import make_optimizer
from open3dsot_tpu.train.trainer import create_train_state, make_train_step


def m2_cfg(**over):
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
        num_candidates=1,
        motion_threshold=0.15,
        use_augmentation=False,
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
        syn_num_tracklets=2,
        syn_tracklet_len=4,
        seed=0,
    )
    base.update(over)
    return make_config(base)


@pytest.fixture(scope="module")
def setup():
    cfg = m2_cfg()
    model = get_model("m2track")(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, model.dummy_batch(2))
    return cfg, model, variables


class TestForward:
    def test_output_shapes(self, setup):
        cfg, model, variables = setup
        batch = model.dummy_batch(2)
        out = model.apply(variables, batch, train=False)
        n = 2 * cfg.point_sample_size
        assert out["estimation_boxes"].shape == (2, 4)
        assert out["aux_estimation_boxes"].shape == (2, 4)
        assert out["seg_logits"].shape == (2, n, 2)
        assert out["motion_pred"].shape == (2, 4)
        assert out["motion_cls"].shape == (2, 2)
        assert out["estimation_boxes_prev"].shape == (2, 4)
        assert out["pred_bc"].shape == (2, n, 9)

    def test_train_mode_returns_mutated_stats(self, setup):
        cfg, model, variables = setup
        batch = model.dummy_batch(2)
        out, mutated = model.apply(variables, batch, train=True)
        assert "batch_stats" in mutated

    def test_no_box_aware_variant(self):
        cfg = m2_cfg(box_aware=False)
        model = get_model("m2track")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        out = model.apply(variables, model.dummy_batch(2), train=False)
        assert "pred_bc" not in out

    def test_no_second_stage(self):
        cfg = m2_cfg(use_second_stage=False, box_aware=False)
        model = get_model("m2track")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        out = model.apply(variables, model.dummy_batch(2), train=False)
        assert np.allclose(
            np.asarray(out["estimation_boxes"]), np.asarray(out["aux_estimation_boxes"])
        )


class TestLoss:
    def test_loss_finite_on_real_batch(self, setup):
        cfg, model, variables = setup
        sampler = get_dataset(cfg, "train_motion", "train")
        loader = BatchLoader(sampler, batch_size=4, prefetch=0)
        batch = next(iter(loader))
        out = model.apply(variables, batch, train=False)
        loss_dict = model.loss(cfg, batch, out)
        for k, v in loss_dict.items():
            assert np.isfinite(float(v)), k
        assert float(loss_dict["loss_total"]) > 0

    def test_loss_terms_present(self, setup):
        cfg, model, variables = setup
        batch = model.dummy_batch(2)
        out = model.apply(variables, batch, train=False)
        ld = model.loss(cfg, batch, out)
        for k in [
            "loss_total", "loss_seg", "loss_center", "loss_angle",
            "loss_center_prev", "loss_center_aux", "loss_center_motion",
            "loss_motion_cls", "loss_bc",
        ]:
            assert k in ld


class TestTrainStep:
    def test_loss_decreases(self, setup):
        cfg, model, _ = setup
        sampler = get_dataset(cfg, "train_motion", "train")
        loader = BatchLoader(sampler, batch_size=4, prefetch=0, shuffle=False)
        batch = next(iter(loader))
        optimizer = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
        step = make_train_step(model, optimizer, mesh=None, donate=False)
        state, first = step(state, batch)
        losses = []
        for _ in range(15):
            state, ld = step(state, batch)
            losses.append(float(ld["loss_total"]))
        assert min(losses) < float(first["loss_total"])

    def test_sharded_train_step_runs(self, setup):
        cfg, model, _ = setup
        from open3dsot_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh(8)
        sampler = get_dataset(cfg, "train_motion", "train")
        loader = BatchLoader(sampler, batch_size=8, prefetch=0)
        batch = shard_batch(next(iter(loader)), mesh)
        optimizer = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
        step = make_train_step(model, optimizer, mesh=mesh, donate=False)
        state2, ld = step(state, batch)
        assert np.isfinite(float(ld["loss_total"]))
        assert int(state2.step) == 1


class TestEval:
    def test_evaluate_synthetic(self, setup):
        cfg, model, variables = setup
        from open3dsot_tpu.tracking.eval import evaluate_dataset

        test_sampler = get_dataset(cfg, "test", "test")
        succ, prec = evaluate_dataset(model, variables, test_sampler, cfg, max_tracklets=1)
        assert 0.0 <= succ <= 100.0
        assert 0.0 <= prec <= 100.0

    def test_eval_deterministic(self, setup):
        cfg, model, variables = setup
        from open3dsot_tpu.tracking.eval import evaluate_dataset

        test_sampler = get_dataset(cfg, "test", "test")
        r1 = evaluate_dataset(model, variables, test_sampler, cfg, max_tracklets=1)
        r2 = evaluate_dataset(model, variables, test_sampler, cfg, max_tracklets=1)
        assert r1 == r2
