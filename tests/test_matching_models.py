"""P2B / BAT: forward shapes, losses, train step, synthetic eval."""

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.data.loader import BatchLoader
from open3dsot_tpu.models import get_model
from open3dsot_tpu.train.optim import make_optimizer
from open3dsot_tpu.train.trainer import create_train_state, make_train_step


def match_cfg(net="p2b", **over):
    base = dict(
        dataset="synthetic",
        net_model=net,
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
        num_candidates=1,
        box_aware=(net == "bat"),
        use_fps=(net == "bat"),
        normalize_xyz=False,
        feature_channel=32,
        hidden_channel=32,
        out_channel=32,
        vote_channel=32,
        num_proposal=16,
        k=4,
        bc_channel=9,
        objectiveness_weight=1.5,
        box_weight=0.2,
        vote_weight=1.0,
        seg_weight=0.2,
        bc_weight=1.0,
        reference_BB="previous_result",
        shape_aggregation="firstandprevious",
        use_z=True,
        limit_box=False,
        IoU_space=3,
        batch_size=4,
        epoch=1,
        lr=1e-3,
        optimizer="Adam",
        lr_decay_step=12,
        lr_decay_rate=0.2,
        wd=0.0,
        gradient_clip_val=0.0,
        syn_num_tracklets=2,
        syn_tracklet_len=4,
        seed=0,
    )
    base.update(over)
    return make_config(base)


@pytest.fixture(scope="module")
def p2b_setup():
    cfg = match_cfg("p2b")
    model = get_model("p2b")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    return cfg, model, variables


@pytest.fixture(scope="module")
def bat_setup():
    cfg = match_cfg("bat")
    model = get_model("bat")(cfg)
    variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
    return cfg, model, variables


class TestP2BForward:
    def test_output_shapes(self, p2b_setup):
        cfg, model, variables = p2b_setup
        batch = model.dummy_batch(2)
        out = model.apply(variables, batch, train=False)
        n8 = cfg.search_size // 8
        assert out["estimation_boxes"].shape == (2, cfg.num_proposal, 5)
        assert out["estimation_cla"].shape == (2, n8)
        assert out["vote_xyz"].shape == (2, n8, 3)
        assert out["center_xyz"].shape == (2, cfg.num_proposal, 3)
        assert out["sample_idxs"].shape == (2, cfg.search_size // 2)

    def test_loss_finite(self, p2b_setup):
        cfg, model, variables = p2b_setup
        sampler = get_dataset(cfg, "train_siamese", "train")
        batch = next(iter(BatchLoader(sampler, 4, prefetch=0)))
        out = model.apply(variables, batch, train=False)
        ld = model.loss(cfg, batch, out)
        for k in ["loss_total", "loss_objective", "loss_box", "loss_seg", "loss_vote"]:
            assert np.isfinite(float(ld[k])), k

    def test_train_step_decreases_loss(self, p2b_setup):
        cfg, model, _ = p2b_setup
        sampler = get_dataset(cfg, "train_siamese", "train")
        batch = next(iter(BatchLoader(sampler, 4, prefetch=0, shuffle=False)))
        optimizer = make_optimizer(cfg, 10)
        state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
        step = make_train_step(model, optimizer, mesh=None, donate=False)
        state, first = step(state, batch)
        losses = []
        for _ in range(15):
            state, ld = step(state, batch)
            losses.append(float(ld["loss_total"]))
        assert min(losses) < float(first["loss_total"])


class TestBATForward:
    def test_output_shapes(self, bat_setup):
        cfg, model, variables = bat_setup
        batch = model.dummy_batch(2)
        out = model.apply(variables, batch, train=False)
        n8 = cfg.search_size // 8
        assert out["estimation_boxes"].shape == (2, cfg.num_proposal, 5)
        assert out["pred_search_bc"].shape == (2, n8, 9)

    def test_loss_finite_with_bc(self, bat_setup):
        cfg, model, variables = bat_setup
        sampler = get_dataset(cfg, "train_siamese", "train")
        batch = next(iter(BatchLoader(sampler, 4, prefetch=0)))
        out = model.apply(variables, batch, train=False)
        ld = model.loss(cfg, batch, out)
        assert "loss_bc" in ld
        for v in ld.values():
            assert np.isfinite(float(v))

    def test_train_step_runs(self, bat_setup):
        cfg, model, _ = bat_setup
        sampler = get_dataset(cfg, "train_siamese", "train")
        batch = next(iter(BatchLoader(sampler, 4, prefetch=0)))
        optimizer = make_optimizer(cfg, 10)
        state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
        step = make_train_step(model, optimizer, mesh=None, donate=False)
        state, ld = step(state, batch)
        assert np.isfinite(float(ld["loss_total"]))


class TestMatchingEval:
    def test_p2b_eval_synthetic(self, p2b_setup):
        cfg, model, variables = p2b_setup
        from open3dsot_tpu.tracking.eval import evaluate_dataset

        sampler = get_dataset(cfg, "test", "test")
        succ, prec = evaluate_dataset(model, variables, sampler, cfg, max_tracklets=1)
        assert 0.0 <= succ <= 100.0

    def test_bat_eval_synthetic(self, bat_setup):
        cfg, model, variables = bat_setup
        from open3dsot_tpu.tracking.eval import evaluate_dataset

        sampler = get_dataset(cfg, "test", "test")
        succ, prec = evaluate_dataset(model, variables, sampler, cfg, max_tracklets=1)
        assert 0.0 <= succ <= 100.0
