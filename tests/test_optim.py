"""Optimizer construction: StepLR schedule + torch-parity Adam/SGD updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from open3dsot_tpu.config import make_config
from open3dsot_tpu.train.optim import make_optimizer, steplr_schedule


def cfg(**over):
    base = dict(
        lr=0.1, optimizer="Adam", lr_decay_step=2, lr_decay_rate=0.1, wd=0.0,
        gradient_clip_val=0.0,
    )
    base.update(over)
    return make_config(base)


class TestStepLR:
    def test_epoch_staircase(self):
        sched = steplr_schedule(0.1, steps_per_epoch=10, decay_step=2, decay_rate=0.1)
        assert sched(0) == pytest.approx(0.1)
        assert sched(19) == pytest.approx(0.1)    # epoch 1
        assert sched(20) == pytest.approx(0.01)   # epoch 2 -> decayed
        assert sched(39) == pytest.approx(0.01)   # epoch 3
        assert sched(40) == pytest.approx(0.001)  # epoch 4 -> decayed again

    def test_300_epochs_match_live_torch_steplr(self):
        """Every epoch's LR over a 300-epoch run equals the LIVE torch
        StepLR under Lightning's stepping convention (scheduler.step() at
        each train-epoch end, so epoch e trains at gamma^(e // step)).
        Rules out any late-epoch decay-boundary mismatch as a cause of the
        M2 ep300 val collapse seen in DRIFT.md (VERDICT r4 #4); covers the
        reference configs' step/rate pairs (M2/P2B 20/0.1, BAT 12/0.2 —
        base_model.py:33-35 + cfgs/*.yaml) and the drift benchmark's
        100/0.2."""
        torch = pytest.importorskip("torch")

        spe = 7  # steps per epoch (arbitrary, non-divisor of anything)
        for decay_step, gamma in ((20, 0.1), (12, 0.2), (100, 0.2)):
            p = torch.nn.Parameter(torch.zeros(1))
            opt = torch.optim.Adam([p], lr=1e-3)
            tsched = torch.optim.lr_scheduler.StepLR(
                opt, step_size=decay_step, gamma=gamma)
            ours = steplr_schedule(1e-3, steps_per_epoch=spe,
                                   decay_step=decay_step, decay_rate=gamma)
            for epoch in range(300):
                want = opt.param_groups[0]["lr"]
                for it in (0, spe - 1):  # first and last step of the epoch
                    got = float(ours(epoch * spe + it))
                    assert got == pytest.approx(want, rel=1e-12), (
                        f"step={decay_step} gamma={gamma} epoch={epoch}: "
                        f"ours={got} torch={want}"
                    )
                tsched.step()


class TestAdamParity:
    def test_first_step_matches_torch_adam(self):
        torch = pytest.importorskip("torch")

        p0 = np.array([1.0, -2.0, 3.0], np.float32)
        g = np.array([0.5, -0.1, 0.2], np.float32)

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([tp], lr=0.1, betas=(0.5, 0.999), eps=1e-6)
        tp.grad = torch.from_numpy(g.copy())
        for _ in range(3):
            opt.step()
        want = tp.detach().numpy()

        optimizer = make_optimizer(cfg(), steps_per_epoch=1000)
        params = {"w": jnp.asarray(p0)}
        state = optimizer.init(params)
        for _ in range(3):
            updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        got = np.asarray(params["w"])
        assert np.allclose(got, want, atol=1e-5), (got, want)

    def test_coupled_weight_decay_matches_torch(self):
        torch = pytest.importorskip("torch")

        p0 = np.array([1.0, -2.0], np.float32)
        g = np.array([0.3, 0.1], np.float32)

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([tp], lr=0.1, betas=(0.5, 0.999), eps=1e-6,
                               weight_decay=0.01)
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        want = tp.detach().numpy()

        optimizer = make_optimizer(cfg(wd=0.01), steps_per_epoch=1000)
        params = {"w": jnp.asarray(p0)}
        state = optimizer.init(params)
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
        got = np.asarray(optax.apply_updates(params, updates)["w"])
        assert np.allclose(got, want, atol=1e-6)


class TestSGDParity:
    def test_momentum_matches_torch(self):
        torch = pytest.importorskip("torch")

        p0 = np.array([0.5, -1.5], np.float32)
        g = np.array([0.2, -0.4], np.float32)

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9)
        for _ in range(3):
            tp.grad = torch.from_numpy(g.copy())
            opt.step()
        want = tp.detach().numpy()

        optimizer = make_optimizer(cfg(optimizer="sgd"), steps_per_epoch=1000)
        params = {"w": jnp.asarray(p0)}
        state = optimizer.init(params)
        for _ in range(3):
            updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        assert np.allclose(np.asarray(params["w"]), want, atol=1e-6)


class TestClipping:
    def test_global_norm_clip_applied(self):
        optimizer = make_optimizer(cfg(gradient_clip_val=1.0, optimizer="sgd"), 10)
        params = {"w": jnp.zeros(4)}
        state = optimizer.init(params)
        big = {"w": jnp.full(4, 100.0)}
        updates, _ = optimizer.update(big, state, params)
        # after clip to norm 1, momentum x1, lr 0.1 -> update norm 0.1
        norm = float(jnp.linalg.norm(updates["w"]))
        assert norm == pytest.approx(0.1, rel=1e-4)
