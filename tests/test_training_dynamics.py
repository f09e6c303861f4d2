"""Composed training-step dynamics vs the LIVE reference (VERDICT r2, item 4).

The optimizer is torch-step-parity-tested in isolation (tests/test_optim.py)
and every loss term is live-parity-tested on matched outputs
(tests/test_reference_live_matching.py). What those cannot catch is a wiring
bug in the COMPOSED step — loss weighting, BatchNorm running-stat updates,
schedule application, gradient plumbing. Here the actual reference
training_step (torch Adam from its own configure_optimizers,
/root/reference/models/base_model.py:28-36) and our jitted train step
(train/trainer.py::make_train_step + train/optim.py) start from identical
imported parameters and consume IDENTICAL pre-built batches for several
steps; the loss trajectories must track each other within a documented
bound, and the BatchNorm running statistics must stay aligned.

Bounds (documented, seeded, measured): point-in-time loss parity is pinned
tightly by tests/test_reference_live_matching.py (identical params: every
term within ~0.15%). Once the parameters start MOVING, hard-threshold
nonlinearities (the 0.3/0.6 objectness distance band for P2B/BAT, M2's
argmax point-gating) amplify f32 torch-vs-XLA rounding into flipped
mask/label elements on borderline items, so the trajectories carry a
chaotic percent-level noise floor on these tiny random-data nets: measured
max per-step divergence ~2-4% for P2B/BAT and ~18% for M2 at 5 steps. The
asserted bounds (10% / 25%) sit above that floor but far below what any
real wiring bug produces — a mis-weighted or dropped loss term, a wrong
schedule, or a broken BN update shifts the trajectory by persistent integer
factors. BN running statistics: an ISOLATED layer comparison pins the
momentum/eps wiring exactly (means bit-match; running vars differ only by
torch's Bessel-corrected batch variance, ~n/(n-1), <0.1% at production
reduction sizes). At the model level the same selection chaos (FPS and
ball-query membership flips cascade entire neighborhoods into the BN
inputs) makes per-entry stats diverge tens of percent on random data, so
only a weak mean-relative bound is asserted there — still far below the
O(1) shift an inverted momentum produces in 5 steps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests._reference_live import load_reference  # noqa: E402

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo unavailable")

from open3dsot_tpu.config import make_config  # noqa: E402
from open3dsot_tpu.import_torch import import_checkpoint  # noqa: E402
from open3dsot_tpu.models import get_model  # noqa: E402
from open3dsot_tpu.train.optim import make_optimizer  # noqa: E402
from open3dsot_tpu.train.trainer import (  # noqa: E402
    TrainState,
    make_train_step,
)
from tests.test_reference_live_matching import (  # noqa: E402
    _inputs,
    _matching_cfg,
    _randomize_bn,
)

N_STEPS = 5


def _m2_cfg():
    return dict(
        net_model="m2track", box_aware=True, point_sample_size=64,
        degrees=False, use_z=True, limit_box=False,
        seg_weight=0.1, center_weight=10.0, angle_weight=10.0,
        motion_cls_seg_weight=0.1, bc_weight=1.0, motion_threshold=0.15,
        optimizer="adam", lr=1e-4, wd=0.0, lr_decay_step=1000,
        lr_decay_rate=0.5, gradient_clip_val=0.0, batch_size=4, epoch=1,
        seed=0,
    )


def _m2_batch(rng, B=4, n=64):
    return {
        "points": rng.normal(size=(B, 2 * n, 5)).astype(np.float32),
        "candidate_bc": np.abs(rng.normal(size=(B, 2 * n, 9))).astype(np.float32),
        "seg_label": (rng.random((B, 2 * n)) > 0.5).astype(np.int64),
        "box_label": rng.normal(size=(B, 4)).astype(np.float32),
        "box_label_prev": rng.normal(size=(B, 4)).astype(np.float32),
        "motion_label": rng.normal(size=(B, 4)).astype(np.float32),
        "motion_state_label": (rng.random(B) > 0.5).astype(np.int64),
        "prev_bc": np.abs(rng.normal(size=(B, n, 9))).astype(np.float32),
        "this_bc": np.abs(rng.normal(size=(B, n, 9))).astype(np.float32),
    }


def _torch_train_loop(ref_model, batches):
    opt_cfg = ref_model.configure_optimizers()
    opt = opt_cfg["optimizer"]
    losses = []
    ref_model.train()
    for batch in batches:
        tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
        loss = ref_model.training_step(tb, 0)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _our_train_loop(model, variables, cfg, batches):
    import optax

    from flax.core import FrozenDict
    import jax.numpy as jnp

    optimizer = make_optimizer(cfg, steps_per_epoch=len(batches))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=optimizer.init(variables["params"]),
    )
    step = make_train_step(model, optimizer, mesh=None, donate=False)
    losses = []
    with jax.default_matmul_precision("highest"):
        for batch in batches:
            state, loss_dict = step(state, batch)
            losses.append(float(loss_dict["loss_total"]))
    return losses, state


def _bn_stats_delta(ref_model, state):
    """Mean RELATIVE running-stat divergence across all BN layers
    (sorted-multiset alignment; layer naming differs between trees)."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                flat[path + (k,)] = np.asarray(v)

    walk(jax.device_get(dict(state.batch_stats)), ())
    # layer naming differs between the trees, so compare the SORTED multiset
    # of all running-stat scalars: identical training implies identical
    # multisets (a diverged layer perturbs both sorted vectors)
    a = np.sort(np.concatenate([
        np.ravel(v) for k, v in sd.items()
        if k.endswith("running_mean") or k.endswith("running_var")
    ]))
    b = np.sort(np.concatenate([np.ravel(v) for v in flat.values()]))
    if a.shape != b.shape:
        return None  # structure mismatch; covered by importer tests
    return float(np.mean(np.abs(a - b) / np.maximum(np.abs(a), 1e-3)))


@pytest.mark.parametrize("net_model", ["p2b", "bat", "m2track"])
def test_training_dynamics_track_reference(net_model):
    if net_model == "m2track":
        cfg_dict = _m2_cfg()
        torch.manual_seed(4)
        ref_model = REF["m2track"].M2TRACK(REF["EasyDict"](cfg_dict))
        rng = np.random.default_rng(5)
        batches = [_m2_batch(rng) for _ in range(N_STEPS)]
        rel_bound = 0.25  # argmax gating chaos floor ~18% (docstring)
    else:
        cfg_dict = _matching_cfg(net_model)
        cfg_dict.update(optimizer="adam", lr=1e-4, wd=0.0,
                        lr_decay_step=1000, lr_decay_rate=0.5,
                        gradient_clip_val=0.0, batch_size=4, epoch=1, seed=0)
        torch.manual_seed(4)
        ref_cls = REF[net_model].P2B if net_model == "p2b" else REF[net_model].BAT
        ref_model = ref_cls(REF["EasyDict"](cfg_dict))
        batches = [_inputs(net_model, seed=100 + i, B=4) for i in range(N_STEPS)]
        rel_bound = 0.10  # threshold-band chaos floor ~4% (docstring)
    _randomize_bn(ref_model)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    our_cfg = make_config(cfg_dict)
    model = get_model(net_model)(our_cfg)
    variables = import_checkpoint(sd, our_cfg, model=model)

    ref_losses = _torch_train_loop(ref_model, batches)
    our_losses, state = _our_train_loop(model, variables, our_cfg, batches)

    for i, (r, o) in enumerate(zip(ref_losses, our_losses)):
        assert abs(o - r) / max(abs(r), 1e-6) < rel_bound, (
            f"step {i}: ref={r:.6f} ours={o:.6f} "
            f"(trajectories: ref={ref_losses} ours={our_losses})"
        )

    delta = _bn_stats_delta(ref_model, state)
    if delta is not None:
        # chaos floor measured at 0.17-0.32 mean-relative (docstring); an
        # inverted momentum blends stats to O(1) divergence within 5 steps
        assert delta < 0.6, f"BN running stats diverged: mean_rel={delta}"


def test_bn_running_stat_momentum_parity():
    """Isolated flax-vs-torch BatchNorm: 5 train-mode forwards on identical
    inputs. Means must match to float rounding; running vars differ only by
    torch's unbiased (Bessel n/(n-1)) batch variance in the blend — the
    documented deviation (n=128 here -> <=0.8%)."""
    import flax.linen as nn
    import jax.numpy as jnp

    tbn = torch.nn.BatchNorm1d(8)
    tbn.train()
    fbn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    x0 = np.random.default_rng(0).normal(size=(4, 8, 32)).astype(np.float32)
    flat0 = jnp.asarray(x0.transpose(0, 2, 1)).reshape(-1, 8)
    variables = fbn.init(jax.random.PRNGKey(0), flat0, use_running_average=False)
    bs = variables["batch_stats"]
    n = 4 * 32
    for i in range(5):
        x = (np.random.default_rng(i).normal(size=(4, 8, 32)) * 2 + 1).astype(
            np.float32)
        with torch.no_grad():
            tbn(torch.from_numpy(x))
        flat = jnp.asarray(x.transpose(0, 2, 1)).reshape(-1, 8)
        _, mut = fbn.apply(
            {"params": variables["params"], "batch_stats": bs}, flat,
            use_running_average=False, mutable=["batch_stats"])
        bs = mut["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs["var"]), tbn.running_var.numpy(),
        rtol=(n / (n - 1) - 1) * 1.5)
