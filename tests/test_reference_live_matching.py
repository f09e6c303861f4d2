"""Live full-model parity for the matching trackers (P2B / BAT).

Round-2 VERDICT item 1: the M2-Track forward was already proven against the
ACTUAL reference code, but P2B/BAT were only proven against hand-written
replicas. tests/_reference_live.py now ships WORKING CPU implementations of
the `pointnet2_ops._ext` CUDA surface, so the real reference models
(/root/reference/models/p2b.py:28-84, bat.py:57-166) run live here and our
flax models are diffed against them through the torch-ckpt importer:

- eval forward: every output head (proposal boxes, cls, votes, centers,
  predicted search BoxCloud) on seeded inputs with randomized BN stats;
- training losses: the reference training_step's gather-through-sample_idxs
  prelude + compute_loss terms AND the weighted total returned by the live
  training_step itself, vs our model.loss, in train mode (batch-stats BN);
- M2-Track compute_loss (the forward was live-tested already) vs ours.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests._reference_live import load_reference  # noqa: E402

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo unavailable")

from open3dsot_tpu.config import make_config  # noqa: E402
from open3dsot_tpu.import_torch import import_checkpoint  # noqa: E402
from open3dsot_tpu.models import get_model  # noqa: E402


def _matching_cfg(net_model: str) -> dict:
    """Structural flags of the shipped configs (cfgs/P2B_Car.yaml /
    BAT_Car.yaml) at moderate sizes; the backbone MLP widths are hardcoded
    in the reference (models/backbone/pointnet.py:32-58) so run full-width
    there and keep the head channels / point counts small for CPU."""
    cfg = dict(
        net_model=net_model,
        use_fps=(net_model == "bat"),  # P2B_Car.yaml:26 False, BAT_Car.yaml:27 True
        normalize_xyz=False,
        feature_channel=32,
        hidden_channel=32,
        out_channel=32,
        vote_channel=32,
        num_proposal=16,
        template_size=64,
        search_size=128,
        objectiveness_weight=1.5,
        box_weight=0.2,
        seg_weight=0.1,
        vote_weight=1.0,
        degrees=True,
        use_z=False,
        limit_box=True,
    )
    if net_model == "bat":
        cfg.update(k=4, use_search_bc=False, use_search_feature=False,
                   bc_channel=9, bc_weight=1.0)
    return cfg


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)


def _build_pair(net_model: str, seed: int = 0):
    cfg_dict = _matching_cfg(net_model)
    torch.manual_seed(seed)
    ref_cls = REF[net_model].P2B if net_model == "p2b" else REF[net_model].BAT
    ref_model = ref_cls(REF["EasyDict"](cfg_dict))
    _randomize_bn(ref_model)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    our_cfg = make_config(cfg_dict)
    model = get_model(net_model)(our_cfg)
    variables = import_checkpoint(sd, our_cfg, model=model)
    return ref_model, model, variables, our_cfg


def _inputs(net_model: str, seed: int = 0, B: int = 2):
    rng = np.random.default_rng(seed)
    batch = {
        "template_points": rng.normal(size=(B, 64, 3)).astype(np.float32),
        "search_points": rng.normal(size=(B, 128, 3)).astype(np.float32),
        "box_label": rng.normal(size=(B, 4)).astype(np.float32),
        "seg_label": (rng.random((B, 128)) > 0.5).astype(np.float32),
    }
    if net_model == "bat":
        batch["points2cc_dist_t"] = np.abs(
            rng.normal(size=(B, 64, 9))).astype(np.float32)
        batch["points2cc_dist_s"] = np.abs(
            rng.normal(size=(B, 128, 9))).astype(np.float32)
    return batch


def _to_torch(batch):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}


FORWARD_KEYS = {
    "p2b": ["estimation_boxes", "estimation_cla", "vote_xyz", "center_xyz"],
    "bat": ["estimation_boxes", "estimation_cla", "vote_xyz", "center_xyz",
            "pred_search_bc"],
}
_REF_KEY = {"center_xyz": "center_xyz"}


@pytest.mark.parametrize("net_model", ["p2b", "bat"])
def test_live_forward_parity(net_model):
    ref_model, model, variables, our_cfg = _build_pair(net_model)
    ref_model.eval()
    batch = _inputs(net_model)
    with torch.no_grad():
        want = ref_model(_to_torch(batch))
    with jax.default_matmul_precision("highest"):
        got = model.apply(variables, batch, train=False)
    # identical sampling decisions first: any index drift would make the
    # numeric comparison meaningless
    np.testing.assert_array_equal(
        np.asarray(got["sample_idxs"], np.int64),
        want["sample_idxs"].numpy().astype(np.int64),
    )
    for key in FORWARD_KEYS[net_model]:
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=5e-3, err_msg=key
        )


@pytest.mark.parametrize("net_model", ["p2b", "bat"])
def test_live_training_loss_parity(net_model):
    ref_model, model, variables, our_cfg = _build_pair(net_model, seed=1)
    batch = _inputs(net_model, seed=1)

    # live reference: train mode end-to-end (BN batch stats), the actual
    # training_step for the weighted total + the same gather prelude for
    # the individual terms (p2b.py:70-79 / bat.py:125-137)
    ref_model.train()
    torch_batch = _to_torch(batch)
    total_ref = ref_model.training_step(dict(torch_batch), 0)

    ref_model.train()
    out_ref = ref_model(dict(torch_batch))
    n_out = out_ref["estimation_cla"].shape[1]
    idx = out_ref["sample_idxs"][:, :n_out].long()
    loss_batch = dict(torch_batch)
    loss_batch["seg_label"] = torch_batch["seg_label"].gather(1, idx)
    if net_model == "bat":
        loss_batch["points2cc_dist_s"] = torch_batch["points2cc_dist_s"].gather(
            1, idx[:, :, None].repeat(1, 1, 9))
    terms_ref = ref_model.compute_loss(loss_batch, out_ref)

    with jax.default_matmul_precision("highest"):
        output, _ = model.apply(variables, batch, train=True)
        ours = model.loss(our_cfg, batch, output)

    term_keys = ["loss_objective", "loss_box", "loss_seg", "loss_vote"] + (
        ["loss_bc"] if net_model == "bat" else []
    )
    for key in term_keys:
        np.testing.assert_allclose(
            float(ours[key]), float(terms_ref[key]), atol=2e-3, err_msg=key
        )
    np.testing.assert_allclose(
        float(ours["loss_total"]), float(total_ref), atol=5e-3
    )


def test_live_m2track_loss_parity():
    """M2 forward is live-tested in test_reference_live_parity; this covers
    compute_loss (m2track.py:153-231, seg CE weights [0.5, 2.0] .cuda()
    neutralized) on matched outputs through the importer."""
    cfg_dict = dict(
        net_model="m2track", box_aware=True, point_sample_size=64,
        degrees=False, use_z=True, limit_box=False,
        seg_weight=0.1, center_weight=10.0, angle_weight=10.0,
        motion_cls_seg_weight=0.1, bc_weight=1.0, motion_threshold=0.15,
    )
    torch.manual_seed(2)
    ref_model = REF["m2track"].M2TRACK(REF["EasyDict"](cfg_dict))
    _randomize_bn(ref_model)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    our_cfg = make_config(cfg_dict)
    model = get_model("m2track")(our_cfg)
    variables = import_checkpoint(sd, our_cfg, model=model)

    rng = np.random.default_rng(2)
    n = 64
    B = 2
    batch = {
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
    ref_model.train()
    tb = _to_torch(batch)
    out_ref = ref_model(dict(tb))
    terms_ref = ref_model.compute_loss(tb, out_ref)

    with jax.default_matmul_precision("highest"):
        output, _ = model.apply(variables, batch, train=True)

    # train-mode forward: the seg logits (everything upstream of the
    # argmax gate) must match tightly. Downstream heads go through a HARD
    # argmax(cls) point mask — on random noise inputs the two-class logits
    # are razor-close at many points, so float-rounding flips the mask and
    # amplifies; decisive real data doesn't do this (the eval forward test
    # in test_reference_live_parity covers the full composition).
    np.testing.assert_allclose(
        np.asarray(output["seg_logits"]),
        out_ref["seg_logits"].detach().numpy().transpose(0, 2, 1),
        atol=2e-3,
    )

    # loss math parity on identical outputs: feed the LIVE reference
    # forward's outputs into OUR loss and diff every term against the live
    # compute_loss (m2track.py:153-231).
    ref_out_ours = {
        k: v.detach().numpy() for k, v in out_ref.items()
    }
    ref_out_ours["seg_logits"] = ref_out_ours["seg_logits"].transpose(0, 2, 1)
    ours = model.loss(our_cfg, batch, ref_out_ours)

    for key in ["loss_seg", "loss_motion_cls", "loss_center", "loss_angle",
                "loss_center_prev", "loss_angle_prev", "loss_center_aux",
                "loss_angle_aux", "loss_center_motion", "loss_angle_motion",
                "loss_bc", "loss_total"]:
        np.testing.assert_allclose(
            float(ours[key]), float(terms_ref[key]), atol=1e-4, err_msg=key
        )
