"""Torch checkpoint EXPORT (export_torch.py): the inverse of the importer.

Gold standard: weights trained/initialized in THIS framework, exported to a
torch state_dict and loaded into the LIVE reference model, must produce the
reference's forward outputs — including the bias-folding equivalence for
torch-suppressed conv biases.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests._reference_live import load_reference  # noqa: E402

REF = load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo unavailable")

from open3dsot_tpu.config import make_config  # noqa: E402
from open3dsot_tpu.export_torch import export_checkpoint, save_checkpoint  # noqa: E402
from open3dsot_tpu.import_torch import import_checkpoint  # noqa: E402
from open3dsot_tpu.models import get_model  # noqa: E402

from tests.test_reference_live_matching import (  # noqa: E402
    FORWARD_KEYS,
    _inputs,
    _matching_cfg,
    _to_torch,
)

M2_CFG = dict(
    net_model="m2track", box_aware=True, point_sample_size=64,
    degrees=False, use_z=True, limit_box=False,
)


def _build(net_model):
    """Reference module (for the template + live check) and OUR fresh
    variables (different seed — export must carry real values)."""
    cfg_dict = M2_CFG if net_model == "m2track" else _matching_cfg(net_model)
    torch.manual_seed(0)
    if net_model == "m2track":
        ref_model = REF["m2track"].M2TRACK(REF["EasyDict"](cfg_dict))
    else:
        ref_cls = REF[net_model].P2B if net_model == "p2b" else REF[net_model].BAT
        ref_model = ref_cls(REF["EasyDict"](cfg_dict))
    template = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    cfg = make_config(cfg_dict)
    model = get_model(net_model)(cfg)
    variables = model.init(jax.random.PRNGKey(42), model.dummy_batch(2))
    # make BN stats + dense biases non-trivial so folding is actually tested
    variables = jax.tree_util.tree_map(np.asarray, variables)

    rng = np.random.default_rng(7)

    def perturb(tree):
        for k, v in sorted(tree.items()):
            if isinstance(v, dict):
                perturb(v)
            else:
                tree[k] = v + rng.normal(scale=0.05, size=v.shape).astype(v.dtype)

    perturb(variables["params"])

    # keep variances positive
    def fix_var(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                fix_var(v)
            elif k == "var":
                tree[k] = np.abs(v) + 0.5
            elif k == "mean":
                rng = np.random.default_rng(0)
                tree[k] = v + rng.normal(scale=0.05, size=v.shape).astype(v.dtype)

    fix_var(variables["batch_stats"])
    return ref_model, cfg, model, variables, template


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _m2_inputs(seed=0, n=64, B=2):
    rng = np.random.default_rng(seed)
    return {
        "points": rng.normal(size=(B, 2 * n, 5)).astype(np.float32),
        "candidate_bc": np.abs(rng.normal(size=(B, 2 * n, 9))).astype(np.float32),
    }


@pytest.mark.parametrize("net_model", ["p2b", "bat", "m2track"])
def test_export_loads_into_live_reference_with_same_outputs(net_model):
    ref_model, cfg, model, variables, template = _build(net_model)
    sd = export_checkpoint(variables, cfg, template)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    ref_model.eval()

    batch = _m2_inputs() if net_model == "m2track" else _inputs(net_model)
    with torch.no_grad():
        want = ref_model(_to_torch(batch))
    with jax.default_matmul_precision("highest"):
        got = model.apply(variables, batch, train=False)

    if net_model == "m2track":
        np.testing.assert_allclose(
            np.asarray(got["seg_logits"]),
            want["seg_logits"].numpy().transpose(0, 2, 1), atol=2e-3)
        keys = ["aux_estimation_boxes", "estimation_boxes", "motion_pred"]
    else:
        keys = FORWARD_KEYS[net_model]
    for k in keys:
        w = want[k].numpy()
        g = np.asarray(got[k])
        if w.ndim == 3 and w.shape[1] != g.shape[1] and w.shape[1] == g.shape[2]:
            w = w.transpose(0, 2, 1)  # reference is channels-first
        np.testing.assert_allclose(g, w, atol=2e-3, err_msg=k)


@pytest.mark.parametrize("net_model", ["bat", "m2track"])
def test_export_import_roundtrip_preserves_function(net_model):
    """import(export(V)) must compute the same function as V (the folded
    biases move into BN means, so compare outputs, not leaves)."""
    _, cfg, model, variables, template = _build(net_model)
    sd = export_checkpoint(variables, cfg, template)
    variables2 = import_checkpoint(sd, cfg, model=model)

    batch = _m2_inputs() if net_model == "m2track" else _inputs(net_model)
    out1 = model.apply(variables, batch, train=False)
    out2 = model.apply(variables2, batch, train=False)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out2[k]), atol=1e-4, err_msg=k)


def test_save_checkpoint_payload(tmp_path):
    _, cfg, model, variables, template = _build("m2track")
    path = save_checkpoint(variables, cfg, template, str(tmp_path / "out.ckpt"))
    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert "state_dict" in payload
    assert set(payload["state_dict"]) == set(template)
