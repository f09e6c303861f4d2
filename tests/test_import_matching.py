"""Importer parity for the pt_utils-style structures used by P2B/BAT.

Replicates the reference's pt_utils naming exactly (Seq heads -> `{i}.conv` /
`{i}.bn.bn`, SharedMLP -> `layer{i}.conv` / `layer{i}.bn.bn`;
pointnet2/utils/pytorch_utils.py) with live torch modules, then verifies the
imported flax forward matches torch eval numerics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from open3dsot_tpu.import_torch import ImportMap  # noqa: E402


class _BNWrap(tnn.Module):
    """pt_utils _BNBase: a wrapper whose child is named `bn`."""

    def __init__(self, ch, dims=1):
        super().__init__()
        self.bn = tnn.BatchNorm1d(ch) if dims == 1 else tnn.BatchNorm2d(ch)

    def forward(self, x):
        return self.bn(x)


class _ConvUnit(tnn.Module):
    """pt_utils _ConvBase: children named `conv` / `bn`, optional relu."""

    def __init__(self, cin, cout, bn=True, act=True, dims=1):
        super().__init__()
        conv_cls = tnn.Conv1d if dims == 1 else tnn.Conv2d
        self.conv = conv_cls(cin, cout, 1, bias=not bn)
        self.has_bn, self.has_act = bn, act
        if bn:
            self.bn = _BNWrap(cout, dims)

    def forward(self, x):
        x = self.conv(x)
        if self.has_bn:
            x = self.bn(x)
        if self.has_act:
            x = torch.relu(x)
        return x


def make_pt_seq(channels, final_plain=True, dims=1):
    """Seq(...).conv1d(...).conv1d(out, activation=None) replica."""
    mods = []
    cin = channels[0]
    for i, cout in enumerate(channels[1:]):
        last = i == len(channels) - 2
        plain = final_plain and last
        mods.append(_ConvUnit(cin, cout, bn=not plain, act=not plain, dims=dims))
        cin = cout
    return tnn.Sequential(*mods)


def make_shared_mlp(channels, dims=2):
    """SharedMLP replica: children named layer{i}."""

    class Shared(tnn.Module):
        def __init__(self):
            super().__init__()
            for i, (cin, cout) in enumerate(zip(channels[:-1], channels[1:])):
                self.add_module(f"layer{i}", _ConvUnit(cin, cout, bn=True, act=True, dims=dims))
            self.n = len(channels) - 1

        def forward(self, x):
            for i in range(self.n):
                x = getattr(self, f"layer{i}")(x)
            return x

    return Shared()


def randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)


class TestPtSeqParity:
    def test_head_matches_torch(self):
        from open3dsot_tpu.models.layers import MLP

        torch.manual_seed(0)
        tm = make_pt_seq([8, 16, 16, 4])
        randomize_bn(tm)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        m = ImportMap(sd)
        m.pt_seq("", (), 3)
        variables = m.finish()

        x = np.random.default_rng(0).normal(size=(2, 8, 24)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()  # (B, 4, N)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(
                MLP([16, 16, 4], final_plain=True).apply(
                    variables, x.transpose(0, 2, 1), train=False
                )
            )
        assert np.allclose(got, want.transpose(0, 2, 1), atol=1e-4)


class TestSharedMLPParity:
    def test_grid_mlp_matches_torch(self):
        from open3dsot_tpu.models.layers import MLP

        torch.manual_seed(1)
        tm = make_shared_mlp([6, 8, 8, 8], dims=2)
        randomize_bn(tm)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        m = ImportMap(sd)
        m.shared_mlp("", (), 3)
        variables = m.finish()

        # torch SharedMLP runs on (B, C, npoint, nsample) grids
        x = np.random.default_rng(1).normal(size=(2, 6, 5, 7)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()  # (B, 8, 5, 7)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(
                MLP([8, 8, 8]).apply(
                    variables, x.transpose(0, 2, 3, 1), train=False
                )
            )
        assert np.allclose(got, want.transpose(0, 2, 3, 1), atol=1e-4)


class TestFullBATImport:
    def test_shapes_merge_against_model(self):
        """A full fake BAT state dict (pt_utils naming) imports cleanly."""
        from open3dsot_tpu.config import make_config
        from open3dsot_tpu.import_torch import import_checkpoint
        from open3dsot_tpu.models import get_model

        cfg = make_config(
            dict(
                net_model="bat", template_size=32, search_size=64,
                feature_channel=32, hidden_channel=32, out_channel=32,
                vote_channel=32, num_proposal=8, k=4, bc_channel=9,
                use_fps=True, normalize_xyz=False, box_aware=True,
                degrees=True, use_z=False, limit_box=False,
            )
        )
        model = get_model("bat")(cfg)
        torch.manual_seed(2)

        sd = {}

        def add(name, mod):
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v.detach().numpy()

        # backbone: 3 SA modules with SharedMLP([*, 64,64,128] etc) incl +3 xyz
        class SA(tnn.Module):
            def __init__(self, mlp):
                super().__init__()
                self.mlps = tnn.ModuleList([make_shared_mlp(mlp, dims=2)])

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                self.SA_modules = tnn.ModuleList(
                    [
                        SA([3, 64, 64, 128]),
                        SA([128 + 3, 128, 128, 256]),
                        SA([256 + 3, 256, 256, 256]),
                    ]
                )

        add("backbone", Backbone())
        add("conv_final", tnn.Conv1d(256, 32, 1))
        add("mlp_bc", make_pt_seq([3 + 32, 32, 32, 9]))

        class XCorr(tnn.Module):
            def __init__(self):
                super().__init__()
                self.mlp = make_shared_mlp([32 + 3 + 9, 32, 32, 32], dims=2)
                self.fea_layer = make_pt_seq([32, 32, 32])

        add("xcorr", XCorr())

        class RPN(tnn.Module):
            def __init__(self):
                super().__init__()
                self.FC_layer_cla = make_pt_seq([32, 32, 32, 1])
                self.vote_layer = make_pt_seq([3 + 32, 32, 32, 3 + 32])
                self.vote_aggregation = SA([1 + 32 + 3, 32, 32, 32])
                self.FC_proposal = make_pt_seq([32, 32, 32, 5])

        add("rpn", RPN())

        variables = import_checkpoint(sd, cfg, model=model)
        out = model.apply(variables, model.dummy_batch(2), train=False)
        assert out["estimation_boxes"].shape == (2, 8, 5)
