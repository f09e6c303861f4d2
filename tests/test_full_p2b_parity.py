"""Full-model numeric parity: flax P2B vs a live torch replica.

Covers the wiring the component tests can't: the shared siamese PointNet++
backbone (first-npoint centroids, ball-query grouping with pad-with-first,
[centered-xyz || features] concat, SharedMLP, max over nsample), the dense
cosine xcorr grid, and the VoteNet RPN — assembled with the reference's
state_dict names so import_p2b maps the torch weights directly
(/root/reference/models/p2b.py, pointnet2_modules.py:24-149, rpn.py:12-67).

The torch replica uses the numpy golden ball-query (ops/reference.py) for
neighborhood indices — index semantics already golden-tested — and torch
modules for all learnable compute.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from open3dsot_tpu.config import make_config  # noqa: E402
from open3dsot_tpu.import_torch import import_checkpoint  # noqa: E402
from open3dsot_tpu.models import get_model  # noqa: E402
from open3dsot_tpu.ops.reference import ball_query_ref  # noqa: E402


class _BNWrap(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.bn = tnn.BatchNorm2d(ch)

    def forward(self, x):
        return self.bn(x)


class _BNWrap1d(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.bn = tnn.BatchNorm1d(ch)

    def forward(self, x):
        return self.bn(x)


class _Conv2dUnit(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = _BNWrap(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _Conv1dUnit(tnn.Module):
    def __init__(self, cin, cout, plain=False):
        super().__init__()
        self.plain = plain
        self.conv = tnn.Conv1d(cin, cout, 1, bias=plain)
        if not plain:
            self.bn = _BNWrap1d(cout)

    def forward(self, x):
        x = self.conv(x)
        if not self.plain:
            x = torch.relu(self.bn(x))
        return x


class SharedMLP2d(tnn.Module):
    def __init__(self, channels):
        super().__init__()
        for i, (a, b) in enumerate(zip(channels[:-1], channels[1:])):
            self.add_module(f"layer{i}", _Conv2dUnit(a, b))
        self.n = len(channels) - 1

    def forward(self, x):
        for i in range(self.n):
            x = getattr(self, f"layer{i}")(x)
        return x


def pt_seq(channels):
    mods = []
    for i, (a, b) in enumerate(zip(channels[:-1], channels[1:])):
        mods.append(_Conv1dUnit(a, b, plain=(i == len(channels) - 2)))
    return tnn.Sequential(*mods)


class TorchSA(tnn.Module):
    """Reference _PointnetSAModuleBase forward, use_fps=False
    (pointnet2_modules.py:31-79)."""

    def __init__(self, mlp, radius, nsample):
        super().__init__()
        self.mlps = tnn.ModuleList([SharedMLP2d(mlp)])
        self.radius, self.nsample = radius, nsample

    def forward(self, xyz, features, npoint):
        B = xyz.shape[0]
        new_xyz = xyz[:, :npoint, :]
        idx = torch.from_numpy(
            ball_query_ref(self.radius, self.nsample, xyz.numpy(), new_xyz.numpy())
        ).long()  # (B, S, K)
        grouped_xyz = torch.stack(
            [xyz[b][idx[b]] for b in range(B)]
        )  # (B, S, K, 3)
        grouped_xyz = (grouped_xyz - new_xyz[:, :, None, :]).permute(0, 3, 1, 2)
        if features is not None:
            gf = torch.stack(
                [features[b].transpose(0, 1)[idx[b]] for b in range(B)]
            ).permute(0, 3, 1, 2)  # (B, C, S, K)
            grouped = torch.cat([grouped_xyz, gf], dim=1)
        else:
            grouped = grouped_xyz
        out = self.mlps[0](grouped)  # (B, C', S, K)
        out = torch.max(out, dim=-1)[0]
        return new_xyz, out


class TorchBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        self.SA_modules = tnn.ModuleList(
            [
                TorchSA([3, 16, 16, 32], 0.3, 8),
                TorchSA([32 + 3, 32, 32, 32], 0.5, 8),
                TorchSA([32 + 3, 32, 32, 32], 0.7, 8),
            ]
        )

    def forward(self, pc, numpoints):
        xyz, features = pc, None
        for i, sa in enumerate(self.SA_modules):
            xyz, features = sa(xyz, features, numpoints[i])
        return xyz, features


class TorchXCorr(tnn.Module):
    def __init__(self, f, hidden, out):
        super().__init__()
        self.mlp = SharedMLP2d([f + 4, hidden, hidden, hidden])
        self.fea_layer = pt_seq([hidden, hidden, out])
        self.cos = tnn.CosineSimilarity(dim=1)

    def forward(self, t_feat, s_feat, t_xyz):
        B, f, M = t_feat.shape
        N = s_feat.shape[2]
        sim = self.cos(
            t_feat.unsqueeze(-1).expand(B, f, M, N),
            s_feat.unsqueeze(2).expand(B, f, M, N),
        )  # (B, M, N)
        fusion = torch.cat(
            [
                sim.unsqueeze(1),
                t_xyz.transpose(1, 2).unsqueeze(-1).expand(B, 3, M, N),
                t_feat.unsqueeze(-1).expand(B, f, M, N),
            ],
            dim=1,
        )
        fusion = self.mlp(fusion)
        fusion = torch.max(fusion, dim=2)[0]  # max over template dim
        return self.fea_layer(fusion)


class TorchRPN(tnn.Module):
    def __init__(self, f, vote, num_proposal):
        super().__init__()
        self.num_proposal = num_proposal
        self.FC_layer_cla = pt_seq([f, f, f, 1])
        self.vote_layer = pt_seq([3 + f, f, f, 3 + f])
        self.vote_aggregation = TorchSA([1 + f + 3, vote, vote, vote], 0.3, 8)
        self.FC_proposal = pt_seq([vote, vote, vote, 5])

    def forward(self, xyz, feature):
        cla = self.FC_layer_cla(feature).squeeze(1)
        score = cla.sigmoid()
        xyz_feature = torch.cat([xyz.transpose(1, 2), feature], dim=1)
        offset = self.vote_layer(xyz_feature)
        vote = xyz_feature + offset
        vote_xyz = vote[:, :3, :].transpose(1, 2)
        vote_feature = torch.cat([score.unsqueeze(1), vote[:, 3:, :]], dim=1)
        centers, props = self.vote_aggregation(
            vote_xyz.contiguous(), vote_feature, self.num_proposal
        )
        po = self.FC_proposal(props)
        boxes = torch.cat(
            [po[:, 0:3, :] + centers.transpose(1, 2), po[:, 3:5, :]], dim=1
        )
        return boxes.transpose(1, 2), cla, vote_xyz, centers


class TorchP2B(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchBackbone()
        self.conv_final = tnn.Conv1d(32, 16, 1)
        self.xcorr = TorchXCorr(16, 16, 16)
        self.rpn = TorchRPN(16, 16, 8)

    def forward(self, template, search):
        M, N = template.shape[1], search.shape[1]
        t_xyz, t_feat = self.backbone(template, [M // 2, M // 4, M // 8])
        s_xyz, s_feat = self.backbone(search, [N // 2, N // 4, N // 8])
        t_feat = self.conv_final(t_feat)
        s_feat = self.conv_final(s_feat)
        fusion = self.xcorr(t_feat, s_feat, t_xyz)
        return self.rpn(s_xyz, fusion)


class TestFullP2BParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(0)
        tm = TorchP2B()
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                with torch.no_grad():
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.2)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = make_config(
            dict(
                net_model="p2b", template_size=64, search_size=128,
                feature_channel=16, hidden_channel=16, out_channel=16,
                vote_channel=16, num_proposal=8, use_fps=False,
                normalize_xyz=False, degrees=True, use_z=False, limit_box=False,
            )
        )
        model = get_model("p2b")(cfg)
        # flax SA uses nsample=32/num_proposal SA nsample=16; shrink to match
        # the torch replica's nsample=8 by monkey-building a matching net
        from open3dsot_tpu.models.p2b import P2BNet

        # NOTE: the production nets hardcode the reference nsample=32/16; the
        # torch replica uses nsample=8 to keep the test light, so we compare
        # against a matching flax net built with the same spec.
        import flax.linen as nn
        import jax.numpy as jnp

        from open3dsot_tpu.models.pointnet import SetAbstraction
        from open3dsot_tpu.models.layers import MLP as FMLP
        from open3dsot_tpu.models.xcorr import P2BXCorr

        class SmallBackbone(nn.Module):
            @nn.compact
            def __call__(self, pc, numpoints, train=False):
                xyz, features = pc[..., :3], None
                specs = [
                    ([16, 16, 32], 0.3),
                    ([32, 32, 32], 0.5),
                    ([32, 32, 32], 0.7),
                ]
                for i, (mlp, radius) in enumerate(specs):
                    xyz, features, idx = SetAbstraction(
                        mlp=mlp, radius=radius, nsample=8, use_fps=False,
                        name=f"sa{i}",
                    )(xyz, features, numpoints[i], train=train)
                    if i == 0:
                        idx0 = idx
                return xyz, features, idx0

        class SmallRPN(nn.Module):
            @nn.compact
            def __call__(self, xyz, feature, train=False):
                cla = FMLP([16, 16, 1], final_plain=True, name="FC_layer_cla")(
                    feature, train=train
                )[..., 0]
                score = nn.sigmoid(cla)
                xyz_feature = jnp.concatenate([xyz, feature], axis=-1)
                offset = FMLP([16, 16, 19], final_plain=True, name="vote_layer")(
                    xyz_feature, train=train
                )
                vote = xyz_feature + offset
                vote_xyz, vote_feature = vote[..., :3], vote[..., 3:]
                vote_feature = jnp.concatenate([score[..., None], vote_feature], -1)
                centers, props, _ = SetAbstraction(
                    mlp=[16, 16, 16], radius=0.3, nsample=8, use_fps=False,
                    name="vote_aggregation",
                )(vote_xyz, vote_feature, 8, train=train)
                po = FMLP([16, 16, 5], final_plain=True, name="FC_proposal")(
                    props, train=train
                )
                boxes = jnp.concatenate([po[..., :3] + centers, po[..., 3:5]], -1)
                return boxes, cla, vote_xyz, centers

        class SmallP2B(nn.Module):
            @nn.compact
            def __call__(self, template, search, train=False):
                M, N = template.shape[1], search.shape[1]
                backbone = SmallBackbone(name="backbone")
                conv_final = nn.Dense(16, name="conv_final")
                t_xyz, t_feat, _ = backbone(template, [M // 2, M // 4, M // 8], train)
                s_xyz, s_feat, s_idx = backbone(search, [N // 2, N // 4, N // 8], train)
                t_feat, s_feat = conv_final(t_feat), conv_final(s_feat)
                fusion = P2BXCorr(hidden_channel=16, out_channel=16, name="xcorr")(
                    t_feat, s_feat, t_xyz, train=train
                )
                return SmallRPN(name="rpn")(s_xyz, fusion, train=train)

        net = SmallP2B()
        rng = np.random.default_rng(0)
        template = rng.normal(size=(2, 64, 3)).astype(np.float32)
        search = rng.normal(size=(2, 128, 3)).astype(np.float32)
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(template), jnp.asarray(search)
        )

        from open3dsot_tpu.import_torch import ImportMap

        m = ImportMap(sd)
        m.backbone("backbone", ("backbone",))
        m.dense("conv_final", ("conv_final",))
        m.shared_mlp("xcorr.mlp", ("xcorr", "mlp"), 3)
        m.pt_seq("xcorr.fea_layer", ("xcorr", "fea_layer"), 2)
        m.pt_seq("rpn.FC_layer_cla", ("rpn", "FC_layer_cla"), 3)
        m.pt_seq("rpn.vote_layer", ("rpn", "vote_layer"), 3)
        m.shared_mlp(
            "rpn.vote_aggregation.mlps.0", ("rpn", "vote_aggregation", "mlp_shared"), 3
        )
        m.pt_seq("rpn.FC_proposal", ("rpn", "FC_proposal"), 3)
        imported = m.finish()

        with torch.no_grad():
            boxes_t, cla_t, vote_t, centers_t = tm(
                torch.from_numpy(template), torch.from_numpy(search)
            )
        with jax.default_matmul_precision("highest"):
            boxes_j, cla_j, vote_j, centers_j = net.apply(
                imported, jnp.asarray(template), jnp.asarray(search)
            )

        assert np.allclose(np.asarray(cla_j), cla_t.numpy(), atol=2e-3), np.abs(
            np.asarray(cla_j) - cla_t.numpy()
        ).max()
        assert np.allclose(np.asarray(vote_j), vote_t.numpy(), atol=2e-3)
        assert np.allclose(np.asarray(centers_j), centers_t.numpy(), atol=2e-3)
        assert np.allclose(np.asarray(boxes_j), boxes_t.numpy(), atol=5e-3), np.abs(
            np.asarray(boxes_j) - boxes_t.numpy()
        ).max()
