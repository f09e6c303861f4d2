"""Full-model numeric parity: flax BAT vs a live torch replica.

On top of the P2B coverage (tests/test_full_p2b_parity.py) this exercises
BAT's additions (/root/reference/models/bat.py): FPS centroids on backbone
layer 1 (golden fps_ref on the torch side), the mlp_bc BoxCloud prediction
head, the template-BoxCloud gather through the FPS sample idxs, and
BoxAwareXCorr's k-NN grouping in BoxCloud space.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open3dsot_tpu.import_torch import ImportMap  # noqa: E402
from open3dsot_tpu.ops.reference import ball_query_ref, fps_ref  # noqa: E402
from tests.test_full_p2b_parity import (  # noqa: E402
    SharedMLP2d,
    TorchRPN,
    pt_seq,
)


class TorchSA(tnn.Module):
    def __init__(self, mlp, radius, nsample, use_fps=False):
        super().__init__()
        self.mlps = tnn.ModuleList([SharedMLP2d(mlp)])
        self.radius, self.nsample, self.use_fps = radius, nsample, use_fps

    def forward(self, xyz, features, npoint):
        B = xyz.shape[0]
        if self.use_fps:
            idxs = torch.from_numpy(fps_ref(xyz.numpy(), npoint)).long()
            new_xyz = torch.stack([xyz[b][idxs[b]] for b in range(B)])
        else:
            idxs = torch.arange(npoint)[None].repeat(B, 1)
            new_xyz = xyz[:, :npoint, :]
        nidx = torch.from_numpy(
            ball_query_ref(self.radius, self.nsample, xyz.numpy(), new_xyz.numpy())
        ).long()
        grouped_xyz = torch.stack([xyz[b][nidx[b]] for b in range(B)])
        grouped_xyz = (grouped_xyz - new_xyz[:, :, None, :]).permute(0, 3, 1, 2)
        if features is not None:
            gf = torch.stack(
                [features[b].transpose(0, 1)[nidx[b]] for b in range(B)]
            ).permute(0, 3, 1, 2)
            grouped = torch.cat([grouped_xyz, gf], dim=1)
        else:
            grouped = grouped_xyz
        out = torch.max(self.mlps[0](grouped), dim=-1)[0]
        return new_xyz, out, idxs


class TorchBackbone(tnn.Module):
    def __init__(self, use_fps):
        super().__init__()
        self.SA_modules = tnn.ModuleList(
            [
                TorchSA([3, 16, 16, 32], 0.3, 8, use_fps=use_fps),
                TorchSA([32 + 3, 32, 32, 32], 0.5, 8),
                TorchSA([32 + 3, 32, 32, 32], 0.7, 8),
            ]
        )

    def forward(self, pc, numpoints):
        xyz, features = pc, None
        idx0 = None
        for i, sa in enumerate(self.SA_modules):
            xyz, features, idxs = sa(xyz, features, numpoints[i])
            if i == 0:
                idx0 = idxs
        return xyz, features, idx0


class TorchBoxAwareXCorr(tnn.Module):
    def __init__(self, f, hidden, out, k):
        super().__init__()
        self.k = k
        self.mlp = SharedMLP2d([f + 3 + 9, hidden, hidden, hidden])
        self.fea_layer = pt_seq([hidden, hidden, out])

    def forward(self, t_feat, s_feat, t_xyz, s_xyz, t_bc, s_bc):
        B = t_feat.shape[0]
        dist = torch.cdist(t_bc, s_bc)  # (B, M, N)
        t_xfb = torch.cat(
            [t_xyz.transpose(1, 2), t_bc.transpose(1, 2), t_feat], dim=1
        )  # (B, 3+9+f, M)
        idx = torch.argsort(dist, dim=1)[:, : self.k, :].transpose(1, 2)  # (B,N,k)
        corr = torch.stack(
            [t_xfb[b].transpose(0, 1)[idx[b]] for b in range(B)]
        ).permute(0, 3, 1, 2)  # (B, C, N, k)
        fused = torch.max(self.mlp(corr), dim=-1)[0]
        return self.fea_layer(fused)


class TorchBAT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchBackbone(use_fps=True)
        self.conv_final = tnn.Conv1d(32, 16, 1)
        self.mlp_bc = pt_seq([3 + 16, 16, 16, 9])
        self.xcorr = TorchBoxAwareXCorr(16, 16, 16, k=4)
        self.rpn = TorchRPN(16, 16, 8)

    def forward(self, template, search, template_bc):
        M, N = template.shape[1], search.shape[1]
        t_xyz, t_feat, t_idx = self.backbone(template, [M // 2, M // 4, M // 8])
        s_xyz, s_feat, _ = self.backbone(search, [N // 2, N // 4, N // 8])
        t_feat = self.conv_final(t_feat)
        s_feat = self.conv_final(s_feat)
        pred_s_bc = self.mlp_bc(
            torch.cat([s_xyz.transpose(1, 2), s_feat], dim=1)
        ).transpose(1, 2)  # (B, N//8, 9)
        gi = t_idx[:, : M // 8, None].repeat(1, 1, 9)
        t_bc = template_bc.gather(dim=1, index=gi)
        fusion = self.xcorr(t_feat, s_feat, t_xyz, s_xyz, t_bc, pred_s_bc)
        return self.rpn(s_xyz, fusion)


class TestFullBATParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(0)
        tm = TorchBAT()
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                with torch.no_grad():
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.2)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        # matching small flax BAT (nsample=8 everywhere to mirror the replica)
        import flax.linen as nn

        from open3dsot_tpu.models.layers import MLP as FMLP
        from open3dsot_tpu.models.pointnet import SetAbstraction
        from open3dsot_tpu.models.xcorr import BoxAwareXCorr
        from open3dsot_tpu.ops import gather_points

        class SmallBackbone(nn.Module):
            use_fps: bool = True

            @nn.compact
            def __call__(self, pc, numpoints, train=False):
                xyz, features = pc[..., :3], None
                specs = [
                    ([16, 16, 32], 0.3, self.use_fps),
                    ([32, 32, 32], 0.5, False),
                    ([32, 32, 32], 0.7, False),
                ]
                idx0 = None
                for i, (mlp, radius, fps) in enumerate(specs):
                    xyz, features, idx = SetAbstraction(
                        mlp=mlp, radius=radius, nsample=8, use_fps=fps,
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

        class SmallBAT(nn.Module):
            @nn.compact
            def __call__(self, template, search, template_bc, train=False):
                M, N = template.shape[1], search.shape[1]
                backbone = SmallBackbone(name="backbone")
                conv_final = nn.Dense(16, name="conv_final")
                t_xyz, t_feat, t_idx = backbone(template, [M // 2, M // 4, M // 8], train)
                s_xyz, s_feat, _ = backbone(search, [N // 2, N // 4, N // 8], train)
                t_feat, s_feat = conv_final(t_feat), conv_final(s_feat)
                pred_s_bc = FMLP([16, 16, 9], final_plain=True, name="mlp_bc")(
                    jnp.concatenate([s_xyz, s_feat], axis=-1), train=train
                )
                t_bc = gather_points(template_bc, t_idx[:, : M // 8])
                fusion = BoxAwareXCorr(
                    hidden_channel=16, out_channel=16, k=4, name="xcorr"
                )(t_feat, s_feat, t_xyz, s_xyz, t_bc, pred_s_bc, train=train)
                return SmallRPN(name="rpn")(s_xyz, fusion, train=train)

        net = SmallBAT()
        rng = np.random.default_rng(0)
        template = rng.normal(size=(2, 64, 3)).astype(np.float32)
        search = rng.normal(size=(2, 128, 3)).astype(np.float32)
        template_bc = np.abs(rng.normal(size=(2, 64, 9))).astype(np.float32)
        variables = net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(template), jnp.asarray(search), jnp.asarray(template_bc),
        )

        m = ImportMap(sd)
        m.backbone("backbone", ("backbone",))
        m.dense("conv_final", ("conv_final",))
        m.pt_seq("mlp_bc", ("mlp_bc",), 3)
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
                torch.from_numpy(template),
                torch.from_numpy(search),
                torch.from_numpy(template_bc),
            )
        with jax.default_matmul_precision("highest"):
            boxes_j, cla_j, vote_j, centers_j = net.apply(
                imported,
                jnp.asarray(template), jnp.asarray(search), jnp.asarray(template_bc),
            )

        assert np.allclose(np.asarray(cla_j), cla_t.numpy(), atol=2e-3)
        assert np.allclose(np.asarray(vote_j), vote_t.numpy(), atol=2e-3)
        assert np.allclose(np.asarray(centers_j), centers_t.numpy(), atol=2e-3)
        assert np.allclose(np.asarray(boxes_j), boxes_t.numpy(), atol=5e-3), np.abs(
            np.asarray(boxes_j) - boxes_t.numpy()
        ).max()
