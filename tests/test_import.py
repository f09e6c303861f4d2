"""Torch-checkpoint importer: numeric parity against live torch modules.

Builds torch replicas of the reference's building blocks (same nn.Sequential
structure and state_dict names), imports their weights through
open3dsot_tpu.import_torch, and checks the flax forward matches the torch
eval forward to float tolerance. This validates conv/linear weight layout,
BN eps/momentum semantics and the name mapping in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from open3dsot_tpu.import_torch import ImportMap  # noqa: E402


def make_torch_mini_pointnet(in_ch, per_point, hidden):
    seq = []
    c = in_ch
    for out in per_point:
        seq += [tnn.Conv1d(c, out, 1), tnn.BatchNorm1d(out), tnn.ReLU()]
        c = out
    seq += [tnn.AdaptiveMaxPool1d(output_size=1), tnn.Flatten()]
    for out in hidden:
        seq += [tnn.Linear(c, out), tnn.BatchNorm1d(out), tnn.ReLU()]
        c = out

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*seq)

        def forward(self, x):
            return self.features(x)

    return M()


def make_torch_plain_mlp(in_ch, mid, out):
    return tnn.Sequential(
        tnn.Linear(in_ch, mid), tnn.BatchNorm1d(mid), tnn.ReLU(),
        tnn.Linear(mid, mid), tnn.BatchNorm1d(mid), tnn.ReLU(),
        tnn.Linear(mid, out),
    )


def randomize_bn_stats(module):
    """Give BN layers non-trivial running stats so eval-mode parity is real."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)


class TestMiniPointNetParity:
    def test_forward_matches_torch(self):
        from open3dsot_tpu.models.pointnet import MiniPointNet

        torch.manual_seed(0)
        tm = make_torch_mini_pointnet(5, [8, 16], [16, 8])
        randomize_bn_stats(tm)
        tm.eval()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        m = ImportMap(sd)
        m.mini_pointnet("", (), 2, 2)
        variables = m.finish()

        x = np.random.default_rng(0).normal(size=(3, 5, 32)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()  # (B, 8)

        net = MiniPointNet(per_point_mlp=[8, 16], hidden_mlp=[16, 8], output_size=-1)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(net.apply(variables, x.transpose(0, 2, 1), train=False))
        assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


class TestPlainMLPParity:
    def test_forward_matches_torch(self):
        from open3dsot_tpu.models.layers import MLP

        torch.manual_seed(1)
        tm = make_torch_plain_mlp(16, 32, 4)
        randomize_bn_stats(tm)
        tm.eval()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        m = ImportMap(sd)
        m.plain_sequential_mlp("", (), 3)
        variables = m.finish()

        x = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(
                MLP([32, 32, 4], final_plain=True).apply(variables, x, train=False)
            )
        assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


class TestSegPointNetParity:
    def make_torch_seg(self, in_ch, mlp1, mlp2, out_size):
        class Seg(tnn.Module):
            def __init__(self):
                super().__init__()
                self.seq_per_point = tnn.ModuleList()
                c = in_ch
                for o in mlp1:
                    self.seq_per_point.append(
                        tnn.Sequential(tnn.Conv1d(c, o, 1), tnn.BatchNorm1d(o), tnn.ReLU())
                    )
                    c = o
                self.pool = tnn.AdaptiveMaxPool1d(output_size=1)
                self.seq_per_point2 = tnn.ModuleList()
                c = c + mlp1[1]
                for o in mlp2:
                    self.seq_per_point2.append(
                        tnn.Sequential(tnn.Conv1d(c, o, 1), tnn.BatchNorm1d(o), tnn.ReLU())
                    )
                    c = o
                self.fc = tnn.Conv1d(c, out_size, 1)

            def forward(self, x):
                tap = None
                for i, mlp in enumerate(self.seq_per_point):
                    x = mlp(x)
                    if i == 1:
                        tap = x
                pooled = self.pool(x)
                x = torch.cat([tap, pooled.expand_as(x)], dim=1)
                for mlp in self.seq_per_point2:
                    x = mlp(x)
                return self.fc(x)

        return Seg()

    def test_forward_matches_torch(self):
        from open3dsot_tpu.models.pointnet import SegPointNet

        torch.manual_seed(2)
        tm = self.make_torch_seg(5, [8, 8, 16], [16, 8], 2)
        randomize_bn_stats(tm)
        tm.eval()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        m = ImportMap(sd)
        m.seg_pointnet("", (), 3, 2)
        variables = m.finish()

        x = np.random.default_rng(2).normal(size=(2, 5, 24)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()  # (B, 2, N)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(
                SegPointNet(per_point_mlp1=[8, 8, 16], per_point_mlp2=[16, 8], output_size=2)
                .apply(variables, x.transpose(0, 2, 1), train=False)
            )
        assert np.allclose(got, want.transpose(0, 2, 1), atol=1e-4)


class TestFullM2TrackImport:
    def test_import_into_model_shapes(self):
        """A fake full M2-Track state dict imports and merges against init."""
        from open3dsot_tpu.config import make_config
        from open3dsot_tpu.import_torch import import_checkpoint
        from open3dsot_tpu.models import get_model

        cfg = make_config(
            dict(net_model="m2track", box_aware=True, point_sample_size=32,
                 degrees=False, use_z=True, limit_box=False)
        )
        model = get_model("m2track")(cfg)

        # build torch replicas of each submodule to harvest a full state dict
        torch.manual_seed(3)
        bc = 9
        seg = TestSegPointNetParity().make_torch_seg(5 + bc, [64, 64, 64, 128, 1024], [512, 256, 128, 128], 2 + bc)
        mini = make_torch_mini_pointnet(4 + bc, [64, 128, 256, 512], [512, 256])
        mini2 = make_torch_mini_pointnet(3 + bc, [64, 128, 256, 512], [512, 256])
        motion = make_torch_plain_mlp(256, 128, 4)
        motion_state = make_torch_plain_mlp(256, 128, 2)
        final = make_torch_plain_mlp(256, 128, 4)
        box = make_torch_plain_mlp(256, 128, 4)

        sd = {}
        for name, mod in [
            ("seg_pointnet", seg), ("mini_pointnet", mini), ("mini_pointnet2", mini2),
            ("motion_mlp", motion), ("motion_state_mlp", motion_state),
            ("final_mlp", final), ("box_mlp", box),
        ]:
            for k, v in mod.state_dict().items():
                key = f"{name}.{k}"
                # plain Sequential heads don't have the .features prefix
                key = key.replace("motion_mlp.features.", "motion_mlp.")
                sd[key] = v.detach().numpy()
        # strip the num_batches_tracked entries (unused)
        sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
        # fix plain-MLP key prefixes (state_dict of nn.Sequential has bare indices)
        fixed = {}
        for k, v in sd.items():
            fixed[k] = v
        variables = import_checkpoint(fixed, cfg, model=model)

        out = model.apply(variables, model.dummy_batch(2), train=False)
        assert out["estimation_boxes"].shape == (2, 4)
