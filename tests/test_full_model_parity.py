"""Full-model numeric parity: flax M2-Track vs a live torch replica.

Component-level parity is covered by tests/test_import*.py; this test wires a
COMPLETE torch M2-Track (seg pointnet -> masking -> mini pointnet -> motion /
state / prev heads -> stage-1 box -> rigid stage-2 refinement), built to the
reference's forward semantics (models/m2track.py:73-151) with matching
state_dict names, and checks the imported flax model reproduces its eval
forward end to end — including the argmax masking and the on-device rigid
box math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from open3dsot_tpu.config import make_config  # noqa: E402
from open3dsot_tpu.import_torch import import_checkpoint  # noqa: E402
from open3dsot_tpu.models import get_model  # noqa: E402


def rotz_t(t):
    c, s = torch.cos(t), torch.sin(t)
    zero, one = torch.zeros_like(t), torch.ones_like(t)
    return torch.stack(
        [
            torch.stack([c, -s, zero], -1),
            torch.stack([s, c, zero], -1),
            torch.stack([zero, zero, one], -1),
        ],
        -2,
    )


def get_offset_box_t(ref, off):
    rot = rotz_t(ref[:, 3])
    new_center = torch.matmul(rot, off[:, :3, None])[:, :, 0] + ref[:, :3]
    return torch.cat([new_center, (ref[:, 3] + off[:, 3])[:, None]], -1)


def get_offset_points_t(points, ref, off):
    rot = rotz_t(-ref[:, 3])
    p = points - ref[:, None, :3]
    p = torch.matmul(p, rot.transpose(1, 2))
    rot_off = rotz_t(off[:, 3])
    p = torch.matmul(p, rot_off.transpose(1, 2)) + off[:, None, :3]
    p = torch.matmul(p, rot)
    return p + ref[:, None, :3]


def remove_transform_points_t(points, ref):
    rot = rotz_t(-ref[:, 3])
    return torch.matmul(points - ref[:, None, :3], rot.transpose(1, 2))


class TorchSeg(tnn.Module):
    def __init__(self, in_ch, mlp1, mlp2, out):
        super().__init__()
        self.seq_per_point = tnn.ModuleList()
        c = in_ch
        for o in mlp1:
            self.seq_per_point.append(
                tnn.Sequential(tnn.Conv1d(c, o, 1), tnn.BatchNorm1d(o), tnn.ReLU())
            )
            c = o
        self.pool = tnn.AdaptiveMaxPool1d(1)
        self.seq_per_point2 = tnn.ModuleList()
        c = c + mlp1[1]
        for o in mlp2:
            self.seq_per_point2.append(
                tnn.Sequential(tnn.Conv1d(c, o, 1), tnn.BatchNorm1d(o), tnn.ReLU())
            )
            c = o
        self.fc = tnn.Conv1d(c, out, 1)

    def forward(self, x):
        tap = None
        for i, m in enumerate(self.seq_per_point):
            x = m(x)
            if i == 1:
                tap = x
        pooled = self.pool(x)
        x = torch.cat([tap, pooled.expand_as(x)], dim=1)
        for m in self.seq_per_point2:
            x = m(x)
        return self.fc(x)


class TorchMini(tnn.Module):
    def __init__(self, in_ch, per_point, hidden):
        super().__init__()
        seq = []
        c = in_ch
        for o in per_point:
            seq += [tnn.Conv1d(c, o, 1), tnn.BatchNorm1d(o), tnn.ReLU()]
            c = o
        seq += [tnn.AdaptiveMaxPool1d(1), tnn.Flatten()]
        for o in hidden:
            seq += [tnn.Linear(c, o), tnn.BatchNorm1d(o), tnn.ReLU()]
            c = o
        self.features = tnn.Sequential(*seq)

    def forward(self, x):
        return self.features(x)


def head(cin, mid, out):
    return tnn.Sequential(
        tnn.Linear(cin, mid), tnn.BatchNorm1d(mid), tnn.ReLU(),
        tnn.Linear(mid, mid), tnn.BatchNorm1d(mid), tnn.ReLU(),
        tnn.Linear(mid, out),
    )


class TorchM2Track(tnn.Module):
    """Reference forward semantics (m2track.py:73-151), box_aware=True."""

    def __init__(self):
        super().__init__()
        bc = 9
        self.seg_pointnet = TorchSeg(5 + bc, [64, 64, 64, 128, 1024],
                                     [512, 256, 128, 128], 2 + bc)
        self.mini_pointnet = TorchMini(4 + bc, [64, 128, 256, 512], [512, 256])
        self.mini_pointnet2 = TorchMini(3 + bc, [64, 128, 256, 512], [512, 256])
        self.motion_mlp = head(256, 128, 4)
        self.motion_state_mlp = head(256, 128, 2)
        self.final_mlp = head(256, 128, 4)
        self.box_mlp = head(256, 128, 4)

    def forward(self, points, candidate_bc):
        x = torch.cat([points, candidate_bc], dim=-1).transpose(1, 2)  # (B,C,N)
        B, _, N = x.shape
        seg_out = self.seg_pointnet(x)
        seg_logits = seg_out[:, :2, :]
        pred_cls = torch.argmax(seg_logits, dim=1, keepdim=True).float()
        mask_points = x[:, :4, :] * pred_cls
        mask_xyz_t0 = mask_points[:, :3, : N // 2]
        mask_xyz_t1 = mask_points[:, :3, N // 2 :]
        pred_bc = seg_out[:, 2:, :]
        mask_pred_bc = pred_bc * pred_cls
        mask_points = torch.cat([mask_points, mask_pred_bc], dim=1)

        feat = self.mini_pointnet(mask_points)
        motion_pred = self.motion_mlp(feat)
        motion_mask = torch.argmax(self.motion_state_mlp(feat), dim=1, keepdim=True)
        motion_pred_masked = motion_pred * motion_mask
        prev_boxes = self.final_mlp(feat)
        aux_box = get_offset_box_t(prev_boxes, motion_pred_masked)

        t0_moved = get_offset_points_t(
            mask_xyz_t0.transpose(1, 2), prev_boxes[:, :4], motion_pred_masked
        ).transpose(1, 2)
        t01 = torch.cat([t0_moved, mask_xyz_t1], dim=-1)
        t01 = remove_transform_points_t(t01.transpose(1, 2), aux_box).transpose(1, 2)
        t01 = torch.cat([t01, mask_pred_bc], dim=1)
        offset = self.box_mlp(self.mini_pointnet2(t01))
        final = get_offset_box_t(aux_box, offset)
        return {
            "seg_logits": seg_logits,
            "aux_estimation_boxes": aux_box,
            "estimation_boxes": final,
            "motion_pred": motion_pred,
        }


class TestFullM2TrackParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(0)
        tm = TorchM2Track()
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm1d):
                with torch.no_grad():
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.2)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = make_config(
            dict(net_model="m2track", box_aware=True, point_sample_size=32,
                 degrees=False, use_z=True, limit_box=False)
        )
        model = get_model("m2track")(cfg)
        variables = import_checkpoint(sd, cfg, model=model)

        rng = np.random.default_rng(0)
        n = cfg.point_sample_size
        points = rng.normal(size=(2, 2 * n, 5)).astype(np.float32)
        bc = np.abs(rng.normal(size=(2, 2 * n, 9))).astype(np.float32)

        with torch.no_grad():
            want = tm(torch.from_numpy(points), torch.from_numpy(bc))

        batch = {"points": points, "candidate_bc": bc}
        with jax.default_matmul_precision("highest"):
            got = model.apply(variables, batch, train=False)

        assert np.allclose(
            np.asarray(got["seg_logits"]),
            want["seg_logits"].numpy().transpose(0, 2, 1),
            atol=2e-3,
        )
        # box outputs run through rigid math; slightly looser
        for key in ["aux_estimation_boxes", "estimation_boxes", "motion_pred"]:
            assert np.allclose(
                np.asarray(got[key]), want[key].numpy(), atol=5e-3
            ), (key, np.abs(np.asarray(got[key]) - want[key].numpy()).max())
