"""Inventory-tail components: GroupAll SA, visualization writers, searchspace,
logging, BN momentum schedule."""

import json
import os

import numpy as np

from open3dsot_tpu.geometry import Box, Quaternion


class TestSetAbstractionAll:
    def test_shapes(self):
        import jax
        import jax.numpy as jnp

        from open3dsot_tpu.models.pointnet import SetAbstractionAll

        mod = SetAbstractionAll(mlp=[8, 8])
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 16, 4)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), xyz, feats)
        new_xyz, out = mod.apply(variables, xyz, feats)
        assert new_xyz.shape == (2, 1, 3)
        assert out.shape == (2, 1, 8)


class TestSetAbstractionMSG:
    """Golden: MSG == per-radius SSG branches (shared centroids) concatenated
    along the feature axis (pointnet2_modules.py:64-80)."""

    def test_matches_per_radius_ssg_concat(self):
        import jax
        import jax.numpy as jnp

        from open3dsot_tpu.models.pointnet import SetAbstraction, SetAbstractionMSG

        mlps = [[8, 8], [8, 16]]
        radii = [0.4, 0.9]
        nsamples = [4, 8]
        rng = np.random.default_rng(1)
        xyz = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 32, 5)), jnp.float32)
        npoint = 12

        msg = SetAbstractionMSG(mlps=mlps, radii=radii, nsamples=nsamples,
                                normalize_xyz=True)
        variables = msg.init(jax.random.PRNGKey(0), xyz, feats, npoint)
        new_xyz, out, idxs = msg.apply(variables, xyz, feats, npoint)
        assert new_xyz.shape == (2, npoint, 3)
        assert out.shape == (2, npoint, 8 + 16)
        # first-npoint centroids, like the SSG case
        np.testing.assert_array_equal(np.asarray(idxs[0]), np.arange(npoint))

        parts = []
        for i in range(len(radii)):
            ssg = SetAbstraction(mlp=mlps[i], radius=radii[i],
                                 nsample=nsamples[i], normalize_xyz=True)
            branch_vars = {
                "params": {"mlp_shared": variables["params"][f"mlp_shared_{i}"]},
                "batch_stats": {
                    "mlp_shared": variables["batch_stats"][f"mlp_shared_{i}"]
                },
            }
            bxyz, bout, bidx = ssg.apply(branch_vars, xyz, feats, npoint)
            np.testing.assert_allclose(np.asarray(bxyz), np.asarray(new_xyz),
                                       atol=0)
            np.testing.assert_array_equal(np.asarray(bidx), np.asarray(idxs))
            parts.append(np.asarray(bout))
        np.testing.assert_allclose(
            np.concatenate(parts, axis=-1), np.asarray(out), atol=1e-6
        )

    def test_train_mode_batch_stats(self):
        """Each branch keeps its own BN batch_stats and they update in train
        mode (the reference's per-branch SharedMLPs own their BNs)."""
        import jax
        import jax.numpy as jnp

        from open3dsot_tpu.models.pointnet import SetAbstractionMSG

        msg = SetAbstractionMSG(mlps=[[4], [4]], radii=[0.5, 1.0],
                                nsamples=[4, 4], use_fps=True)
        rng = np.random.default_rng(2)
        xyz = jnp.asarray(rng.normal(size=(1, 16, 3)), jnp.float32)
        variables = msg.init(jax.random.PRNGKey(0), xyz, None, 8)
        (_, out, _), updates = msg.apply(
            variables, xyz, None, 8, True, mutable=["batch_stats"]
        )
        assert out.shape == (1, 8, 8)
        for i in (0, 1):
            before = variables["batch_stats"][f"mlp_shared_{i}"]
            after = updates["batch_stats"][f"mlp_shared_{i}"]
            flat_b = jax.tree_util.tree_leaves(before)
            flat_a = jax.tree_util.tree_leaves(after)
            assert any(
                not np.allclose(np.asarray(b), np.asarray(a))
                for b, a in zip(flat_b, flat_a)
            )


class TestVisualization:
    def box(self):
        return Box([1, 2, 0], [1.5, 3.5, 1.2], Quaternion(axis=[0, 0, 1], degrees=20))

    def test_write_ply(self, tmp_path):
        from open3dsot_tpu.utils.visualization import write_ply

        p = str(tmp_path / "cloud.ply")
        write_ply(np.random.default_rng(0).normal(size=(10, 3)), p)
        head = open(p).read().splitlines()
        assert head[0] == "ply"
        assert "element vertex 10" in head[2]

    def test_write_obj(self, tmp_path):
        from open3dsot_tpu.utils.visualization import write_obj

        p = str(tmp_path / "cloud")
        write_obj(np.zeros((4, 3)), p)
        lines = open(p + ".obj").read().splitlines()
        assert len(lines) == 4 and lines[0].startswith("v ")

    def test_box2obj(self, tmp_path):
        from open3dsot_tpu.utils.visualization import box2obj

        p = str(tmp_path / "box.obj")
        box2obj(self.box(), p)
        lines = open(p).read().splitlines()
        assert sum(1 for line in lines if line.startswith("v ")) == 8
        assert sum(1 for line in lines if line.startswith("f ")) == 6

    def test_write_bbox(self, tmp_path):
        from open3dsot_tpu.utils.visualization import get_3d_box, write_bbox

        corners = get_3d_box((1.5, 3.5, 1.2), 0.3, (1, 2, 0))
        assert corners.shape == (8, 3)
        p = str(tmp_path / "bbox.ply")
        write_bbox(corners, 0, p)
        assert open(p).readline().strip() == "ply"

    def test_get_3d_box_matches_box_corners(self):
        from open3dsot_tpu.utils.visualization import get_3d_box

        b = self.box()
        theta = b.orientation.radians * b.orientation.axis[-1]
        got = get_3d_box(b.wlh, theta, b.center)
        assert np.allclose(got, b.corners().T, atol=1e-9)


class TestSearchSpaces:
    def test_exhaustive_grid(self):
        from open3dsot_tpu.data.searchspace import ExhaustiveSearch

        g = ExhaustiveSearch(search_dims=[3, 3, 2])
        assert g.sample().shape == (18, 3)

    def test_particle_filtering_updates(self):
        from open3dsot_tpu.data.searchspace import ParticleFiltering

        pf = ParticleFiltering()
        s0 = pf.sample(5)
        assert s0.shape == (5, 3)
        pf.addData(s0, np.ones(5))
        assert pf.sample(4).shape == (4, 3)

    def test_kalman_adapts_mean(self):
        from open3dsot_tpu.data.searchspace import KalmanFiltering

        kf = KalmanFiltering()
        data = np.ones((50, 3)) * 2.0 + np.random.default_rng(0).normal(size=(50, 3)) * 0.01
        kf.addData(data, np.ones(50))
        assert np.allclose(kf.mean, 2.0, atol=0.1)


class TestLogging:
    def test_jsonl_and_flush(self, tmp_path):
        from open3dsot_tpu.utils.logging import ScalarLogger

        lg = ScalarLogger(str(tmp_path), enable_tensorboard=False)
        lg.log_scalars({"a": 1.0, "b": 2.0}, step=3, prefix="x/")
        lg.flush()
        rec = json.loads(open(os.path.join(str(tmp_path), "scalars.jsonl")).read())
        assert rec["x/a"] == 1.0 and rec["step"] == 3


class TestBNMomentum:
    def test_schedule(self):
        from open3dsot_tpu.train.bn_momentum import bn_momentum_schedule, to_flax_momentum

        sched = bn_momentum_schedule(0.1, 0.5, 10, floor=0.02)
        assert sched(0) == 0.1
        assert sched(10) == 0.05
        assert sched(100) == 0.02
        assert to_flax_momentum(0.1) == 0.9


class TestGaussianMixtureModel:
    """Real weighted-EM GMM (reference searchspace.py:110-187, VERDICT r1 #10)."""

    def test_em_fits_two_weighted_clusters(self):
        from open3dsot_tpu.data.searchspace import _weighted_em_gmm

        rng = np.random.default_rng(0)
        a = rng.normal(size=(200, 3)) * 0.2 + np.array([3, 0, 0])
        b = rng.normal(size=(200, 3)) * 0.2 + np.array([-3, 0, 0])
        X = np.vstack([a, b])
        w = np.concatenate([np.full(200, 0.9), np.full(200, 0.1)])
        pi, means, covs = _weighted_em_gmm(X, w / w.sum(), n_comp=2, seed=1)
        order = np.argsort(-pi)
        assert abs(pi[order][0] - 0.9) < 0.05
        assert abs(means[order][0][0] - 3) < 0.3
        assert abs(means[order][1][0] + 3) < 0.3
        assert covs.shape == (2, 3, 3)

    def test_sample_mixture_recipe(self):
        from open3dsot_tpu.data.searchspace import GaussianMixtureModel

        np.random.seed(0)
        g = GaussianMixtureModel(n_comp=2, dim=3)
        s = g.sample(100)  # unfitted: broad prior, must not crash
        assert s.shape[1] == 3
        rng = np.random.default_rng(1)
        X = np.vstack([
            rng.normal(size=(150, 3)) * 0.2 + np.array([2, 0, 0]),
            rng.normal(size=(150, 3)) * 0.2 + np.array([-2, 0, 0]),
        ])
        g.addData(X, np.ones(300))
        s = g.sample(1000)
        # 80% mixture draws concentrate near the two fitted clusters
        frac_near = (np.abs(np.abs(s[:, 0]) - 2) < 1.5).mean()
        assert frac_near > 0.6
        g.reset()
        assert g._means is None

    def test_dim2_variant(self):
        from open3dsot_tpu.data.searchspace import GaussianMixtureModel

        np.random.seed(2)
        g = GaussianMixtureModel(n_comp=3, dim=2)
        rng = np.random.default_rng(3)
        g.addData(rng.normal(size=(50, 2)), rng.uniform(size=50))
        s = g.sample(50)
        assert s.shape[1] == 2 and np.isfinite(s).all()
