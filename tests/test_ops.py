"""Golden tests: XLA op suite vs numpy CUDA-semantics references."""

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    knn,
)
from open3dsot_tpu.ops.interpolate import three_interpolate, three_nn
from open3dsot_tpu.ops.reference import ball_query_ref, fps_ref, knn_ref, three_nn_ref


def rand_cloud(rng, b, n, d=3, scale=2.0):
    return (rng.random((b, n, d)) * 2 - 1) * scale


class TestFPS:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        xyz = rand_cloud(rng, 2, 64).astype(np.float32)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
        want = fps_ref(xyz, 16)
        assert np.array_equal(got, want)

    def test_first_index_zero(self):
        rng = np.random.default_rng(1)
        xyz = rand_cloud(rng, 3, 32).astype(np.float32)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
        assert np.all(got[:, 0] == 0)

    def test_spread(self):
        # FPS on a line of points must pick the extremes early
        xyz = np.zeros((1, 100, 3), dtype=np.float32)
        xyz[0, :, 0] = np.linspace(0, 10, 100)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 3))[0]
        assert got[0] == 0 and got[1] == 99 and got[2] == 49 or got[2] == 50

    def test_jit_and_grad_safe(self):
        xyz = jnp.asarray(np.random.default_rng(2).random((2, 32, 3)), dtype=jnp.float32)
        jitted = jax.jit(furthest_point_sample, static_argnums=1)
        assert jitted(xyz, 8).shape == (2, 8)


class TestBallQuery:
    def test_matches_reference(self):
        rng = np.random.default_rng(3)
        xyz = rand_cloud(rng, 2, 128).astype(np.float32)
        centers = xyz[:, :32, :]
        got = np.asarray(ball_query(0.5, 16, jnp.asarray(xyz), jnp.asarray(centers)))
        want = ball_query_ref(0.5, 16, xyz, centers)
        assert np.array_equal(got, want)

    def test_pad_with_first(self):
        # one isolated point: only itself in radius; all slots = its index
        xyz = np.array([[[0, 0, 0], [10, 10, 10]]], dtype=np.float32)
        centers = np.array([[[10, 10, 10]]], dtype=np.float32)
        got = np.asarray(ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(centers)))
        assert np.all(got == 1)

    def test_no_neighbor_returns_zeros(self):
        xyz = np.array([[[0, 0, 0]]], dtype=np.float32)
        centers = np.array([[[100, 100, 100]]], dtype=np.float32)
        got = np.asarray(ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(centers)))
        assert np.all(got == 0)


class TestGrouping:
    def test_gather(self):
        rng = np.random.default_rng(4)
        feats = rng.random((2, 10, 4)).astype(np.float32)
        idx = np.array([[0, 3, 9], [1, 1, 2]], dtype=np.int32)
        got = np.asarray(gather_points(jnp.asarray(feats), jnp.asarray(idx)))
        for b in range(2):
            assert np.array_equal(got[b], feats[b][idx[b]])

    def test_group(self):
        rng = np.random.default_rng(5)
        feats = rng.random((1, 8, 2)).astype(np.float32)
        idx = np.array([[[0, 1], [7, 7], [3, 2]]], dtype=np.int32)
        got = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
        assert got.shape == (1, 3, 2, 2)
        assert np.array_equal(got[0, 1, 0], feats[0, 7])

    def test_group_grad_is_scatter_add(self):
        # autodiff through group_points must accumulate duplicate indices,
        # matching the CUDA group_points_grad scatter-add
        feats = jnp.ones((1, 4, 1), dtype=jnp.float32)
        idx = jnp.asarray([[[0, 0], [0, 1]]], dtype=jnp.int32)  # index 0 used 3x

        def f(x):
            return jnp.sum(group_points(x, idx))

        g = np.asarray(jax.grad(f)(feats))[0, :, 0]
        assert np.array_equal(g, [3.0, 1.0, 0.0, 0.0])


class TestKNN:
    def test_matches_reference(self):
        rng = np.random.default_rng(6)
        q = rand_cloud(rng, 2, 16).astype(np.float32)
        r = rand_cloud(rng, 2, 32).astype(np.float32)
        got = np.asarray(knn(jnp.asarray(q), jnp.asarray(r), 4))
        want = knn_ref(q, r, 4)
        assert np.array_equal(got, want)


class TestThreeNN:
    def test_matches_reference(self):
        rng = np.random.default_rng(7)
        unknown = rand_cloud(rng, 2, 24).astype(np.float32)
        known = rand_cloud(rng, 2, 12).astype(np.float32)
        dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        dist_ref, idx_ref = three_nn_ref(unknown, known)
        assert np.array_equal(np.asarray(idx), idx_ref)
        assert np.allclose(np.asarray(dist), dist_ref, atol=1e-4)

    def test_interpolate_weights(self):
        feats = jnp.asarray([[[1.0], [2.0], [4.0]]])  # (1, 3, 1)
        idx = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
        w = jnp.asarray([[[0.5, 0.25, 0.25]]])
        out = np.asarray(three_interpolate(feats, idx, w))
        assert np.allclose(out, [[[0.5 + 0.5 + 1.0]]])


def test_ball_query_adversarial_clustered_indices():
    """The ApproxTopK(recall=1.0) path must stay EXACT when the k smallest
    in-ball indices are consecutive (the worst case for bucketed top-k —
    crop ordering makes clustered indices common in real frames)."""
    import jax.numpy as jnp

    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.reference import ball_query_ref

    rng = np.random.default_rng(3)
    B, N, S = 4, 1024, 256
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[:, :64] = rng.normal(size=(B, 64, 3)) * 0.05       # dense cluster at 0
    xyz[:, 64:] = rng.normal(size=(B, N - 64, 3)) * 50 + 100  # far away
    centers = np.zeros((B, S, 3), np.float32)
    got = np.asarray(ball_query(0.3, 32, jnp.asarray(xyz), jnp.asarray(centers)))
    want = ball_query_ref(0.3, 32, xyz, centers)
    np.testing.assert_array_equal(got, want)
