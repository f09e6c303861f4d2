"""Pallas FPS kernel vs CUDA-semantics reference (TPU only; skipped on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.ops.reference import fps_ref

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU backend"
)


@requires_tpu
class TestPallasFPS:
    def test_matches_reference(self):
        from open3dsot_tpu.ops.fps_pallas import furthest_point_sample_pallas

        rng = np.random.default_rng(0)
        xyz = rng.uniform(-2, 2, size=(4, 256, 3)).astype(np.float32)
        got = np.asarray(furthest_point_sample_pallas(jnp.asarray(xyz), 64))
        want = fps_ref(xyz, 64)
        assert np.array_equal(got, want)

    def test_batch_padding(self):
        from open3dsot_tpu.ops.fps_pallas import furthest_point_sample_pallas

        rng = np.random.default_rng(1)
        xyz = rng.uniform(-2, 2, size=(3, 128, 3)).astype(np.float32)  # B not /8
        got = np.asarray(furthest_point_sample_pallas(jnp.asarray(xyz), 32))
        want = fps_ref(xyz, 32)
        assert np.array_equal(got, want)
