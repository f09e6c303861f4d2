"""Fused eval-mode PointNet chains (ops/chain_fused.py) vs the unfused path.

CPU runs the kernels in interpret mode; f32 dots there are exact, so the
only expected deviation from the unfused flax stack is the BN fold
reassociation (same policy and tolerances as tests/test_sa_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.models.pointnet import MiniPointNet, SegPointNet


def _randomize(variables, rng):
    def rand(x):
        return x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.3

    params = jax.tree_util.tree_map(rand, variables["params"])
    stats = jax.tree_util.tree_map(
        lambda x: jnp.abs(rand(x)) + 0.5, variables["batch_stats"]
    )
    return {"params": params, "batch_stats": stats}


def _seg_pair(fused, dtype=None):
    kw = dict(per_point_mlp1=[16, 16, 16, 32, 64],
              per_point_mlp2=[32, 16, 16], output_size=11, dtype=dtype)
    return SegPointNet(**kw), SegPointNet(fused_eval=fused, **kw)


def test_fused_seg_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64, 14)), jnp.float32)
    plain, fused = _seg_pair(True)
    variables = _randomize(plain.init(jax.random.PRNGKey(0), x, train=False), rng)
    want = plain.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_seg_bf16_no_worse_than_unfused_bf16():
    """bf16 rounding points differ between the folded chain and the flax
    stack and compound through 8 layers + the pool-max winner; judge both
    against the f32 truth instead (same criterion as test_sa_fused)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64, 14)), jnp.float32)
    plain32, _ = _seg_pair(False, dtype=None)
    plain16, fused16 = _seg_pair(True, dtype=jnp.bfloat16)
    variables = _randomize(plain32.init(jax.random.PRNGKey(0), x, train=False), rng)
    truth = np.asarray(plain32.apply(variables, x, train=False), np.float32)
    got16 = np.asarray(fused16.apply(variables, x, train=False), np.float32)
    want16 = np.asarray(plain16.apply(variables, x, train=False), np.float32)

    def mean_rel(v):
        return np.mean(np.abs(v - truth) / np.maximum(np.abs(truth), 1.0))

    assert mean_rel(got16) < 1.5 * mean_rel(want16) + 1e-3


def test_fused_mini_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 48, 14)), jnp.float32)
    kw = dict(per_point_mlp=[16, 16, 32], hidden_mlp=[32, 16], output_size=-1)
    plain = MiniPointNet(**kw)
    fused = MiniPointNet(fused_eval=True, **kw)
    variables = _randomize(plain.init(jax.random.PRNGKey(0), x, train=False), rng)
    want = plain.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_seg_train_mode_falls_back():
    """train=True must keep the exact unfused path (batch-stat barrier)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 14)), jnp.float32)
    plain, fused = _seg_pair(True)
    variables = _randomize(plain.init(jax.random.PRNGKey(0), x, train=False), rng)
    want, mut_w = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    got, mut_g = fused.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for a, b in zip(jax.tree_util.tree_leaves(mut_w),
                    jax.tree_util.tree_leaves(mut_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_seg_gspmd_sharded_matches_unsharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 64, 14)), jnp.float32)
    plain, fused = _seg_pair(True)
    variables = _randomize(plain.init(jax.random.PRNGKey(0), x, train=False), rng)

    def f(x):
        return fused.apply(variables, x, train=False)

    ref = jax.jit(f)(x)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    jf = jax.jit(f, in_shardings=(sh,), out_shardings=sh)
    out = jf(jax.device_put(x, sh))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert "all-gather" not in jf.lower(jax.device_put(x, sh)).compile().as_text()


def test_m2_net_fused_chain_matches_unfused():
    """Whole M2 forward with config.fused_chain forced on vs off."""
    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.models import get_model

    cfg_d = dict(
        net_model="m2track", box_aware=True, point_sample_size=32,
        degrees=False, use_z=True, limit_box=False,
        motion_threshold=0.15,
    )
    rng = np.random.default_rng(4)
    m_plain = get_model("m2track")(make_config(dict(cfg_d, fused_chain=False)))
    m_fused = get_model("m2track")(make_config(dict(cfg_d, fused_chain=True)))
    variables = m_plain.init(jax.random.PRNGKey(0), m_plain.dummy_batch(2))
    batch = {
        "points": rng.standard_normal((2, 64, 5)).astype(np.float32),
        "candidate_bc": np.abs(rng.standard_normal((2, 64, 9))).astype(np.float32),
    }
    want = m_plain.apply(variables, batch, train=False)
    got = m_fused.apply(variables, batch, train=False)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            atol=5e-4, err_msg=k,
        )
