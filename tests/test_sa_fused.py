"""Golden tests: fused SA eval kernel (ops/sa_fused.py) vs the unfused path.

The fused kernel folds eval BatchNorm into the Dense weights and moves the
first MLP layer before the gather (A-form); both are exact algebraic
rewrites, so up to float reassociation the outputs must match the regular
SetAbstraction eval path bit-for-bit-ish (<=1e-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.models.pointnet import SetAbstraction


def _randomized_bn_vars(variables, rng):
    """Replace init-trivial BN params/stats with random values so the
    BN fold is actually exercised."""
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    stats = variables["batch_stats"]

    def _rand_like(path_leaf):
        return jnp.asarray(rng.standard_normal(path_leaf.shape), jnp.float32)

    new_params = jax.tree_util.tree_map(_rand_like, params)
    # variance must stay positive
    new_stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(0.1 + rng.random(x.shape), jnp.float32), stats
    )
    return {"params": new_params, "batch_stats": new_stats}


@pytest.mark.parametrize("with_features", [False, True])
@pytest.mark.parametrize("normalize_xyz", [False, True])
def test_fused_matches_unfused(with_features, normalize_xyz):
    rng = np.random.default_rng(0)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = (
        jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        if with_features else None
    )
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False,
              normalize_xyz=normalize_xyz)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)

    ref_xyz, ref_out, ref_idx = sa.apply(variables, xyz, feats, S, train=False)
    sa_fused = SetAbstraction(fused_eval=True, **kw)
    f_xyz, f_out, f_idx = sa_fused.apply(variables, xyz, feats, S, train=False)

    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(f_idx))
    np.testing.assert_array_equal(np.asarray(ref_xyz), np.asarray(f_xyz))
    np.testing.assert_allclose(
        np.asarray(f_out), np.asarray(ref_out), rtol=1e-4, atol=1e-4
    )


def test_fused_pads_ragged_centroid_count():
    """S not a multiple of the kernel tile: padding rows must be sliced off."""
    rng = np.random.default_rng(1)
    B, N, S, K = 1, 48, 11, 4
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    kw = dict(mlp=[8, 8, 8], radius=1.5, nsample=K, use_fps=False)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, None, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    _, ref_out, _ = sa.apply(variables, xyz, None, S, train=False)
    _, f_out, _ = SetAbstraction(fused_eval=True, **kw).apply(
        variables, xyz, None, S, train=False
    )
    assert f_out.shape == ref_out.shape == (B, S, 8)
    np.testing.assert_allclose(
        np.asarray(f_out), np.asarray(ref_out), rtol=1e-4, atol=1e-4
    )


def test_fused_bf16_no_worse_than_unfused_bf16():
    """The bf16 fused path must deviate from the f32 truth no more than the
    bf16 unfused path does (both carry bf16 rounding noise; comparing the
    two bf16 paths to each other just doubles that noise and says nothing).
    Measured on CPU the fused path is actually slightly CLOSER to f32 truth
    (its first Dense and gather accumulate in f32)."""
    rng = np.random.default_rng(2)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    _, truth, _ = sa.apply(variables, xyz, feats, S, train=False)
    _, bf16_unfused, _ = SetAbstraction(dtype=jnp.bfloat16, **kw).apply(
        variables, xyz, feats, S, train=False
    )
    _, bf16_fused, _ = SetAbstraction(
        fused_eval=True, dtype=jnp.bfloat16, **kw
    ).apply(variables, xyz, feats, S, train=False)
    assert bf16_fused.dtype == jnp.bfloat16

    truth = np.asarray(truth, np.float32)

    def mean_rel(x):
        x = np.asarray(x, np.float32)
        return np.mean(np.abs(x - truth) / np.maximum(np.abs(truth), 1.0))

    assert mean_rel(bf16_fused) < 1.5 * mean_rel(bf16_unfused) + 1e-4


def test_idx_kernel_matches_bq_fused_kernel():
    """Both kernel variants (precomputed ball-query idx vs in-kernel
    cumulative-count ball query) produce identical selections."""
    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.sa_fused import fused_sa_apply

    rng = np.random.default_rng(4)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    new_xyz = xyz[:, :S]
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    mlp_p = variables["params"]["mlp_shared"]
    mlp_s = variables["batch_stats"]["mlp_shared"]
    idx = ball_query(0.8, K, xyz, new_xyz)
    common = dict(radius=0.8, normalize_xyz=False, use_xyz=True)
    out_idx = fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s, **common)
    out_bq = fused_sa_apply(xyz, feats, new_xyz, None, mlp_p, mlp_s,
                            nsample=K, **common)
    np.testing.assert_allclose(
        np.asarray(out_bq), np.asarray(out_idx), rtol=1e-5, atol=1e-5
    )


def test_fused_eval_gspmd_sharded_matches_unsharded():
    """The eval kernels carry a GSPMD batch-partitioning rule
    (ops/partition.py): a jit with NamedSharding inputs over the 8-device
    mesh must produce bit-identical outputs to the single-device run, for
    both kernel variants, with no batch all-gather."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.sa_fused import fused_sa_apply

    rng = np.random.default_rng(7)
    B, N, S, K, C = 8, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    new_xyz = xyz[:, :S]
    sa = SetAbstraction(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    mlp_p = variables["params"]["mlp_shared"]
    mlp_s = variables["batch_stats"]["mlp_shared"]
    common = dict(radius=0.8, normalize_xyz=True, use_xyz=True)

    def f_idx(xyz, feats, new_xyz):
        idx = ball_query(0.8, K, xyz, new_xyz)
        return fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s, **common)

    def f_bq(xyz, feats, new_xyz):
        return fused_sa_apply(xyz, feats, new_xyz, None, mlp_p, mlp_s,
                              nsample=K, **common)

    def f_idx_i8(xyz, feats, new_xyz):
        idx = ball_query(0.8, K, xyz, new_xyz)
        return fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s,
                              int8_gather=True, **common)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    args = (xyz, feats, new_xyz)
    sharded_args = tuple(jax.device_put(x, sh) for x in args)
    for f in (f_idx, f_bq, f_idx_i8):
        ref = jax.jit(f)(*args)
        jf = jax.jit(f, in_shardings=(sh, sh, sh), out_shardings=sh)
        out = jf(*sharded_args)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        txt = jf.lower(*sharded_args).compile().as_text()
        assert "all-gather" not in txt


def test_int8_bitplane_gather_bit_equals_bf16_gather():
    """The int8 bit-plane gather (ops/sa_fused.py::_gather_rows with
    i8g=True) must reproduce the bf16-operand one-hot gather BIT-FOR-BIT:
    a gather is pure selection, so selecting the two bytes of each bf16
    value with an exact int8 dot and reassembling them is the same
    function. This is the exactness contract that lets the TPU kernels
    default to the int8 path with no numerics change."""
    from open3dsot_tpu.ops.sa_fused import _gather_rows, bf16_byte_planes

    rng = np.random.default_rng(5)
    M, N, C1 = 96, 64, 24
    idx = rng.integers(0, N, size=(M,))
    onehot = jnp.asarray(idx[:, None] == np.arange(N)[None, :])
    a = jnp.asarray(rng.standard_normal((N, C1)) * 100, jnp.float32)

    via_bf16 = _gather_rows(onehot, a.astype(jnp.bfloat16), jnp.bfloat16,
                            C1, False)
    via_int8 = _gather_rows(onehot, bf16_byte_planes(a), jnp.bfloat16,
                            C1, True)
    np.testing.assert_array_equal(np.asarray(via_int8), np.asarray(via_bf16))
    # and both ARE the selected bf16 rows
    want = np.asarray(a.astype(jnp.bfloat16), np.float32)[idx]
    np.testing.assert_array_equal(np.asarray(via_int8), want)


@pytest.mark.parametrize("fuse_bq", [False, True])
def test_int8_gather_kernel_no_worse_than_bf16_unfused(fuse_bq):
    """int8_gather=True only quantizes the GATHERED A rows to bf16 (the
    same cast the TPU od=bf16 path already applies), so its deviation from
    the f32 golden must stay within the all-bf16 unfused path's deviation
    envelope — both kernel variants."""
    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.sa_fused import fused_sa_apply

    rng = np.random.default_rng(8)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    new_xyz = xyz[:, :S]
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    mlp_p = variables["params"]["mlp_shared"]
    mlp_s = variables["batch_stats"]["mlp_shared"]
    idx = None if fuse_bq else ball_query(0.8, K, xyz, new_xyz)
    common = dict(radius=0.8, normalize_xyz=False, use_xyz=True,
                  nsample=K if fuse_bq else None)
    truth = fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s, **common)
    got = fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s,
                         int8_gather=True, **common)
    _, bf16_unfused, _ = SetAbstraction(dtype=jnp.bfloat16, **kw).apply(
        variables, xyz, feats, S, train=False)

    truth = np.asarray(truth, np.float32)

    def mean_rel(x):
        x = np.asarray(x, np.float32)
        return np.mean(np.abs(x - truth) / np.maximum(np.abs(truth), 1.0))

    assert mean_rel(got) < 1.5 * mean_rel(bf16_unfused) + 1e-4


def test_fused_immune_to_ambient_matmul_precision():
    """The kernels pin dot precision to DEFAULT explicitly: under an ambient
    jax.default_matmul_precision("highest") context an UNPINNED bf16-operand
    tpu.matmul is rejected by Mosaic on real TPU ("Bad lhs type", observed
    round 5 when a tracker was built inside a highest-precision block), and
    the kernel's numerics contract is default-precision regardless of the
    caller. Equality of outputs under both ambient contexts proves the pin
    is in effect."""
    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.sa_fused import fused_sa_apply

    rng = np.random.default_rng(6)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    new_xyz = xyz[:, :S]
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False)
    sa = SetAbstraction(**kw)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, S, train=False)
    variables = _randomized_bn_vars(variables, rng)
    mlp_p = variables["params"]["mlp_shared"]
    mlp_s = variables["batch_stats"]["mlp_shared"]
    idx = ball_query(0.8, K, xyz, new_xyz)
    common = dict(radius=0.8, normalize_xyz=False, use_xyz=True)
    base = fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s, **common)
    with jax.default_matmul_precision("highest"):
        hi = fused_sa_apply(xyz, feats, new_xyz, idx, mlp_p, mlp_s, **common)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(hi))
