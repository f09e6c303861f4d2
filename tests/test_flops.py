"""Pallas FLOP accounting (ops/flops.py): recorder scoping + closed forms.

The fused kernels record closed-form dot counts at TRACE time, so the tests
trace with jax.eval_shape (no Mosaic compile — runs on the CPU test
backend) with interpret=False to arm the hooks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.ops.flops import (
    add_pallas_flops,
    record_pallas_flops,
    sa_eval_flops,
    sa_train_bwd_flops,
    sa_train_fwd_flops,
)


def test_recorder_scoping():
    add_pallas_flops(123.0)  # outside any scope: no-op
    with record_pallas_flops() as rec:
        add_pallas_flops(10.0)
        with record_pallas_flops() as inner:
            add_pallas_flops(5.0)
        assert inner == {"flops": 5.0, "calls": 1}
        add_pallas_flops(2.0)
    assert rec == {"flops": 12.0, "calls": 2}
    add_pallas_flops(7.0)  # scope closed again
    assert rec["flops"] == 12.0


def test_closed_forms_are_dot_counts():
    # hand-recomputed from the kernel dot enumeration (see docstrings)
    B, S, K, N, c1, c2, c3 = 2, 8, 4, 16, 8, 8, 16
    rows = B * S * K
    assert sa_eval_flops(B, S, K, N, c1, c2, c3, fused_bq=False) == (
        2 * rows * (N * c1 + c1 * c2 + c2 * c3))
    assert sa_eval_flops(B, S, K, N, c1, c2, c3, fused_bq=True) == (
        2 * rows * (N * c1 + c1 * c2 + c2 * c3) + 2 * B * S * N * N)
    assert sa_train_fwd_flops(B, S, K, N, c1, c2, c3) == (
        2 * rows * (N * c1 + 2 * c1 * c2 + 2 * c2 * c3))
    assert sa_train_bwd_flops(B, S, K, N, c1, c2, c3) == (
        2 * rows * (N * c1 + 4 * c1 * c2 + 4 * c2 * c3))


def test_lower_recording_survives_warm_trace_cache():
    """jit.lower() after a prior same-shape call is a trace-cache HIT — the
    body (and its trace-time add_pallas_flops) is skipped, so a plain
    record_pallas_flops()-around-lower() records ZERO. This silently turned
    every round-4 'true TFLOP/s' benchmark row back into the XLA-only count.
    lower_recording() must clear the cache and re-trace so recording fires
    even after the function has been called/timed."""
    from open3dsot_tpu.ops.flops import lower_recording

    @jax.jit
    def f(x):
        add_pallas_flops(11.0)
        return x * 2

    x = jnp.ones((4,))
    f(x)  # warm the trace cache, exactly like a timing loop does

    # the failure mode this guards against: plain lower records nothing
    with record_pallas_flops() as naive:
        f.lower(x)
    assert naive["calls"] == 0

    lowered, rec = lower_recording(f, x)
    assert rec == {"flops": 11.0, "calls": 1}
    assert lowered.compile() is not None


@pytest.mark.parametrize("fuse_bq", [False, True])
def test_eval_kernel_records_at_trace_time(fuse_bq):
    from open3dsot_tpu.ops.neighbors import ball_query
    from open3dsot_tpu.ops.sa_fused import fused_sa_apply

    B, N, S, K = 2, 64, 16, 8
    c1, c2, c3 = 8, 8, 16
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    new_xyz = xyz[:, :S]
    idx = None if fuse_bq else ball_query(0.5, K, xyz, new_xyz)

    def mk(cin, cout):
        return (
            {"dense": {"kernel": jnp.zeros((cin, cout)),
                       "bias": jnp.zeros((cout,))},
             "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}},
            {"bn": {"mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}},
        )
    layers = [mk(3, c1), mk(c1, c2), mk(c2, c3)]
    params = {f"layer{i}": p for i, (p, _) in enumerate(layers)}
    stats = {f"layer{i}": s for i, (_, s) in enumerate(layers)}

    def f(xyz, new_xyz):
        return fused_sa_apply(
            xyz, None, new_xyz, idx, params, stats, radius=0.5,
            normalize_xyz=True, use_xyz=True, nsample=K,
            interpret=False)  # arm the TPU branch; eval_shape never compiles

    with record_pallas_flops() as rec:
        jax.eval_shape(f, xyz, new_xyz)
    assert rec["calls"] == 1
    assert rec["flops"] == sa_eval_flops(
        B, S, K, N, c1, c2, c3, fused_bq=fuse_bq)


def test_train_kernels_record_fwd_and_bwd():
    from open3dsot_tpu.ops import sa_fused_train as ft

    B, N, S, K = 2, 64, 16, 8
    c1, c2, c3 = 8, 8, 16
    cfg = ft._SACfg(B=B, N=N, S=S, K=K, C1=c1, C2=c2, C3=c3,
                    cdt="float32", interpret=False, impl="pallas")
    rng = np.random.default_rng(0)

    def arr(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    a, ct = arr(B, N, c1), arr(B, S, c1)
    w2, b2, w3, b3 = arr(c1, c2), arr(c2), arr(c2, c3), arr(c3)
    g1, bt1, g2, bt2 = jnp.ones(c1), jnp.zeros(c1), jnp.ones(c2), jnp.zeros(c2)
    g3, bt3 = jnp.ones(c3), jnp.zeros(c3)
    idx = jnp.zeros((B, S, K), jnp.int32)

    def loss(a, ct, w2, b2, w3, b3):
        out = ft._core(cfg, a, ct, w2, b2, w3, b3,
                       g1, bt1, g2, bt2, g3, bt3, idx)
        return sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))

    with record_pallas_flops() as rec:
        jax.eval_shape(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)),
                       a, ct, w2, b2, w3, b3)
    assert rec["calls"] == 2
    assert rec["flops"] == (sa_train_fwd_flops(B, S, K, N, c1, c2, c3)
                            + sa_train_bwd_flops(B, S, K, N, c1, c2, c3))
