"""Probe which gather formulations Mosaic/Pallas lowers on this TPU.

Decides the fused-SA kernel design: native dynamic gather (cheap) vs
one-hot matmul gather (MXU, exact 0/1 weights). Run on the real chip:
    python scripts/probe_gather.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, M = 512, 128, 256
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, size=(M, 1)), jnp.int32)  # (M, 1)
want = np.asarray(A)[np.asarray(idx)[:, 0]]


def try_one(name, kernel, idx_arg):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A, idx_arg)
        got = np.asarray(out)
        ok = np.allclose(got, want)
        print(f"{name}: LOWERED, correct={ok}"
              + ("" if ok else f"  (got[0,:3]={got[0,:3]} want={want[0,:3]})"))
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).split("\n") if l.strip()]
        print(f"{name}: FAILED — {' | '.join(lines[:3])[:300]}")


idx_full = jnp.broadcast_to(idx, (M, C)).copy()  # per-lane indices, material


def k_taa_full(a_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(a_ref[:], i_ref[:], axis=0)


def k_take_full(a_ref, i_ref, o_ref):
    # dynamic_gather wants idx shaped like the data? try take with (M,C) idx
    o_ref[:] = jnp.take(a_ref[:], i_ref[:, 0], axis=0)


def k_onehot(a_ref, i_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
    oh = (rows == i_ref[:]).astype(jnp.float32)  # i_ref (M,1) broadcasts
    o_ref[:] = jnp.dot(oh, a_ref[:], preferred_element_type=jnp.float32)


def k_onehot_dbg(a_ref, i_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
    oh = (rows == i_ref[:]).astype(jnp.float32)
    # row sums should all be 1.0 — smoke-check one-hot construction
    o_ref[:] = jnp.broadcast_to(jnp.sum(oh, axis=1, keepdims=True), (M, C))


print("backend:", jax.devices()[0].device_kind)
try_one("taa_perlane_full", k_taa_full, idx_full)
try_one("take_axis0_from2d", k_take_full, idx)
try_one("onehot_matmul_idx2d", k_onehot, idx)
try_one("onehot_rowsum_dbg", k_onehot_dbg, idx)
