"""Minimal Mosaic feasibility probe: int8 one-hot matmul + bf16 byte
reassembly INSIDE a Pallas TPU kernel (the ops the bit-plane gather needs —
see scripts/probe_gather_bitplane.py for the XLA-level win: 0.338 -> 0.178
ms). Run on TPU; prints OK + max|diff| vs the bf16-selection expectation,
or the Mosaic lowering error.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C1, TS, K = 1024, 64, 64, 32


def kernel(idx_ref, a8_ref, out_ref):
    ts = idx_ref.shape[1]
    tsk = ts * K
    n = a8_ref.shape[1]
    idx2 = idx_ref[0]  # (ts, K)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2) == idx2[:, :, None]
    ).reshape(tsk, n).astype(jnp.int8)
    acc = jax.lax.dot_general(
        onehot, a8_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)  # (tsk, 2*C1) i32
    hi, lo = acc[:, :C1], acc[:, C1:]
    bits = (((hi & 0xFF) << 8) | (lo & 0xFF)).astype(jnp.uint16)
    out_ref[0] = jax.lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
        jnp.float32)


def main():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N, size=(1, TS, K)).astype(np.int32)
    a = rng.normal(size=(1, N, C1)).astype(np.float32)
    a_bf = jnp.asarray(a, jnp.bfloat16)
    u16 = jax.lax.bitcast_convert_type(a_bf, jnp.uint16).astype(jnp.uint32)
    a8 = jnp.concatenate(
        [(u16 >> 8).astype(jnp.uint8), (u16 & 0xFF).astype(jnp.uint8)],
        axis=-1).astype(jnp.int8)  # (1, N, 2*C1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, TS * K, C1), jnp.float32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, TS, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 2 * C1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TS * K, C1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), a8)

    want = np.asarray(a_bf, np.float32)[0][idx[0]]  # (TS, K, C1)
    got = np.asarray(out)[0].reshape(TS, K, C1)
    d = np.abs(want - got).max()
    print(f"OK max|diff| = {d}", flush=True)
    assert d == 0.0, "bit-plane gather not exact in-kernel"


if __name__ == "__main__":
    main()
