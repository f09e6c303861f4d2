"""Furthest point sampling as a Pallas TPU kernel.

The XLA `fori_loop` FPS (ops/sampling.py) re-reads the (B, N, 3) cloud from
HBM on every one of the npoint iterations. This kernel pins a block of 8
transposed clouds (8, 3, N) in VMEM for the whole selection loop, so HBM
traffic drops from npoint*N*3 to N*3 floats per batch element; the
per-iteration work (masked coordinate gather, distance update, argmax over N
lanes) runs entirely on the VPU with 8 clouds vectorized across sublanes.
Semantics identical to the CUDA op (ops/reference.py:fps_ref): seed index 0,
squared distances, lowest-index tie-breaks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8  # batch elements per program (sublane tile)


def _fps_kernel(npoint: int, xyz_ref, out_ref, mind_ref):
    """xyz_ref (BB, 3, N) VMEM; out_ref (BB, npoint) int32; mind (BB, N) f32."""
    N = xyz_ref.shape[-1]
    xyz = xyz_ref[:]  # (BB, 3, N)
    mind_ref[:] = jnp.full((_BB, N), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((_BB, npoint), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BB, N), 1)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (_BB, npoint), 1)

    def body(j, last):
        # coord[b] = xyz[b, :, last[b]] via a masked lane reduction
        onehot = (lane == last[:, None]).astype(jnp.float32)  # (BB, N)
        coord = jnp.sum(xyz * onehot[:, None, :], axis=2)  # (BB, 3)
        diff = xyz - coord[:, :, None]  # (BB, 3, N)
        d2 = jnp.sum(diff * diff, axis=1)  # (BB, N)
        mind = jnp.minimum(mind_ref[:], d2)
        mind_ref[:] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)  # (BB,)
        # masked full-block write (dynamic-lane stores unsupported by Mosaic)
        out_ref[:] = jnp.where(lane_out == j, nxt[:, None], out_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((_BB,), jnp.int32))


def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz (B, N, 3) -> (B, npoint) int32, CUDA-parity FPS on TPU.

    Pads B to the 8-sublane block, N and npoint to 128-lane multiples
    (N-padding duplicates point 0, which FPS can only pick after every
    distinct point — preserving reference semantics for npoint <= N).
    """
    B, N, _ = xyz.shape
    B_pad = -(-B // _BB) * _BB
    # min 256 lanes: a single 128-lane tile trips a Mosaic lowering bug here
    N_pad = max(256, -(-N // 128) * 128)
    np_pad = max(128, -(-npoint // 128) * 128)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if N_pad != N:
        dup = jnp.broadcast_to(xyz_t[:, :, 0:1], (B, 3, N_pad - N))
        xyz_t = jnp.concatenate([xyz_t, dup], axis=2)
    if B_pad != B:
        xyz_t = jnp.concatenate(
            [xyz_t, jnp.zeros((B_pad - B, 3, N_pad), jnp.float32)], axis=0
        )

    out = pl.pallas_call(
        lambda x_ref, o_ref, m_ref: _fps_kernel(np_pad, x_ref, o_ref, m_ref),
        out_shape=jax.ShapeDtypeStruct((B_pad, np_pad), jnp.int32),
        grid=(B_pad // _BB,),
        in_specs=[
            pl.BlockSpec((_BB, 3, N_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_BB, np_pad), lambda b: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_BB, N_pad), jnp.float32)],
    )(xyz_t)
    return jax.lax.stop_gradient(out[:B, :npoint])
