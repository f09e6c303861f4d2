"""Fused eval-mode PointNet chains (SegPointNet / MiniPointNet encoders).

M2-Track's device hot path is dominated by SegPointNet
(models/pointnet.py::SegPointNet, mirroring the reference
/root/reference/models/backbone/pointnet.py:144-204): a per-point Dense+BN+
ReLU chain [64,64,64,128,1024] with a layer-2 tap, a global max-pool whose
broadcast is concatenated back per point, a second chain [512,256,128,128]
and a plain head. Unfused, every layer round-trips its (B, N, C) activation
through HBM — at scan-tracker shapes the 1024-wide intermediate alone is
8 MB/frame each way — and the op-by-op launch sequence dominates the
single-stream (B=1) tracking latency.

Eval mode has no batch-statistics barrier, so the whole network folds into
TWO Pallas kernels (BatchNorm folded into the Dense weights exactly as in
ops/sa_fused.py::fold_dense_bn):

  P1  per point-tile: chain mlp1 in VMEM; write ONLY the layer-2 tap
      (B, N, C_tap) to HBM; max-accumulate the pooled vector into a
      per-batch-element (1, C_last) block across tiles.
  P2  per point-tile: concat(tap, broadcast(pooled)) -> chain mlp2 ->
      head Dense -> per-point logits.

The wide mlp1 output never touches HBM. Both kernels carry the GSPMD
batch-partitioning rule (ops/partition.py), so sharded eval uses them
per-shard. MiniPointNet's encoder is P1 with no tap (the pooled vector is
the output); its tiny per-batch hidden MLP stays in XLA.

Numerics: folded weights in f32, dots at default MXU precision with f32
accumulation — the same policy as the unfused flax Dense stack (and as
ops/sa_fused.py). CPU tests run the kernels in interpret mode.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open3dsot_tpu.ops.partition import auto_rule, batch_partitioned
from open3dsot_tpu.ops.sa_fused import fold_dense_bn


def _fold_mlp_list(params_list, stats_list) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fold a list of DenseBNRelu layers ({'dense': .., 'bn': ..} each)."""
    return [fold_dense_bn(p, s) for p, s in zip(params_list, stats_list)]


def _k_p1(cdt, n_layers, tap_at, x_ref, *rest):
    """rest = w0, b0, w1, b1, ... , [tap_ref], pool_ref."""
    folded = [(rest[2 * i], rest[2 * i + 1][0]) for i in range(n_layers)]
    outs = rest[2 * n_layers:]
    tap_ref = outs[0] if tap_at is not None else None
    pool_ref = outs[-1]
    h = x_ref[0].astype(jnp.float32)
    for i, (w, b) in enumerate(folded):
        h = jax.lax.dot_general(
            h.astype(cdt), w[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
        h = jnp.maximum(h + b[None, :], 0.0)
        if tap_at is not None and i == tap_at:
            tap_ref[0] = h.astype(tap_ref.dtype)
    tile_max = jnp.max(h, axis=0, keepdims=True)  # (1, C_last)

    @pl.when(pl.program_id(1) == 0)
    def _():
        pool_ref[...] = jnp.full_like(pool_ref, -jnp.inf)

    pool_ref[0] = jnp.maximum(pool_ref[0], tile_max.astype(pool_ref.dtype))


def _k_p2(cdt, n_layers, x_ref, pool_ref, *rest):
    """rest = mlp2 (w, b) pairs, head (wh, bh), out_ref."""
    folded = [(rest[2 * i], rest[2 * i + 1][0]) for i in range(n_layers)]
    wh, bh = rest[2 * n_layers], rest[2 * n_layers + 1][0]
    out_ref = rest[-1]
    tap = x_ref[0].astype(jnp.float32)  # (tn, C_tap)
    pooled = jnp.broadcast_to(pool_ref[0], (tap.shape[0], pool_ref.shape[2]))
    h = jnp.concatenate([tap, pooled.astype(jnp.float32)], axis=1)
    for w, b in folded:
        h = jax.lax.dot_general(
            h.astype(cdt), w[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
        h = jnp.maximum(h + b[None, :], 0.0)
    out = jax.lax.dot_general(
        h.astype(cdt), wh[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) + bh[None, :]
    out_ref[0] = out.astype(out_ref.dtype)


def _tile_n(N: int, cap: int = 512) -> int:
    tn = min(N, cap)
    while N % tn:
        tn -= 1
    return tn


def fused_pointnet_encoder(
    x: jnp.ndarray,
    mlp1_params: Sequence,
    mlp1_stats: Sequence,
    *,
    tap_at: Optional[int] = None,
    dtype: Any = None,
    interpret: Optional[bool] = None,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """P1: per-point folded chain + global max-pool.

    x (B, N, C) -> (tap (B, N, C_tap) or None, pooled (B, C_last)).
    """
    cdt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, _ = x.shape
    folded = _fold_mlp_list(mlp1_params, mlp1_stats)
    n_layers = len(folded)
    c_last = folded[-1][0].shape[1]
    tn = _tile_n(N)
    n_tiles = N // tn

    warg, wspec = [], []
    for w, b in folded:
        warg += [w, b[None, :]]
        wspec += [
            pl.BlockSpec(w.shape, lambda b_, s_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda b_, s_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out_shapes = []
    out_specs = []
    if tap_at is not None:
        c_tap = folded[tap_at][0].shape[1]
        out_shapes.append(jax.ShapeDtypeStruct((B, N, c_tap), jnp.float32))
        out_specs.append(pl.BlockSpec((1, tn, c_tap), lambda b_, s_: (b_, s_, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((B, 1, c_last), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1, c_last), lambda b_, s_: (b_, 0, 0),
                                  memory_space=pltpu.VMEM))

    def p1(x, *wargs):
        B_l = x.shape[0]
        shapes = [jax.ShapeDtypeStruct((B_l,) + s.shape[1:], s.dtype)
                  for s in out_shapes]
        return pl.pallas_call(
            lambda *refs: _k_p1(cdt, n_layers, tap_at, *refs),
            out_shape=shapes,
            grid=(B_l, n_tiles),
            in_specs=[pl.BlockSpec((1, tn, x.shape[2]),
                                   lambda b_, s_: (b_, s_, 0),
                                   memory_space=pltpu.VMEM)] + wspec,
            out_specs=out_specs,
            interpret=interpret,
        )(x, *wargs)

    args = (x, *warg)
    rule = auto_rule([jnp.ndim(a) for a in args], (0,),
                     [len(s.shape) for s in out_shapes])
    outs = batch_partitioned(p1, rule, (0,))(*args)
    if tap_at is not None:
        tap, pooled = outs
        return tap, pooled[:, 0, :]
    (pooled,) = outs if isinstance(outs, (list, tuple)) else (outs,)
    return None, pooled[:, 0, :]


def fused_seg_head(
    tap: jnp.ndarray,
    pooled: jnp.ndarray,
    mlp2_params: Sequence,
    mlp2_stats: Sequence,
    head_params,
    *,
    dtype: Any = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """P2: concat(tap, broadcast(pooled)) -> folded mlp2 chain -> head Dense.

    tap (B, N, C_tap), pooled (B, C_pool) -> (B, N, out_ch).
    """
    cdt = jnp.dtype(dtype) if dtype is not None else jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, _ = tap.shape
    folded = _fold_mlp_list(mlp2_params, mlp2_stats)
    n_layers = len(folded)
    wh = head_params["kernel"].astype(jnp.float32)
    bh = head_params["bias"].astype(jnp.float32)
    out_ch = wh.shape[1]
    tn = _tile_n(N)
    n_tiles = N // tn

    warg, wspec = [], []
    for w, b in folded:
        warg += [w, b[None, :]]
        wspec += [
            pl.BlockSpec(w.shape, lambda b_, s_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda b_, s_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    warg += [wh, bh[None, :]]
    wspec += [
        pl.BlockSpec(wh.shape, lambda b_, s_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, out_ch), lambda b_, s_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    pooled3 = pooled[:, None, :]  # (B, 1, C_pool)

    def p2(tap, pooled3, *wargs):
        B_l = tap.shape[0]
        return pl.pallas_call(
            lambda *refs: _k_p2(cdt, n_layers, *refs),
            out_shape=jax.ShapeDtypeStruct((B_l, N, out_ch), jnp.float32),
            grid=(B_l, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tn, tap.shape[2]),
                             lambda b_, s_: (b_, s_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pooled3.shape[2]),
                             lambda b_, s_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + wspec,
            out_specs=pl.BlockSpec((1, tn, out_ch),
                                   lambda b_, s_: (b_, s_, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(tap, pooled3, *wargs)

    args = (tap, pooled3, *warg)
    rule = auto_rule([jnp.ndim(a) for a in args], (0, 1), [3])
    return batch_partitioned(p2, rule, (0, 1))(*args)
