"""Fused set-abstraction TRAINING step (forward + custom VJP).

The training-mode SA layer (models/pointnet.py::SetAbstraction with
train=True, mirroring /root/reference/pointnet2/utils/
pointnet2_modules.py:24-149 + pytorch_utils.py:12-37 SharedMLP) is the BAT /
P2B train-step bottleneck: the (B, S, K, C) neighborhood grid round-trips
HBM through every Dense / BatchNorm / ReLU, the XLA row-gather runs ~10x off
bandwidth, and its backward is a scatter-add that is slower still (measured
on v5e at batch 16: SA fwd+bwd 5.2-5.7 ms per layer while the pure grid MLP
accounts for less than half — see PROFILE_BAT.md).

Eval-mode fusion (ops/sa_fused.py) folds BatchNorm into the Dense weights
because the statistics are constants. The key observation for TRAINING mode
is that the same fold applies once the *batch* statistics are known:

    train forward == eval forward with BN folded at (batch_mean, batch_var).

So the fused training forward runs in passes, each a Pallas kernel over
(batch, centroid-tile) programs that rebuilds the neighborhood one-hot from
the ball-query indices and rides the MXU (see ops/sa_fused.py for why
one-hot matmul is the TPU-native gather):

  F1  y1 = gather(a) + ct            -> y1 grid (HBM, once) + (sum, sum^2)
  F2  h1 = relu(fold1(y1)); y2 = h1 @ W2 + b2
                                     -> h1 grid (HBM, once) + stats2
  F3  h2 = relu(fold2(y2)); y3 = h2 @ W3 + b3
                                     -> h2 grid + stats3
  F4  out = max_k relu(fold3(y3))

where `a`/`ct` are the A-form of MLP layer 1 computed OUTSIDE at N points
(a = [xyz/r, f] @ W1, ct_s = b1 - (c_s/r) @ W1_xyz — sa_fused.py), so the
gather is C1-wide instead of (3+C)-wide and autodiff of the A-form einsums
yields dW1 / dfeatures / dxyz for free.

The backward is a custom VJP in four more passes implementing the exact
BatchNorm-training chain rule (biased variance, rsqrt(var+eps), the same
formula flax autodiff produces) and the tie-splitting max-pool gradient
(JAX's reduce_max VJP splits the cotangent evenly among exact ties, which
the pad-with-first ball-query duplicates hit routinely):

  B1  dz3 = relu' * maxgrad(g)       -> dz3 grid + (sum dz3, sum dz3*yh3)
  B2  dy3 = BNbwd(dz3); dW3 += h2^T dy3; dz2 = (dy3 @ W3^T) * relu'
                                     -> dz2 grid + sums2
  B3  dy2 = BNbwd(dz2); dW2 += h1^T dy2; dz1 = (dy2 @ W2^T) * relu'
                                     -> dz1 grid + sums1
  B4  dy1 = BNbwd(dz1)               -> da += onehot^T dy1 ; dct = sum_k dy1

Analytic shortcuts (returned as exact zeros, asserted in tests): the
gradient of a Dense bias feeding a BatchNorm is sum(dy) = 0 because
sum(y_hat) = 0 — so db1/db2/db3 vanish identically.

HBM traffic per layer: the y1 grid is computed once in F1 (one one-hot
gather) and cached for F2/B3/B4 — one f32 grid round trip instead of three
extra (tsk, N) @ (N, C1) gather matmuls; h1/h2 are written once and read by
the two passes that need them; dz grids written/read once each — versus the
unfused path's per-op grid round-trips plus gather + scatter-add. All pass
outputs (grids, per-batch partial-sum accumulators) are batch-leading, and
every pallas_call carries a GSPMD batch-partitioning rule (ops/partition.py
via _ppart), so a sharded jit runs the kernels per-shard with batch
statistics still EXACTLY global (the accumulator sums reduce across shards
through the partitioner's allreduce).

The module exposes two implementations behind one API:
  impl='ref'    — whole-grid jnp (used as the golden reference in tests and
                  to validate the manual VJP against flax autodiff);
  impl='pallas' — the tiled kernels (CPU tests run them in interpret mode).

Running-statistics updates are NOT performed here: `fused_sa_train_apply`
returns the per-layer (batch_mean, batch_var) and SetAbstraction feeds them
through the real flax BatchNorm modules (models/layers.py::MLP.
update_batch_stats) so the `batch_stats` collection update is bit-identical
to the unfused path.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open3dsot_tpu.ops.sa_fused import (
    _BN_EPS,
    _dot,
    _gather_rows,
    a_form,
    bf16_byte_planes,
    int8_gather_default,
)


class _SACfg(NamedTuple):
    """Hashable static config for the custom_vjp core (nondiff argnum 0)."""

    B: int
    N: int
    S: int
    K: int
    C1: int
    C2: int
    C3: int
    cdt: str          # compute dtype name ('float32' / 'bfloat16')
    interpret: bool
    impl: str         # 'ref' | 'pallas'
    # F1's one-hot gather as the exact int8 bit-plane dot (sa_fused.py::
    # _gather_rows) — on TPU this is bit-identical to the shipped gather
    # (DEFAULT-precision dots run one bf16 MXU pass for f32 operands too),
    # at the int8 MXU rate. B4's scatter-add CANNOT use it: onehot^T @ dy1
    # SUMS selected rows, and byte-wise sums carry.
    i8g: bool = False


# --------------------------------------------------------------------------
# Reference implementation (whole grid, plain jnp) — golden path for tests
# --------------------------------------------------------------------------


def _gather_y1(a, ct, idx):
    """y1 grid (B, S, K, C1) = a[idx] + ct (f32)."""
    B, S, K = idx.shape
    g = jax.vmap(lambda ab, ib: ab[ib])(a, idx.reshape(B, S * K))
    return g.reshape(B, S, K, -1).astype(jnp.float32) + ct[:, :, None, :]


def _stats(y):
    """(batch_mean, biased batch_var) over all axes but the channel one —
    flax BatchNorm use_fast_variance semantics (mean(x^2) - mean(x)^2)."""
    mu = jnp.mean(y, axis=tuple(range(y.ndim - 1)))
    var = jnp.mean(jnp.square(y), axis=tuple(range(y.ndim - 1))) - mu * mu
    return mu, var


def _fold(mu, var, gamma, beta):
    s = gamma * jax.lax.rsqrt(var + _BN_EPS)
    return s, beta - mu * s


def _ref_fwd(cfg: _SACfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3,
             idx):
    y1 = _gather_y1(a, ct, idx)
    mu1, v1 = _stats(y1)
    s1, t1 = _fold(mu1, v1, g1, bt1)
    h1 = jax.nn.relu(y1 * s1 + t1)
    y2 = h1 @ w2 + b2
    mu2, v2 = _stats(y2)
    s2, t2 = _fold(mu2, v2, g2, bt2)
    h2 = jax.nn.relu(y2 * s2 + t2)
    y3 = h2 @ w3 + b3
    mu3, v3 = _stats(y3)
    s3, t3 = _fold(mu3, v3, g3, bt3)
    h3 = jax.nn.relu(y3 * s3 + t3)
    out = jnp.max(h3, axis=2)  # (B, S, C3)
    stats = (mu1, v1, mu2, v2, mu3, v3)
    return out, stats, (y1, h1, h2, h3)


def _bn_bwd(dz, yhat, gamma, var, sums):
    """BatchNorm-training backward: dz (..., C) -> dy, given yhat and the
    global sums (sum dz, sum dz*yhat) over the M grid elements."""
    M = float(np.prod(dz.shape[:-1]))
    sdz, sdzy = sums
    inv_sigma = jax.lax.rsqrt(var + _BN_EPS)
    return (gamma * inv_sigma) * (dz - sdz / M - yhat * (sdzy / M))


def _manual_vjp_math(cfg, primals, g_out):
    """Pass-decomposed manual VJP (whole-grid jnp). Returns cotangents in
    the core argument order (a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3,
    bt3)."""
    (a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx) = primals
    out, stats, (y1, h1, h2, h3) = _ref_fwd(
        cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx)
    mu1, v1, mu2, v2, mu3, v3 = stats
    y2 = h1 @ w2 + b2
    y3 = h2 @ w3 + b3
    yh1 = (y1 - mu1) * jax.lax.rsqrt(v1 + _BN_EPS)
    yh2 = (y2 - mu2) * jax.lax.rsqrt(v2 + _BN_EPS)
    yh3 = (y3 - mu3) * jax.lax.rsqrt(v3 + _BN_EPS)

    # B1: max-pool bwd (tie-splitting) + relu'
    mx = jnp.max(h3, axis=2, keepdims=True)
    mask = (h3 == mx).astype(jnp.float32)
    cnt = jnp.sum(mask, axis=2, keepdims=True)
    dz3 = (g_out[:, :, None, :].astype(jnp.float32) * mask / cnt) * (h3 > 0)
    dgamma3 = jnp.sum(dz3 * yh3, axis=(0, 1, 2))
    dbeta3 = jnp.sum(dz3, axis=(0, 1, 2))

    # B2
    dy3 = _bn_bwd(dz3, yh3, g3, v3, (dbeta3, dgamma3))
    dw3 = jnp.einsum("bskc,bskd->cd", h2, dy3)
    dz2 = (dy3 @ w3.T) * (h2 > 0)
    dgamma2 = jnp.sum(dz2 * yh2, axis=(0, 1, 2))
    dbeta2 = jnp.sum(dz2, axis=(0, 1, 2))

    # B3
    dy2 = _bn_bwd(dz2, yh2, g2, v2, (dbeta2, dgamma2))
    dw2 = jnp.einsum("bskc,bskd->cd", h1, dy2)
    dz1 = (dy2 @ w2.T) * (h1 > 0)
    dgamma1 = jnp.sum(dz1 * yh1, axis=(0, 1, 2))
    dbeta1 = jnp.sum(dz1, axis=(0, 1, 2))

    # B4
    dy1 = _bn_bwd(dz1, yh1, g1, v1, (dbeta1, dgamma1))
    B, S, K = idx.shape
    da = jax.vmap(
        lambda zb, ib, db: zb.at[ib].add(db)
    )(jnp.zeros_like(a, jnp.float32), idx.reshape(B, S * K),
      dy1.reshape(B, S * K, -1))
    dct = jnp.sum(dy1, axis=2)

    zb2 = jnp.zeros_like(b2)  # Dense bias feeding BN: grad is exactly 0
    zb3 = jnp.zeros_like(b3)
    return (da.astype(a.dtype), dct.astype(ct.dtype), dw2.astype(w2.dtype),
            zb2, dw3.astype(w3.dtype), zb3, dgamma1, dbeta1, dgamma2,
            dbeta2, dgamma3, dbeta3)


# --------------------------------------------------------------------------
# custom_vjp core
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg: _SACfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3,
          idx):
    out, stats = _core_fwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2,
                           g3, bt3, idx)[0]
    return out, stats


def _core_fwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx):
    if cfg.impl == "ref":
        out, stats, _ = _ref_fwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2,
                                 bt2, g3, bt3, idx)
        grids = None
    else:
        out, stats, grids = _pallas_fwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1,
                                        g2, bt2, g3, bt3, idx)
    res = (a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx, stats,
           grids)
    return ((out, stats), res)


def _core_bwd(cfg, res, cot):
    (a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx, stats,
     grids) = res
    g_out, _g_stats = cot  # stats are state-update outputs: cotangent unused
    if cfg.impl == "ref":
        primals = (a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx)
        grads = _manual_vjp_math(cfg, primals, g_out)
    else:
        grads = _pallas_bwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2,
                            g3, bt3, idx, stats, grids, g_out)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return tuple(grads) + (didx,)


_core.defvjp(lambda cfg, *args: _core_fwd(cfg, *args),
             _core_bwd)


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def fused_sa_train_apply(
    xyz: jnp.ndarray,
    features: Optional[jnp.ndarray],
    new_xyz: jnp.ndarray,
    idx: jnp.ndarray,
    mlp_params,
    *,
    radius: float,
    normalize_xyz: bool,
    use_xyz: bool,
    dtype: Any = None,
    interpret: Optional[bool] = None,
    impl: str = "pallas",
    int8_gather: Optional[bool] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Fused training-mode SA layer.

    xyz (B,N,3), features (B,N,C) or None, new_xyz (B,S,3) centers,
    idx (B,S,K) ball-query indices, mlp_params = the 'mlp_shared' params
    subtree (3 DenseBNRelu layers with raw dense + bn params).

    Returns (out (B,S,C3), stats {'layer{i}': (batch_mean, batch_var)}).
    Differentiable wrt mlp_params / features / xyz / new_xyz; the stats
    outputs carry no gradient (they feed the running-statistics update).

    int8_gather: F1's one-hot gather as the exact int8 bit-plane dot (see
    _SACfg.i8g). Default (None): on whenever the kernels actually compile
    (sa_fused.py::int8_gather_default); golden interpret tests keep exact
    f32 gathers.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    i8g = (int8_gather_default(interpret) if int8_gather is None
           else bool(int8_gather))
    cdt = jnp.dtype(dtype if dtype is not None else jnp.float32)
    B, N, _ = xyz.shape
    S, K = idx.shape[1], idx.shape[2]

    w1 = mlp_params["layer0"]["dense"]["kernel"].astype(jnp.float32)
    b1 = mlp_params["layer0"]["dense"]["bias"].astype(jnp.float32)
    w2 = mlp_params["layer1"]["dense"]["kernel"].astype(jnp.float32)
    b2 = mlp_params["layer1"]["dense"]["bias"].astype(jnp.float32)
    w3 = mlp_params["layer2"]["dense"]["kernel"].astype(jnp.float32)
    b3 = mlp_params["layer2"]["dense"]["bias"].astype(jnp.float32)
    bn = [mlp_params[f"layer{i}"]["bn"] for i in range(3)]
    g1, bt1 = bn[0]["scale"].astype(jnp.float32), bn[0]["bias"].astype(jnp.float32)
    g2, bt2 = bn[1]["scale"].astype(jnp.float32), bn[1]["bias"].astype(jnp.float32)
    g3, bt3 = bn[2]["scale"].astype(jnp.float32), bn[2]["bias"].astype(jnp.float32)

    # A-form of MLP layer 1 at N points (sa_fused.py::a_form): y1 = a[idx]
    # + ct. Plain XLA einsums — autodiff of these yields dW1/db1/dfeatures/
    # dxyz from the (da, dct) cotangents the core emits.
    inv_r = (1.0 / radius) if normalize_xyz else 1.0
    a, ct = a_form(xyz, features, new_xyz, w1, b1, inv_r=inv_r,
                   use_xyz=use_xyz)  # (B, N, C1) f32

    cfg = _SACfg(B=B, N=N, S=S, K=K, C1=w1.shape[1], C2=w2.shape[1],
                 C3=w3.shape[1], cdt=cdt.name, interpret=bool(interpret),
                 impl=impl, i8g=i8g and impl == "pallas")
    out, stats = _core(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3,
                       bt3, idx.astype(jnp.int32))
    mu1, v1, mu2, v2, mu3, v3 = stats
    stats_dict = {
        "layer0": (mu1, v1),
        "layer1": (mu2, v2),
        "layer2": (mu3, v3),
    }
    return out.astype(cdt), stats_dict


# --------------------------------------------------------------------------
# Pallas implementation
# --------------------------------------------------------------------------
#
# All passes share one (batch, centroid-tile) grid; the grid is sequential
# on a TPU core, so global accumulators are output blocks with a constant
# index map, zero-initialized at the first program (standard revisited-block
# accumulation). Tiles are sized so ts*K rows of the widest temporaries fit
# VMEM (~16 MB/core).


def _tile_size(cfg) -> int:
    """Largest divisor of S with ts*K <= 1024 rows (2048 for bf16)."""
    cap = 2048 if cfg.cdt == "bfloat16" else 1024
    ts = max(1, min(cfg.S, cap // max(1, cfg.K)))
    while cfg.S % ts:
        ts -= 1
    return ts


def _y1_tile(idx_ref, a_ref, ct_ref, cdt, i8g=False):
    """Recompute the layer-1 pre-BN tile: y1 = onehot @ a + ct, (tsk, C1) f32.

    i8g: a_ref holds (1, N, 2*C1) int8 byte planes and the gather runs as
    the exact bit-plane dot (sa_fused.py::_gather_rows)."""
    ts, K = idx_ref.shape[2], idx_ref.shape[3]
    n = a_ref.shape[1]
    c1 = a_ref.shape[2] // 2 if i8g else a_ref.shape[2]
    idx2 = idx_ref[0, 0]  # (ts, K)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (ts, K, n), 2) == idx2[:, :, None]
    ).reshape(ts * K, n)
    g = _gather_rows(onehot, a_ref[0], cdt, c1, i8g)  # (tsk, c1) f32
    y1 = g.reshape(ts, K, c1) + ct_ref[0][:, None, :]
    return y1.reshape(ts * K, c1)


def _first_program():
    return jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)


def _acc_into(ref, value):
    """Accumulate tile sums into one revisited global block.

    Mosaic keeps a revisited (index-invariant) output block VMEM-resident
    across the whole grid and flushes it once — measured faster than per-b
    accumulator blocks (one flush+refill per batch element cost the full
    BAT step ~0.6 ms). Under GSPMD the per-shard lowering computes the
    shard-local sums and ops/partition.py psums them over the batch axis
    (out_batched=False), so sharded batch statistics stay exactly global."""

    @pl.when(_first_program())
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += value.astype(ref.dtype)


def _sums2(x, yh=None):
    """(2, C) stack of column sums: [sum x; sum x*yh (or x^2)]."""
    other = x * (yh if yh is not None else x)
    return jnp.concatenate(
        [jnp.sum(x, axis=0, keepdims=True),
         jnp.sum(other, axis=0, keepdims=True)], axis=0)


def _kf1(cdt, i8g, idx_ref, a_ref, ct_ref, y1_ref, acc_ref):
    """Stats pass; also CACHES the y1 grid (f32) so F2/B3/B4 skip the
    one-hot re-gather (VERDICT r2 item 8: ~3 extra (tsk,N)@(N,C1) matmuls
    per layer traded for one HBM round trip of the grid)."""
    y1 = _y1_tile(idx_ref, a_ref, ct_ref, cdt, i8g)
    y1_ref[0] = y1.astype(y1_ref.dtype)
    _acc_into(acc_ref, _sums2(y1))


def _kf2(cdt, y1_ref, f1_ref, w2_ref, b2_ref, h1_ref,
         acc_ref):
    y1 = y1_ref[0].astype(jnp.float32)
    h1 = jnp.maximum(y1 * f1_ref[0:1, :] + f1_ref[1:2, :], 0.0)
    h1_ref[0] = h1.astype(h1_ref.dtype)
    y2 = _dot(h1.astype(cdt), w2_ref[:].astype(cdt), cdt) + b2_ref[:]
    _acc_into(acc_ref, _sums2(y2))


def _kf3(cdt, h1_ref, w2_ref, b2_ref, f2_ref, w3_ref, b3_ref, h2_ref,
         acc_ref):
    y2 = _dot(h1_ref[0].astype(cdt), w2_ref[:].astype(cdt), cdt) + b2_ref[:]
    h2 = jnp.maximum(y2 * f2_ref[0:1, :] + f2_ref[1:2, :], 0.0)
    h2_ref[0] = h2.astype(h2_ref.dtype)
    y3 = _dot(h2.astype(cdt), w3_ref[:].astype(cdt), cdt) + b3_ref[:]
    _acc_into(acc_ref, _sums2(y3))


def _kf4(K, cdt, h2_ref, w3_ref, b3_ref, f3_ref, out_ref):
    y3 = _dot(h2_ref[0].astype(cdt), w3_ref[:].astype(cdt), cdt) + b3_ref[:]
    h3 = jnp.maximum(y3 * f3_ref[0:1, :] + f3_ref[1:2, :], 0.0)
    ts = h2_ref.shape[1] // K
    out_ref[0] = jnp.max(h3.reshape(ts, K, -1), axis=1).astype(out_ref.dtype)


def _kb1(K, cdt, h2_ref, w3_ref, b3_ref, f3_ref, mi3_ref, g_ref, dz3_ref,
         acc_ref):
    """dz3 = maxgrad(g) * relu'; accumulate [sum dz3; sum dz3*yhat3]."""
    y3 = _dot(h2_ref[0].astype(cdt), w3_ref[:].astype(cdt), cdt) + b3_ref[:]
    z3 = y3 * f3_ref[0:1, :] + f3_ref[1:2, :]
    h3 = jnp.maximum(z3, 0.0)
    ts = h2_ref.shape[1] // K
    c3 = y3.shape[1]
    h3r = h3.reshape(ts, K, c3)
    mx = jnp.max(h3r, axis=1, keepdims=True)
    mask = (h3r == mx).astype(jnp.float32)
    cnt = jnp.sum(mask, axis=1, keepdims=True)
    G3 = g_ref[0][:, None, :].astype(jnp.float32) * mask / cnt
    dz3 = jnp.where(h3r > 0.0, G3, 0.0).reshape(ts * K, c3)
    dz3_ref[0] = dz3.astype(dz3_ref.dtype)
    yh3 = (y3 - mi3_ref[0:1, :]) * mi3_ref[1:2, :]
    _acc_into(acc_ref, _sums2(dz3, yh3))


def _bn_bwd_tile(dz, y, s_row, mi_ref, sums_ref, M):
    """dy = s * (dz - sum/M - yhat * sum_yh/M) with yhat from (y, mi)."""
    yh = (y - mi_ref[0:1, :]) * mi_ref[1:2, :]
    return s_row * (dz - sums_ref[0:1, :] / M - yh * (sums_ref[1:2, :] / M))


def _kb2(M, cdt, dz3_ref, h2_ref, h1_ref, w3_ref, b3_ref, w3t_ref, w2_ref,
         b2_ref, s3_ref, mi3_ref, sums3_ref, mi2_ref, dw3_ref, dz2_ref,
         acc_ref):
    y3 = _dot(h2_ref[0].astype(cdt), w3_ref[:].astype(cdt), cdt) + b3_ref[:]
    dy3 = _bn_bwd_tile(dz3_ref[0].astype(jnp.float32), y3, s3_ref[0:1, :],
                       mi3_ref, sums3_ref, M)
    h2 = h2_ref[0].astype(cdt)
    _acc_into(dw3_ref, jax.lax.dot_general(
        h2, dy3.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT))
    dh2 = _dot(dy3.astype(cdt), w3t_ref[:].astype(cdt), cdt)
    # compare in f32: Mosaic cannot lower cmpf on native bf16 tiles
    dz2 = jnp.where(h2_ref[0].astype(jnp.float32) > 0.0, dh2, 0.0)
    dz2_ref[0] = dz2.astype(dz2_ref.dtype)
    y2 = _dot(h1_ref[0].astype(cdt), w2_ref[:].astype(cdt), cdt) + b2_ref[:]
    yh2 = (y2 - mi2_ref[0:1, :]) * mi2_ref[1:2, :]
    _acc_into(acc_ref, _sums2(dz2, yh2))


def _kb3(M, cdt, dz2_ref, h1_ref, y1_ref, w2_ref, b2_ref,
         w2t_ref, s2_ref, mi2_ref, sums2_ref, mi1_ref, dw2_ref, dz1_ref,
         acc_ref):
    y2 = _dot(h1_ref[0].astype(cdt), w2_ref[:].astype(cdt), cdt) + b2_ref[:]
    dy2 = _bn_bwd_tile(dz2_ref[0].astype(jnp.float32), y2, s2_ref[0:1, :],
                       mi2_ref, sums2_ref, M)
    h1 = h1_ref[0].astype(cdt)
    _acc_into(dw2_ref, jax.lax.dot_general(
        h1, dy2.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT))
    dh1 = _dot(dy2.astype(cdt), w2t_ref[:].astype(cdt), cdt)
    dz1 = jnp.where(h1_ref[0].astype(jnp.float32) > 0.0, dh1, 0.0)
    dz1_ref[0] = dz1.astype(dz1_ref.dtype)
    y1 = y1_ref[0].astype(jnp.float32)
    yh1 = (y1 - mi1_ref[0:1, :]) * mi1_ref[1:2, :]
    _acc_into(acc_ref, _sums2(dz1, yh1))


def _kb4(M, K, cdt, dz1_ref, idx_ref, y1_ref, s1_ref, mi1_ref,
         sums1_ref, da_ref, dct_ref):
    y1 = y1_ref[0].astype(jnp.float32)
    dy1 = _bn_bwd_tile(dz1_ref[0].astype(jnp.float32), y1, s1_ref[0:1, :],
                       mi1_ref, sums1_ref, M)
    ts = dz1_ref.shape[1] // K
    n, c1 = da_ref.shape[1], da_ref.shape[2]
    idx2 = idx_ref[0, 0]  # (ts, K)
    # scatter-add as onehot^T @ dy1, expressed as a dim0-x-dim0 contraction
    # (a direct (1, ts*K) index reshape is a lane-crossing shape cast Mosaic
    # rejects; the (ts, K, n) -> (ts*K, n) collapse keeps the lane dim)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (ts, K, n), 2) == idx2[:, :, None]
    ).reshape(ts * K, n)

    @pl.when(pl.program_id(1) == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)

    da_ref[0] += jax.lax.dot_general(
        onehot.astype(cdt), dy1.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT).astype(da_ref.dtype)
    dct_ref[0] = jnp.sum(dy1.reshape(ts, K, c1), axis=1).astype(dct_ref.dtype)


def _mi(mu, var):
    return jnp.stack([mu, jax.lax.rsqrt(var + _BN_EPS)], axis=0)


def _pallas_common(cfg, idx):
    cdt = jnp.dtype(cfg.cdt)
    ts = _tile_size(cfg)
    n_tiles = cfg.S // ts
    # idx.shape[0] (not cfg.B): under GSPMD the per-shard lowering sees the
    # local batch slice while cfg carries the global shapes
    idx_flat = idx.reshape(idx.shape[0], n_tiles, ts, cfg.K).astype(jnp.int32)
    tsk = ts * cfg.K

    def tiled(c, dtype=None):
        return pl.BlockSpec((1, tsk, c), lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, s: (0,) * nd,
                            memory_space=pltpu.VMEM)

    specs = dict(
        idx=pl.BlockSpec((1, 1, ts, cfg.K), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        a=pl.BlockSpec((1, cfg.N, cfg.C1), lambda b, s: (b, 0, 0),
                       memory_space=pltpu.VMEM),
        ct=pl.BlockSpec((1, ts, cfg.C1), lambda b, s: (b, s, 0),
                        memory_space=pltpu.VMEM),
        tiled=tiled, const=const,
    )
    return cdt, ts, n_tiles, tsk, idx_flat, specs


def _ppart(fn, args, batched, out_batched=None):
    """Invoke a pallas-call builder through a GSPMD batch-partitioning rule
    (ops/partition.py): listed args are batch-leading, the rest replicate,
    and the per-shard lowering is `fn` itself (which reads its local B from
    the input shapes). Outputs flagged False in out_batched are global SUMS
    over the batch grid: the partitioner psums the per-shard partials."""
    from open3dsot_tpu.ops.partition import auto_rule, batch_partitioned

    out_tree = jax.eval_shape(fn, *args)
    out_ranks = [len(leaf.shape)
                 for leaf in jax.tree_util.tree_leaves(out_tree)]
    rule = auto_rule([jnp.ndim(x) for x in args], batched, out_ranks,
                     out_batched)
    return batch_partitioned(fn, rule, batched, out_batched)(*args)


def _pallas_fwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx):
    cdt, ts, n_tiles, tsk, idx_flat, sp = _pallas_common(cfg, idx)
    S, K = cfg.S, cfg.K
    c1, c2, c3 = cfg.C1, cfg.C2, cfg.C3
    # M is the GLOBAL reduction count (cfg.B); the grid below runs over the
    # local batch slice. The (B, 2, c) accumulator sums reduce over b at the
    # jnp level, which the GSPMD partitioner turns into the allreduce that
    # makes sharded batch statistics EXACTLY the global-batch ones.
    M = float(cfg.B * S * K)
    interp = cfg.interpret
    if not interp:
        from open3dsot_tpu.ops.flops import add_pallas_flops, sa_train_fwd_flops
        add_pallas_flops(sa_train_fwd_flops(cfg.B, S, K, cfg.N, c1, c2, c3))
    b2r, b3r = b2[None, :], b3[None, :]

    i8g = cfg.i8g
    if i8g:
        # F1's gather operand as int8 byte planes — bit-identical selection
        # at the int8 MXU rate (see _SACfg.i8g); same HBM/VMEM bytes.
        a_in = bf16_byte_planes(a)
        a_spec = pl.BlockSpec((1, cfg.N, 2 * c1), lambda b, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        a_in, a_spec = a, sp["a"]

    def f1(idx_flat, a_in, ct):
        B = idx_flat.shape[0]
        return pl.pallas_call(
            functools.partial(_kf1, cdt, i8g),
            out_shape=[jax.ShapeDtypeStruct((B, S * K, c1), jnp.float32),
                       jax.ShapeDtypeStruct((2, c1), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["idx"], a_spec, sp["ct"]],
            out_specs=[sp["tiled"](c1), sp["const"]((2, c1))],
            interpret=interp,
        )(idx_flat, a_in, ct)

    y1, acc1 = _ppart(f1, (idx_flat, a_in, ct), batched=(0, 1, 2),
                      out_batched=(True, False))
    mu1 = acc1[0] / M
    v1 = acc1[1] / M - mu1 * mu1
    s1 = g1 * jax.lax.rsqrt(v1 + _BN_EPS)
    fold1 = jnp.stack([s1, bt1 - mu1 * s1], axis=0)

    def f2(y1, fold1, w2, b2r):
        B = y1.shape[0]
        return pl.pallas_call(
            functools.partial(_kf2, cdt),
            out_shape=[jax.ShapeDtypeStruct((B, S * K, c1), cdt),
                       jax.ShapeDtypeStruct((2, c2), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c1), sp["const"]((2, c1)),
                      sp["const"](w2.shape), sp["const"]((1, c2))],
            out_specs=[sp["tiled"](c1), sp["const"]((2, c2))],
            interpret=interp,
        )(y1, fold1, w2, b2r)

    h1, acc2 = _ppart(f2, (y1, fold1, w2, b2r), batched=(0,),
                      out_batched=(True, False))
    mu2 = acc2[0] / M
    v2 = acc2[1] / M - mu2 * mu2
    s2 = g2 * jax.lax.rsqrt(v2 + _BN_EPS)
    fold2 = jnp.stack([s2, bt2 - mu2 * s2], axis=0)

    def f3(h1, w2, b2r, fold2, w3, b3r):
        B = h1.shape[0]
        return pl.pallas_call(
            functools.partial(_kf3, cdt),
            out_shape=[jax.ShapeDtypeStruct((B, S * K, c2), cdt),
                       jax.ShapeDtypeStruct((2, c3), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c1), sp["const"](w2.shape),
                      sp["const"]((1, c2)), sp["const"]((2, c2)),
                      sp["const"](w3.shape), sp["const"]((1, c3))],
            out_specs=[sp["tiled"](c2), sp["const"]((2, c3))],
            interpret=interp,
        )(h1, w2, b2r, fold2, w3, b3r)

    h2, acc3 = _ppart(f3, (h1, w2, b2r, fold2, w3, b3r), batched=(0,),
                      out_batched=(True, False))
    mu3 = acc3[0] / M
    v3 = acc3[1] / M - mu3 * mu3
    s3 = g3 * jax.lax.rsqrt(v3 + _BN_EPS)
    fold3 = jnp.stack([s3, bt3 - mu3 * s3], axis=0)

    def f4(h2, w3, b3r, fold3):
        B = h2.shape[0]
        return pl.pallas_call(
            functools.partial(_kf4, K, cdt),
            out_shape=jax.ShapeDtypeStruct((B, S, c3), jnp.float32),
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c2), sp["const"](w3.shape),
                      sp["const"]((1, c3)), sp["const"]((2, c3))],
            out_specs=pl.BlockSpec((1, ts, c3), lambda b, s: (b, s, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(h2, w3, b3r, fold3)

    out = _ppart(f4, (h2, w3, b3r, fold3), batched=(0,))

    stats = (mu1, v1, mu2, v2, mu3, v3)
    return out, stats, (y1, h1, h2)


def _pallas_bwd(cfg, a, ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx,
                stats, grids, g_out):
    cdt, ts, n_tiles, tsk, idx_flat, sp = _pallas_common(cfg, idx)
    S, K, N = cfg.S, cfg.K, cfg.N
    c1, c2, c3 = cfg.C1, cfg.C2, cfg.C3
    M = float(cfg.B * S * K)  # global count; see _pallas_fwd
    interp = cfg.interpret
    if not interp:
        from open3dsot_tpu.ops.flops import add_pallas_flops, sa_train_bwd_flops
        add_pallas_flops(sa_train_bwd_flops(cfg.B, S, K, N, c1, c2, c3))
    y1, h1, h2 = grids
    mu1, v1, mu2, v2, mu3, v3 = stats
    s3 = g3 * jax.lax.rsqrt(v3 + _BN_EPS)
    fold3 = jnp.stack([s3, bt3 - mu3 * s3], axis=0)
    mi1, mi2, mi3 = _mi(mu1, v1), _mi(mu2, v2), _mi(mu3, v3)
    s1r = (g1 * jax.lax.rsqrt(v1 + _BN_EPS))[None, :]
    s2r = (g2 * jax.lax.rsqrt(v2 + _BN_EPS))[None, :]
    s3r = s3[None, :]
    b2r, b3r = b2[None, :], b3[None, :]
    g_out = g_out.astype(jnp.float32)

    # B1: max-pool + relu' -> dz3 grid + [sum dz3; sum dz3*yhat3]
    def kb1(h2, w3, b3r, fold3, mi3, g_out):
        B = h2.shape[0]
        return pl.pallas_call(
            functools.partial(_kb1, K, cdt),
            out_shape=[jax.ShapeDtypeStruct((B, S * K, c3), cdt),
                       jax.ShapeDtypeStruct((2, c3), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c2), sp["const"](w3.shape),
                      sp["const"]((1, c3)), sp["const"]((2, c3)),
                      sp["const"]((2, c3)),
                      pl.BlockSpec((1, ts, c3), lambda b, s: (b, s, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[sp["tiled"](c3), sp["const"]((2, c3))],
            interpret=interp,
        )(h2, w3, b3r, fold3, mi3, g_out)

    dz3, accs3 = _ppart(kb1, (h2, w3, b3r, fold3, mi3, g_out),
                        batched=(0, 5), out_batched=(True, False))

    # B2: dy3 = BNbwd(dz3); dW3; dz2 grid + sums2
    def kb2(dz3, h2, h1, w3, b3r, w3t, w2, b2r, s3r, mi3, accs3, mi2):
        B = dz3.shape[0]
        return pl.pallas_call(
            functools.partial(_kb2, M, cdt),
            out_shape=[jax.ShapeDtypeStruct((c2, c3), jnp.float32),
                       jax.ShapeDtypeStruct((B, S * K, c2), cdt),
                       jax.ShapeDtypeStruct((2, c2), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c3), sp["tiled"](c2), sp["tiled"](c1),
                      sp["const"](w3.shape), sp["const"]((1, c3)),
                      sp["const"]((c3, c2)), sp["const"](w2.shape),
                      sp["const"]((1, c2)), sp["const"]((1, c3)),
                      sp["const"]((2, c3)), sp["const"]((2, c3)),
                      sp["const"]((2, c2))],
            out_specs=[sp["const"]((c2, c3)), sp["tiled"](c2),
                       sp["const"]((2, c2))],
            interpret=interp,
        )(dz3, h2, h1, w3, b3r, w3t, w2, b2r, s3r, mi3, accs3, mi2)

    dw3, dz2, accs2 = _ppart(
        kb2, (dz3, h2, h1, w3, b3r, w3.T, w2, b2r, s3r, mi3, accs3, mi2),
        batched=(0, 1, 2), out_batched=(False, True, False))

    # B3: dy2; dW2; dz1 grid + sums1
    def kb3(dz2, h1, y1, w2, b2r, w2t, s2r, mi2, accs2, mi1):
        B = dz2.shape[0]
        return pl.pallas_call(
            functools.partial(_kb3, M, cdt),
            out_shape=[jax.ShapeDtypeStruct((c1, c2), jnp.float32),
                       jax.ShapeDtypeStruct((B, S * K, c1), cdt),
                       jax.ShapeDtypeStruct((2, c1), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c2), sp["tiled"](c1), sp["tiled"](c1),
                      sp["const"](w2.shape), sp["const"]((1, c2)),
                      sp["const"]((c2, c1)), sp["const"]((1, c2)),
                      sp["const"]((2, c2)), sp["const"]((2, c2)),
                      sp["const"]((2, c1))],
            out_specs=[sp["const"]((c1, c2)), sp["tiled"](c1),
                       sp["const"]((2, c1))],
            interpret=interp,
        )(dz2, h1, y1, w2, b2r, w2t, s2r, mi2, accs2, mi1)

    dw2, dz1, accs1 = _ppart(
        kb3, (dz2, h1, y1, w2, b2r, w2.T, s2r, mi2, accs2, mi1),
        batched=(0, 1, 2), out_batched=(False, True, False))

    # B4: dy1 -> da (scatter via onehot^T) + dct
    def kb4(dz1, idx_flat, y1, s1r, mi1, accs1):
        B = dz1.shape[0]
        return pl.pallas_call(
            functools.partial(_kb4, M, K, cdt),
            out_shape=[jax.ShapeDtypeStruct((B, N, c1), jnp.float32),
                       jax.ShapeDtypeStruct((B, S, c1), jnp.float32)],
            grid=(B, n_tiles),
            in_specs=[sp["tiled"](c1), sp["idx"], sp["tiled"](c1),
                      sp["const"]((1, c1)), sp["const"]((2, c1)),
                      sp["const"]((2, c1))],
            out_specs=[pl.BlockSpec((1, N, c1), lambda b, s: (b, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, ts, c1), lambda b, s: (b, s, 0),
                                    memory_space=pltpu.VMEM)],
            interpret=interp,
        )(dz1, idx_flat, y1, s1r, mi1, accs1)

    da, dct = _ppart(kb4, (dz1, idx_flat, y1, s1r, mi1, accs1),
                     batched=(0, 1, 2))

    zb2, zb3 = jnp.zeros_like(b2), jnp.zeros_like(b3)
    return (da.astype(a.dtype), dct.astype(ct.dtype), dw2.astype(w2.dtype),
            zb2, dw3.astype(w3.dtype), zb3,
            accs1[1], accs1[0], accs2[1], accs2[0], accs3[1], accs3[0])
