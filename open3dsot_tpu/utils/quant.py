"""Fixed-point int16 transfer codec (config.transfer_quant).

THE single quantize/dequantize pair used by every packing surface — scan
eval (tracking/scan_tracker._pack_transfer), online serving
(tracking/online.py), and the device-sampler training path
(data/device_sampler.pack_raw_batch) — so the host encoder and the shared
in-jit decoder cannot drift.

Per-SAMPLE (leading-axis) ranges: each tracklet/stream/training sample gets
its own midrange offset + symmetric scale over its VALID points, so the
quantization step is <= extent/32766 of that sample's own cloud (~2 mm at
+/-64 m) regardless of where the batch members sit in the world frame —
per-dispatch ranges would inflate the step with inter-sample distance
(global-frame nuScenes/Waymo batches), and pad-row zeros would anchor it to
the origin. Pad rows may clip to the int16 bounds; every consumer masks
them with the same validity array.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quantize_per_sample(pts: np.ndarray, valid: np.ndarray):
    """pts (B, ..., 3) f32 + valid (B, ...) bool -> (q int16 like pts,
    scale (B,), off (B, 3)). Ranges over valid rows per leading-axis sample;
    an all-invalid sample gets off=0, scale=1e-6.

    Dispatches to the bit-exact single-pass native encoder when the C++
    lib is built (native/geomlib.cpp::quantize_per_sample — the numpy
    path below is ~8 memory passes and sits on the eval pipeline's host
    critical path; tests/test_transfer_quant.py pins native == numpy)."""
    from open3dsot_tpu.native import quantize_per_sample_native

    native = quantize_per_sample_native(pts, valid)
    if native is not None:
        return native
    return _quantize_per_sample_numpy(pts, valid)


def _quantize_per_sample_numpy(pts: np.ndarray, valid: np.ndarray):
    """The numpy semantic reference (and no-toolchain fallback)."""
    pts = np.asarray(pts, np.float32)
    B = pts.shape[0]
    flat = pts.reshape(B, -1, 3)
    v = np.asarray(valid, bool).reshape(B, -1)[..., None]
    lo = np.where(v, flat, np.inf).min(axis=1)    # (B, 3)
    hi = np.where(v, flat, -np.inf).max(axis=1)
    empty = ~np.isfinite(lo).all(axis=1)
    lo = np.where(empty[:, None], 0.0, lo)
    hi = np.where(empty[:, None], 0.0, hi)
    off = ((lo + hi) * 0.5).astype(np.float32)    # (B, 3)
    scale = np.maximum(
        np.abs(hi - off).max(axis=1) / 32766.0, 1e-6
    ).astype(np.float32)                           # (B,)
    bshape = (B,) + (1,) * (pts.ndim - 2)
    q = np.clip(
        np.rint((pts - off.reshape(bshape + (3,)))
                / scale.reshape(bshape + (1,))),
        -32768, 32767,
    ).astype(np.int16)
    return q, scale, off


def dequantize(q, scale, off):
    """In-jit decoder: q (B, ..., 3) int16, scale (B,), off (B, 3) ->
    f32 points. Rank-generic broadcast of the per-sample range."""
    bshape = (q.shape[0],) + (1,) * (q.ndim - 2)
    return (q.astype(jnp.float32) * scale.reshape(bshape + (1,))
            + off.reshape(bshape + (3,)))
