"""Exact int8 bit-plane one-hot gather: measured accept/reject (VERDICT r4 #5
follow-up to scripts/probe_gather_int8.py).

probe_gather_int8.py measured the raw MXU rate win at the BAT layer-1 gather
shape: bf16@bf16 0.338 ms vs int8@int8 0.132 ms (2.56x). The naive int8
gather is INEXACT (the gathered operand y1 is a bf16 activation), but a
gather is pure selection, so there is an exact encoding: bitcast y1 to
uint16, split into two int8 byte planes laid side by side (N, 2*C1), do ONE
int8 one-hot dot -> (M, 2*C1) i32 (each output element IS the selected byte,
exactly), then reassemble (hi<<8 | lo&0xFF) and bitcast back to bf16. Bonus:
2*C1=128 columns fills the MXU lanes that C1=64 half-fills
(scripts/probe_gather_orientation.py measured the half-fill).

This probe times the END-TO-END bit-plane gather (dot + recombine VPU work)
against today's bf16 gather at the same shape — the recombine touches
B*M*2*C1 elements and could eat the dot saving; only the measured total
decides. Run on an idle TPU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_bat import chain_timed

S, K, N, C1 = 512, 32, 1024, 64
B = 8
M = S * K


def _bdot(a, b, pet):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (1,)), ((0,), (0,))),
        preferred_element_type=pet,
        precision=jax.lax.Precision.DEFAULT)


def gather_bf16(onehot, y1):
    """Today's kernel gather pass (ops/sa_fused.py): bf16 @ bf16 -> f32."""
    return _bdot(onehot, y1, jnp.float32)


def planes_of(y1_bf16):
    """(B, N, C1) bf16 -> (B, N, 2*C1) int8 byte planes [hi | lo]."""
    u16 = jax.lax.bitcast_convert_type(y1_bf16, jnp.uint16).astype(jnp.uint32)
    hi = (u16 >> 8).astype(jnp.uint8)
    lo = (u16 & 0xFF).astype(jnp.uint8)
    return jnp.concatenate([hi, lo], axis=-1).astype(jnp.int8)


def gather_bitplane(onehot_i8, planes_i8):
    """ONE int8 dot over both byte planes, then exact bf16 reassembly."""
    acc = _bdot(onehot_i8, planes_i8, jnp.int32)  # (B, M, 2*C1)
    hi, lo = acc[..., :C1], acc[..., C1:]
    bits = (((hi & 0xFF) << 8) | (lo & 0xFF)).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16).astype(jnp.float32)


def gather_bitplane_e2e(onehot_i8, y1_bf16):
    """The full substitution as a kernel would run it: y1 is an in-kernel
    bf16 activation, so the plane split is paid per pass too."""
    return gather_bitplane(onehot_i8, planes_of(y1_bf16))


def main():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N, size=(B, M, 1))
    onehot_np = idx == np.arange(N)[None, None, :]
    y1_np = rng.normal(size=(B, N, C1)).astype(np.float32)

    onehot_bf = jnp.asarray(onehot_np, jnp.bfloat16)
    onehot_i8 = jnp.asarray(onehot_np, jnp.int8)
    y1_bf = jnp.asarray(y1_np, jnp.bfloat16)
    planes = np.asarray(jax.jit(planes_of, backend="cpu")(
        jnp.asarray(y1_np, jnp.bfloat16)))

    # Exactness first: bit-plane output must BE the selected bf16 rows.
    want = np.asarray(y1_np, np.float32).astype(jnp.bfloat16)[
        np.arange(B)[:, None], idx[..., 0]]
    got = np.asarray(jax.jit(gather_bitplane, backend="cpu")(
        onehot_i8, jnp.asarray(planes)))
    assert np.array_equal(np.asarray(want, np.float32), got), "NOT exact"
    print("exactness: bit-plane gather == selected bf16 rows (bit-equal)",
          flush=True)

    cases = {
        "gather bf16@bf16->f32 (baseline)": (
            gather_bf16, (onehot_bf, y1_bf)),
        "gather int8 bit-plane, planes precomputed": (
            gather_bitplane, (onehot_i8, jnp.asarray(planes))),
        "gather int8 bit-plane e2e (split+dot+recombine, exact)": (
            gather_bitplane_e2e, (onehot_i8, y1_bf)),
    }
    for name, (f, fargs) in cases.items():
        t = chain_timed(f, fargs, iters=50)
        macs = B * M * N * C1
        rate = f"{2 * macs / t / 1e12:.1f}" if t > 0 else "n/a"
        print(f"{name}: {t * 1e3:.3f} ms  ({rate} TOP/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
