"""Device check of the numerics claim behind defaulting int8_gather ON for
f32 training (ops/sa_fused_train.py::_SACfg.i8g): a DEFAULT-precision f32
one-hot dot on TPU runs ONE bf16 MXU pass, so its gather result is already
the bf16-truncated rows — exactly what the int8 bit-plane gather produces.
If this probe ever fails (an XLA version where f32 DEFAULT is multi-pass),
the i8g default must become bf16-compute-only. Run on the real TPU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from open3dsot_tpu.ops.sa_fused import _dot, _gather_rows, bf16_byte_planes

    rng = np.random.default_rng(0)
    N, C1, M = 1024, 64, 2048
    a = jnp.asarray(rng.standard_normal((N, C1)) * 50, jnp.float32)
    idx = rng.integers(0, N, (M,))
    onehot = jnp.asarray(idx[:, None] == np.arange(N)[None, :])

    f32_default = jax.jit(
        lambda o, a: _dot(o.astype(jnp.float32), a, None))(onehot, a)
    bitplane = jax.jit(
        lambda o, p: _gather_rows(o, p, jnp.bfloat16, C1, True))(
            onehot, bf16_byte_planes(a))
    truncated = np.asarray(a.astype(jnp.bfloat16).astype(jnp.float32))[idx]

    d_bp = np.abs(np.asarray(bitplane) - truncated).max()
    d_f32 = np.abs(np.asarray(f32_default) - truncated).max()
    print(f"bit-plane vs bf16-truncated rows: max|d| = {d_bp}")
    print(f"f32 DEFAULT dot vs bf16-truncated rows: max|d| = {d_f32}")
    same = np.array_equal(np.asarray(f32_default), np.asarray(bitplane))
    print(f"f32-DEFAULT gather == bit-plane gather bit-for-bit: {same}")
    assert d_bp == 0.0
    if not same:
        print("WARNING: f32 DEFAULT dot is NOT a single bf16 pass on this "
              "backend — int8_gather changes f32-train numerics here and "
              "the default should be narrowed to bf16 compute.")
        sys.exit(1)


if __name__ == "__main__":
    main()
