"""Trace-time FLOP accounting for the Pallas custom calls.

XLA's `compiled.cost_analysis()['flops']` counts Pallas kernels as ZERO —
every benchmark row that uses the fused SA kernels under-reports its real
TFLOP/s (VERDICT r3 item 2: train MFU for the fused paths was unknown; the
5-7 TFLOP/s BENCH_DETAILS numbers were nonsense). The kernels' shapes are
static, so their dot FLOPs have closed forms; this module provides a
recorder that the fused apply functions feed AT TRACE TIME:

    with record_pallas_flops() as rec:
        lowered = jax.jit(step).lower(state, batch)
    true_flops = lowered.compile().cost_analysis()["flops"] + rec["flops"]

Counting convention: matmul dots only (2 * MACs), matching how XLA's cost
analysis is dominated by dots at these shapes; VPU elementwise/compare work
(distance matrices, ReLU, BN folds, max-pool) is excluded on both sides of
the sum, so fused and unfused rows stay comparable. A kernel traced inside
`lax.scan` records ONCE per trace — the caller multiplies by the trip count.
Users: scripts/bench_train_scaling.py and benchmarks/run_all.py (train
rows). bench.py does NOT use this: its MFU row is the unfused M2 tracker
(XLA cost analysis is complete there) and the fused BAT/P2B rows report
frames/s only.

Only the Pallas implementations record: the interpret/'ref' golden paths are
plain jnp, which XLA already counts.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Iterator

_REC: contextvars.ContextVar = contextvars.ContextVar(
    "pallas_flop_recorder", default=None)


@contextlib.contextmanager
def record_pallas_flops() -> Iterator[dict]:
    """Collect closed-form FLOP counts of Pallas calls traced in scope."""
    rec = {"flops": 0.0, "calls": 0}
    token = _REC.set(rec)
    try:
        yield rec
    finally:
        _REC.reset(token)


def lower_recording(jitted, *args, **kwargs):
    """Lower `jitted` with Pallas-FLOP recording GUARANTEED to fire.

    `jit.lower()` reuses the jit trace cache: after ANY prior call with the
    same arg shapes (including being traced inside another jit, e.g. a
    timing scan), the Python body — and its trace-time add_pallas_flops
    calls — is skipped, and a surrounding record_pallas_flops() scope
    records zero. That silently turned every round-4 'true TFLOP/s' row
    back into the XLA-only count this module exists to fix (the benchmark
    scripts time first, lower second). clear_cache() forces a fresh trace;
    the executable re-compile behind `.compile()` still hits the persistent
    XLA cache (same HLO).

    Returns (lowered, rec) where rec is the {'flops', 'calls'} dict.
    """
    with record_pallas_flops() as rec:
        try:
            jitted.clear_cache()
        except AttributeError:
            pass
        lowered = jitted.lower(*args, **kwargs)
    return lowered, rec


def add_pallas_flops(flops: float) -> None:
    """Called by the fused apply functions at trace time; no-op unless a
    record_pallas_flops() scope is active."""
    rec = _REC.get()
    if rec is not None:
        rec["flops"] += float(flops)
        rec["calls"] += 1


def sa_eval_flops(B: int, s_pad: int, K: int, N: int,
                  c1: int, c2: int, c3: int, *, fused_bq: bool) -> float:
    """Dot FLOPs of one fused eval-SA layer (ops/sa_fused.py kernels):
    one-hot gather (Ts*K, N) @ (N, C1) per tile, MLP2, MLP3, plus — when
    the ball query is fused — the per-tile triangular cumulative-count
    matmul (Ts, N) @ (N, N)."""
    rows = B * s_pad * K
    fl = 2.0 * rows * (N * c1 + c1 * c2 + c2 * c3)
    if fused_bq:
        fl += 2.0 * B * s_pad * N * N
    return fl


def sa_train_fwd_flops(B: int, S: int, K: int, N: int,
                       c1: int, c2: int, c3: int) -> float:
    """Dot FLOPs of the fused train forward passes F1-F4
    (ops/sa_fused_train.py): F1 gathers y1 once (N*C1); F2 computes y2
    (C1*C2); F3 recomputes y2 and computes y3 (C1*C2 + C2*C3); F4
    recomputes y3 (C2*C3)."""
    rows = B * S * K
    return 2.0 * rows * (N * c1 + 2 * c1 * c2 + 2 * c2 * c3)


def sa_train_bwd_flops(B: int, S: int, K: int, N: int,
                       c1: int, c2: int, c3: int) -> float:
    """Dot FLOPs of the fused train backward passes B1-B4: B1 recomputes y3;
    B2 recomputes y3 + dw3 + dh2 + recomputes y2; B3 recomputes y2 + dw2 +
    dh1; B4 scatter-adds dA as onehot^T @ dy1 (N*C1)."""
    rows = B * S * K
    return 2.0 * rows * (N * c1 + 4 * c1 * c2 + 4 * c2 * c3)
