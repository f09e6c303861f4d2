"""Measure fused vs unfused BAT/P2B eval forward on the real TPU.

Usage: python scripts/bench_fused_sa.py [--batch 4] [--bf16]
"""
from __future__ import annotations
import argparse, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from benchmarks.profile_bat import chain_timed, flops_of

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    a = ap.parse_args()
    from open3dsot_tpu.config import load_config
    from open3dsot_tpu.models.bat import BATModel

    cfg = load_config("cfgs/BAT_Car.yaml", {"bf16": a.bf16})
    rng = np.random.default_rng(0)
    B, M, N = a.batch, cfg.template_size, cfg.search_size
    tmpl = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
    srch = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    bc = jnp.abs(jnp.asarray(rng.standard_normal((B, M, 9)), jnp.float32))

    cfg_f = cfg.copy(); cfg_f.fused_sa = True
    cfg_u = cfg.copy(); cfg_u.fused_sa = False
    m_f, m_u = BATModel(cfg_f), BATModel(cfg_u)
    variables = m_u.init(jax.random.PRNGKey(0), m_u.dummy_batch(2))

    for name, m in [("unfused", m_u), ("fused", m_f)]:
        fn = lambda v, t, s, b, _m=m: _m.net.apply(v, t, s, b, train=False)
        dt = chain_timed(fn, (variables, tmpl, srch, bc), iters=50)
        gf = flops_of(fn, variables, tmpl, srch, bc) / 1e9
        print(f"BAT eval fwd {name:8s} B={B} bf16={a.bf16}: "
              f"{dt*1e3:7.3f} ms  ({gf:.1f} GFLOP, {gf/1e3/dt:.1f} TFLOP/s)")

    # numeric proximity of the two TPU paths (both run default bf16-level
    # MXU precision with different association; exact-agreement golden
    # tests run on CPU in tests/test_sa_fused.py where f32 dots are exact —
    # there the fused path sits marginally CLOSER to f32 truth)
    of = m_f.net.apply(variables, tmpl, srch, bc, train=False)
    ou = m_u.net.apply(variables, tmpl, srch, bc, train=False)
    for k in ("estimation_boxes", "estimation_cla"):
        a = np.asarray(of[k], np.float32)
        b = np.asarray(ou[k], np.float32)
        print(f"  fused-vs-unfused {k}: mean|d| {np.mean(np.abs(a - b)):.4g}, "
              f"max|d| {np.max(np.abs(a - b)):.4g}")

if __name__ == "__main__":
    main()
