"""Golden tests for the fused training-mode SA (ops/sa_fused_train.py).

The 'ref' impl pins the pass-decomposed math (batch-stats -> fold ->
eval-style forward; manual BN-training VJP) against flax autodiff of the
plain unfused grid MLP; the 'pallas' impl is then tested against 'ref' in
interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.ops import ball_query, group_points
from open3dsot_tpu.ops.sa_fused_train import fused_sa_train_apply


def _setup(B=2, N=64, S=16, K=8, C=12, mlp=(16, 16, 24), radius=0.8,
           seed=0, normalize_xyz=False):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    new_xyz = xyz[:, :S]
    idx = ball_query(radius, K, xyz, new_xyz)

    mod = MLP(list(mlp))
    grouped0 = jnp.zeros((B, S, K, 3 + C), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), grouped0, train=True)
    # randomize params so BN scale/bias and dense biases matter
    params = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.3,
        variables["params"],
    )
    stats0 = variables["batch_stats"]
    return xyz, feats, new_xyz, idx, mod, params, stats0, radius, normalize_xyz


def _unfused(mod, params, stats0, xyz, feats, new_xyz, idx, radius,
             normalize_xyz):
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    grouped = jnp.concatenate([grouped_xyz, group_points(feats, idx)], axis=-1)
    out, updates = mod.apply(
        {"params": params, "batch_stats": stats0}, grouped, train=True,
        mutable=["batch_stats"],
    )
    return jnp.max(out, axis=2), updates["batch_stats"]


@pytest.mark.parametrize("impl", ["ref", "pallas"])
@pytest.mark.parametrize("normalize_xyz", [False, True])
def test_fwd_matches_unfused_train(impl, normalize_xyz):
    (xyz, feats, new_xyz, idx, mod, params, stats0, radius,
     _) = _setup(normalize_xyz=normalize_xyz)
    ref_out, _ = _unfused(mod, params, stats0, xyz, feats, new_xyz, idx,
                          radius, normalize_xyz)
    out, _ = fused_sa_train_apply(
        xyz, feats, new_xyz, idx, params, radius=radius,
        normalize_xyz=normalize_xyz, use_xyz=True, impl=impl,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_batch_stats_match_unfused(impl):
    (xyz, feats, new_xyz, idx, mod, params, stats0, radius,
     normalize_xyz) = _setup()
    _, new_stats = _unfused(mod, params, stats0, xyz, feats, new_xyz, idx,
                            radius, normalize_xyz)
    _, stats = fused_sa_train_apply(
        xyz, feats, new_xyz, idx, params, radius=radius,
        normalize_xyz=normalize_xyz, use_xyz=True, impl=impl,
    )
    # flax: ra_new = 0.9 * ra_old + 0.1 * batch_stat, ra_old = init (0 / 1)
    for i in range(3):
        bn = new_stats[f"layer{i}"]["bn"]
        mu_ref = (bn["mean"] - 0.9 * stats0[f"layer{i}"]["bn"]["mean"]) / 0.1
        v_ref = (bn["var"] - 0.9 * stats0[f"layer{i}"]["bn"]["var"]) / 0.1
        mu, v = stats[f"layer{i}"]
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_grads_match_unfused_autodiff(impl):
    (xyz, feats, new_xyz, idx, mod, params, stats0, radius,
     normalize_xyz) = _setup()
    rng = np.random.default_rng(7)
    S, C3 = 16, 24
    gvec = jnp.asarray(rng.standard_normal((2, S, C3)), jnp.float32)

    def loss_ref(params, xyz, feats, new_xyz):
        out, _ = _unfused(mod, params, stats0, xyz, feats, new_xyz, idx,
                          radius, normalize_xyz)
        return jnp.sum(out * gvec)

    def loss_fused(params, xyz, feats, new_xyz):
        out, _ = fused_sa_train_apply(
            xyz, feats, new_xyz, idx, params, radius=radius,
            normalize_xyz=normalize_xyz, use_xyz=True, impl=impl,
        )
        return jnp.sum(out * gvec)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, xyz, feats,
                                                     new_xyz)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(params, xyz, feats,
                                                       new_xyz)
    names = ["params", "xyz", "feats", "new_xyz"]
    for name, a, b in zip(names, g_ref, g_fus):
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves(b)
        for (path, x), y in zip(la, lb):
            scale = max(1.0, float(jnp.max(jnp.abs(x))))
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=5e-4,
                atol=5e-5 * scale,
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


def test_pallas_bf16_close_to_unfused_bf16():
    """bf16 kernel branches (bf16 grid storage with recompute consistency,
    the f32-compare workaround, the wider tile cap) in CPU interpret mode:
    forward and gradients must track the UNFUSED flax path run at the same
    bf16 compute dtype (an f32 comparison would conflate bf16 relu/max
    branch flips with kernel bugs)."""
    (xyz, feats, new_xyz, idx, _, params, stats0, radius,
     normalize_xyz) = _setup()
    rng = np.random.default_rng(11)
    gvec = jnp.asarray(rng.standard_normal((2, 16, 24)), jnp.float32)
    mod16 = MLP([16, 16, 24], dtype=jnp.bfloat16)

    def loss_unfused(params):
        out, _ = _unfused(mod16, params, stats0, xyz, feats, new_xyz, idx,
                          radius, normalize_xyz)
        return jnp.sum(out.astype(jnp.float32) * gvec)

    def loss_fused(params):
        out, _ = fused_sa_train_apply(
            xyz, feats, new_xyz, idx, params, radius=radius,
            normalize_xyz=normalize_xyz, use_xyz=True, impl="pallas",
            dtype=jnp.bfloat16,
        )
        return jnp.sum(out.astype(jnp.float32) * gvec)

    vu, gu = jax.value_and_grad(loss_unfused)(params)
    vf, gf = jax.value_and_grad(loss_fused)(params)
    assert np.isfinite(float(vf))
    np.testing.assert_allclose(float(vf), float(vu), rtol=0.05)
    for (pa, x), y in zip(
        jax.tree_util.tree_leaves_with_path(gu),
        jax.tree_util.tree_leaves(gf),
    ):
        key = jax.tree_util.keystr(pa)
        if "'dense'" in key and "'bias'" in key:
            # analytically zero (bias feeding a BatchNorm) — in bf16 both
            # paths produce uncorrelated rounding noise around 0
            continue
        scale = max(1.0, float(jnp.max(jnp.abs(x))))
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(x, np.float32), rtol=0.15,
            atol=0.08 * scale, err_msg=key)


def test_set_abstraction_fused_train_parity():
    """Full module-level parity: SetAbstraction(fused_train=True) matches
    the unfused path in forward, parameter gradients, AND the mutable
    batch_stats update (through the crafted-2-sample BN feed)."""
    from open3dsot_tpu.models.pointnet import SetAbstraction

    rng = np.random.default_rng(3)
    B, N, S, K, C = 2, 64, 16, 8, 12
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    kw = dict(mlp=[16, 16, 24], radius=0.8, nsample=K, use_fps=False,
              normalize_xyz=True)
    sa_plain = SetAbstraction(**kw)
    sa_fused = SetAbstraction(fused_train=True, **kw)
    variables = sa_plain.init(jax.random.PRNGKey(0), xyz, feats, S,
                              train=True)
    params = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.2,
        variables["params"],
    )
    stats0 = variables["batch_stats"]
    gvec = jnp.asarray(rng.standard_normal((B, S, 24)), jnp.float32)

    def run(sa, params):
        (new_xyz, out, idxs), upd = sa.apply(
            {"params": params, "batch_stats": stats0}, xyz, feats, S,
            train=True, mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    out_p, bs_p = run(sa_plain, params)
    out_f, bs_f = run(sa_fused, params)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)
    for (pa, x), y in zip(
        jax.tree_util.tree_leaves_with_path(bs_p),
        jax.tree_util.tree_leaves(bs_f),
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa))

    g_p = jax.grad(lambda p: jnp.sum(run(sa_plain, p)[0] * gvec))(params)
    g_f = jax.grad(lambda p: jnp.sum(run(sa_fused, p)[0] * gvec))(params)
    for (pa, x), y in zip(
        jax.tree_util.tree_leaves_with_path(g_p),
        jax.tree_util.tree_leaves(g_f),
    ):
        scale = max(1.0, float(jnp.max(jnp.abs(x))))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=5e-4, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(pa))


def test_set_abstraction_fused_train_no_features_falls_back():
    # featureless layers (SA layer 1 of the backbone) keep the unfused path
    from open3dsot_tpu.models.pointnet import SetAbstraction

    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    sa = SetAbstraction(mlp=[8, 8, 16], radius=0.8, nsample=4, use_fps=False,
                        fused_train=True)
    variables = sa.init(jax.random.PRNGKey(0), xyz, None, 8, train=True)
    (_, out, _), _ = sa.apply(variables, xyz, None, 8, train=True,
                              mutable=["batch_stats"])
    assert out.shape == (2, 8, 16)


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_dense_bias_grads_are_zero(impl):
    # a Dense bias feeding a BatchNorm has exactly zero gradient
    # (sum(y_hat) == 0); the fused VJP returns analytic zeros for layers 2-3
    (xyz, feats, new_xyz, idx, mod, params, stats0, radius,
     normalize_xyz) = _setup()

    def loss_fused(params):
        out, _ = fused_sa_train_apply(
            xyz, feats, new_xyz, idx, params, radius=radius,
            normalize_xyz=normalize_xyz, use_xyz=True, impl=impl,
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss_fused)(params)
    assert float(jnp.max(jnp.abs(g["layer1"]["dense"]["bias"]))) == 0.0
    assert float(jnp.max(jnp.abs(g["layer2"]["dense"]["bias"]))) == 0.0
    # layer-1 bias flows through ct: analytically 0 too, but computed by
    # autodiff of the A-form einsums — only approximately zero
    assert float(jnp.max(jnp.abs(g["layer0"]["dense"]["bias"]))) < 1e-3


def test_fused_train_gspmd_sharded_matches_unsharded():
    """Training kernels under GSPMD: batch-sharded jit must reproduce the
    single-device forward, batch statistics and gradients — the pass
    kernels emit per-batch-element partial sums whose jnp-level reduction
    the partitioner lowers to an allreduce, keeping the batch statistics
    EXACTLY the global-batch ones (not per-shard DDP stats)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from open3dsot_tpu.ops import ball_query
    from open3dsot_tpu.ops.sa_fused_train import fused_sa_train_apply

    rng = np.random.default_rng(3)
    B, N, S, K, C = 8, 64, 32, 8, 16
    xyz, feats, new_xyz, _, _, params, _, _, _ = _setup(
        B=B, N=N, S=S, K=K, C=C, mlp=(16, 16, 32), radius=0.8, seed=3)

    def loss(params, xyz, feats, new_xyz):
        idx = ball_query(0.8, K, xyz, new_xyz)
        out, stats = fused_sa_train_apply(
            xyz, feats, new_xyz, idx, params,
            radius=0.8, normalize_xyz=True, use_xyz=True)
        return jnp.sum(out * out) * 1e-2, stats

    gfn = jax.value_and_grad(loss, has_aux=True)
    (ref_l, ref_stats), ref_g = jax.jit(gfn)(params, xyz, feats, new_xyz)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jf = jax.jit(gfn, in_shardings=(repl, sh, sh, sh),
                 out_shardings=((repl, repl), repl))
    (sl, s_stats), s_g = jf(
        jax.device_put(params, repl),
        *[jax.device_put(x, sh) for x in (xyz, feats, new_xyz)])

    assert abs(float(sl) - float(ref_l)) < 1e-3 * abs(float(ref_l))
    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(s_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(s_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_int8_gather_f1_bit_equals_bf16_truncated_a():
    """The train F1 int8 bit-plane gather (_SACfg.i8g) must produce the
    BIT-IDENTICAL y1 grid to the i8g=False pipeline fed a bf16-truncated
    `a`: the gather selects bf16(a) rows either way (the exactness
    argument — see sa_fused.py::bf16_byte_planes). Downstream (stats,
    folds, MLP passes, custom-VJP grads incl. the B4 scatter, which never
    touches `a`) consumes only that identical y1, so outputs/stats/grads
    must agree to XLA reassociation noise (the two programs' f32 stat
    reductions fuse differently; measured ~3e-5 abs on these scales).
    Compared at the _core/_pallas_fwd level in interpret mode, where the
    i8g=False dots are exact f32 and the only difference left is the
    truncation itself."""
    from open3dsot_tpu.ops import sa_fused_train as ft

    B, N, S, K = 2, 64, 16, 8
    c1, c2, c3 = 8, 8, 16
    rng = np.random.default_rng(11)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 3, jnp.float32)

    a, ct = arr(B, N, c1), arr(B, S, c1)
    w2, b2, w3, b3 = arr(c1, c2), arr(c2), arr(c2, c3), arr(c3)
    g1, bt1 = arr(c1) * 0.1 + 1.0, arr(c1) * 0.1
    g2, bt2 = arr(c2) * 0.1 + 1.0, arr(c2) * 0.1
    g3, bt3 = arr(c3) * 0.1 + 1.0, arr(c3) * 0.1
    idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
    cot = arr(B, S, c3)

    def run(i8g, a_in):
        cfg = ft._SACfg(B=B, N=N, S=S, K=K, C1=c1, C2=c2, C3=c3,
                        cdt="float32", interpret=True, impl="pallas",
                        i8g=i8g)

        def loss(a_in, ct, w2, b2, w3, b3):
            out, stats = ft._core(cfg, a_in, ct, w2, b2, w3, b3,
                                  g1, bt1, g2, bt2, g3, bt3, idx)
            return jnp.sum(out * cot), (out, stats)

        (_, aux), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 4), has_aux=True)(a_in, ct, w2, b2,
                                                      w3, b3)
        return aux, grads

    a_tr = a.astype(jnp.bfloat16).astype(jnp.float32)

    # the hard contract: bit-identical y1 grids out of F1
    def cfg_of(i8g):
        return ft._SACfg(B=B, N=N, S=S, K=K, C1=c1, C2=c2, C3=c3,
                         cdt="float32", interpret=True, impl="pallas",
                         i8g=i8g)

    args = (ct, w2, b2, w3, b3, g1, bt1, g2, bt2, g3, bt3, idx)
    _, _, grids8 = ft._pallas_fwd(cfg_of(True), a, *args)
    _, _, gridsf = ft._pallas_fwd(cfg_of(False), a_tr, *args)
    np.testing.assert_array_equal(np.asarray(grids8[0]),
                                  np.asarray(gridsf[0]))

    (out8, st8), g8 = run(True, a)
    (outf, stf), gf = run(False, a_tr)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(outf),
                               rtol=1e-5, atol=2e-4)
    for x, y in zip(jax.tree_util.tree_leaves((st8, g8)),
                    jax.tree_util.tree_leaves((stf, gf))):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=2e-4)
