"""shard_map data-parallel train step (trainer.make_train_step dp_shard_map).

The GSPMD path (jit + shardings) cannot partition the fused Pallas SA
kernels (no GSPMD rule for tpu_custom_call); the shard_map path runs the
whole step body per device, so the fused kernels work on a multi-chip mesh.
Verified here on the 8-virtual-device CPU mesh.

The exact-parity trick: tile ONE shard's data identically across all 8
shards — then per-device BatchNorm batch statistics equal the global-batch
statistics, and the shard_map step (DDP semantics) must match the
single-device step on one shard bit-for-tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.config import make_config
from open3dsot_tpu.models import get_model
from open3dsot_tpu.parallel import make_mesh
from open3dsot_tpu.train.optim import make_optimizer
from open3dsot_tpu.train.trainer import create_train_state, make_train_step


def _bat_cfg(**over):
    d = dict(
        dataset="synthetic", net_model="bat", category_name="Car",
        template_size=64, search_size=128, point_sample_size=64,
        feature_channel=32, hidden_channel=32, out_channel=32,
        vote_channel=32, num_proposal=16, k=4, bc_channel=9, box_aware=True,
        use_fps=True, normalize_xyz=False, degrees=True, use_z=False,
        limit_box=False, IoU_space=3, bb_scale=1.0, bb_offset=2,
        objectiveness_weight=1.5, box_weight=0.2, seg_weight=0.2,
        vote_weight=1.0, bc_weight=1.0, lr=0.01, optimizer="Adam",
        lr_decay_step=12, lr_decay_rate=0.2, wd=0.0, gradient_clip_val=0.0,
        batch_size=16, seed=0, fused_sa=False, fused_sa_train=False,
    )
    d.update(over)
    return make_config(d)


def _one_shard_batch(model, b, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(size=x.shape).astype(x.dtype)
            if np.issubdtype(x.dtype, np.floating) else x),
        model.dummy_batch(b),
    )


def _tile(batch, n):
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * n, axis=0), batch)


def _assert_state_close(a, b, rtol=2e-4, atol=2e-5):
    for (pa, x), y in zip(
        jax.tree_util.tree_leaves_with_path((a.params, a.batch_stats)),
        jax.tree_util.tree_leaves((b.params, b.batch_stats)),
    ):
        scale = max(1.0, float(jnp.max(jnp.abs(x))))
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(x, np.float32),
            rtol=rtol, atol=atol * scale,
            err_msg=jax.tree_util.keystr(pa))


def test_shard_map_fused_matches_single_device_fused():
    """8-device shard_map step with the FUSED training kernels (interpret)
    == the single-device step with the same kernels, when all shards carry
    identical data (per-device BN stats == global stats). Fused-vs-unfused
    equivalence itself is covered by tests/test_sa_fused_train.py."""
    assert len(jax.devices()) >= 8
    cfg = _bat_cfg(fused_sa_train=True)
    model = get_model("bat")(cfg)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)

    shard = _one_shard_batch(model, b=2)
    step1 = make_train_step(model, opt, mesh=None, donate=False)
    s1, ld1 = step1(state, shard)

    mesh = make_mesh(8)
    step8 = make_train_step(model, opt, mesh=mesh, donate=False,
                            dp_shard_map=True)
    s8, ld8 = step8(state, _tile(shard, 8))

    np.testing.assert_allclose(float(ld8["loss_total"]),
                               float(ld1["loss_total"]), rtol=2e-4)
    _assert_state_close(s1, s8)


def test_shard_map_distinct_shards_replicated_state():
    """With genuinely different per-device data the step still runs and the
    resulting state is fully replicated (fetchable as one coherent array)."""
    assert len(jax.devices()) >= 8
    cfg = _bat_cfg()
    model = get_model("bat")(cfg)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    mesh = make_mesh(8)
    step = make_train_step(model, opt, mesh=mesh, donate=False,
                           dp_shard_map=True)
    batch = _one_shard_batch(model, b=16, seed=3)
    new_state, ld = step(state, batch)
    assert np.isfinite(float(ld["loss_total"]))
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    assert int(new_state.step) == 1
