"""int16 fixed-point transfer packing for the scan eval paths
(config.transfer_quant: utils/quant.py per-sample codec + in-jit dequant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_tracker import M2ScanTracker
from open3dsot_tpu.utils.quant import dequantize, quantize_per_sample

from tests.test_scan_tracker import m2_cfg


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(4, 6, 128, 3)) * 20).astype(np.float32)
    valid = np.ones((4, 6, 128), bool)
    q, scale, off = quantize_per_sample(pts, valid)
    assert q.dtype == np.int16 and scale.shape == (4,) and off.shape == (4, 3)
    deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                jnp.asarray(off)))
    # half a quantization step plus f32 division rounding near .5 boundaries
    for b in range(4):
        assert np.abs(deq[b] - pts[b]).max() <= scale[b] * 0.501
        # worst-case step at the documented bound: per-sample extent/32766
        assert scale[b] <= np.abs(pts[b] - off[b]).max() / 32766.0 * 1.0001


def test_quantize_degenerate_constant_cloud():
    pts = np.full((1, 2, 8, 3), 3.25, np.float32)
    valid = np.ones((1, 2, 8), bool)
    q, scale, off = quantize_per_sample(pts, valid)
    deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                jnp.asarray(off)))
    assert np.allclose(deq, pts, atol=1e-5)


def test_quantize_range_ignores_pad_zeros():
    """Zero-pad rows must not anchor the range to the origin: a cloud at
    ~500 m (global-frame nuScenes/Waymo) keeps its <=2mm-of-own-extent step."""
    rng = np.random.default_rng(1)
    pts = np.zeros((1, 2, 256, 3), np.float32)
    valid = np.zeros((1, 2, 256), bool)
    real = (rng.normal(size=(1, 2, 64, 3)) * 20 + 500).astype(np.float32)
    pts[:, :, :64] = real
    valid[:, :, :64] = True
    q, scale, off = quantize_per_sample(pts, valid)
    # step bounded by the REAL extent (~40-120 m), not the 500 m offset
    assert scale[0] <= np.abs(real - off[0]).max() / 32766.0 * 1.0001
    deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                jnp.asarray(off)))
    assert np.abs(deq[:, :, :64] - real).max() <= scale[0] * 0.501


def test_quantize_per_sample_ranges_are_independent():
    """Two tracklets far apart in the world frame each keep their OWN tight
    range — a per-dispatch range would inflate both steps to ~the
    inter-tracklet distance / 32766."""
    rng = np.random.default_rng(2)
    pts = np.zeros((2, 1, 64, 3), np.float32)
    valid = np.ones((2, 1, 64), bool)
    pts[0] = rng.normal(size=(1, 64, 3)) * 10           # near origin
    pts[1] = rng.normal(size=(1, 64, 3)) * 10 + 9000    # 9 km away
    q, scale, off = quantize_per_sample(pts, valid)
    per_dispatch_scale = 9000.0 / 2 / 32766.0
    assert scale.max() < per_dispatch_scale / 50
    deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                jnp.asarray(off)))
    assert np.abs(deq - pts).max() <= scale.max() * 0.501


class TestQuantTracker:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = m2_cfg()
        model = get_model("m2track")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        return cfg, model, variables, sampler

    def test_quant_dispatch_equals_host_dequant_through_f32_path(self, setup):
        """The int16 path must equal the f32 path fed the SAME dequantized
        points — the only difference is WHERE the decode runs (both IEEE
        f32), so boxes match exactly."""
        cfg, model, variables, sampler = setup
        tr_q = M2ScanTracker(model, variables, cfg, max_points=256,
                             transfer_dtype="int16")
        tr_f = M2ScanTracker(model, variables, cfg, max_points=256)
        seqs = [sampler[0], sampler[1]]
        _, _, _, pts, valid, wlh, init = tr_f._prepare(seqs)
        q, scale, off = quantize_per_sample(pts, valid)
        deq = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(scale),
                                    jnp.asarray(off)))
        from open3dsot_tpu.tracking.scan_tracker import _counts

        boxes_q = np.asarray(tr_q._dispatch_track(pts, valid, wlh, init))
        boxes_f = np.asarray(
            tr_f._track(variables, jnp.asarray(deq),
                        jnp.asarray(_counts(valid)),
                        jnp.asarray(wlh), jnp.asarray(init))
        )
        assert np.array_equal(boxes_q, boxes_f)

    def test_quant_eval_close_to_exact(self, setup):
        """<=2mm point quantization should leave the synthetic-set metrics
        within ordinary drift of the exact-transfer run."""
        from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan

        cfg, model, variables, sampler = setup
        tr_q = M2ScanTracker(model, variables, cfg, max_points=256,
                             transfer_dtype="int16")
        tr_f = M2ScanTracker(model, variables, cfg, max_points=256)
        s_q, p_q = evaluate_dataset_scan(model, variables, sampler, cfg,
                                         tracker=tr_q, max_tracklets=2)
        s_f, p_f = evaluate_dataset_scan(model, variables, sampler, cfg,
                                         tracker=tr_f, max_tracklets=2)
        assert s_q == pytest.approx(s_f, abs=3.0)
        assert p_q == pytest.approx(p_f, abs=3.0)


class TestQuantTrackerOnMesh:
    """mesh= + transfer_dtype='int16' together: the per-sample scale (B,) /
    off (B, 3) are batch-leading, so the shard_map specs must SHARD them with
    q — replicating them (the round-3 regression this pins) made dequantize's
    per-sample reshape fail at trace time on any mesh with >1 device."""

    def test_m2_mesh_int16_matches_unsharded(self):
        from open3dsot_tpu.parallel import make_mesh

        cfg = m2_cfg()
        model = get_model("m2track")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[0], sampler[1]]
        plain = M2ScanTracker(model, variables, cfg, max_points=256,
                              transfer_dtype="int16")
        sharded = M2ScanTracker(model, variables, cfg, max_points=256,
                                transfer_dtype="int16", mesh=make_mesh(8))
        a = plain.track_batch(seqs)
        b = sharded.track_batch(seqs)
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-4)

    def test_matching_mesh_int16_matches_unsharded(self):
        from open3dsot_tpu.parallel import make_mesh
        from open3dsot_tpu.tracking.scan_matching import MatchScanTracker
        from tests.test_scan_matching import cfg_for

        cfg = cfg_for("p2b")
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[0], sampler[1]]
        kw = dict(max_points=256, first_crop_points=128,
                  transfer_dtype="int16")
        plain = MatchScanTracker(model, variables, cfg, **kw)
        sharded = MatchScanTracker(model, variables, cfg, mesh=make_mesh(8),
                                   **kw)
        a = plain.track_batch(seqs)
        b = sharded.track_batch(seqs)
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-4)


def test_trainer_val_cache_resets_on_new_sampler():
    """A second validation with a DIFFERENT sampler must not reuse the
    first sampler's cached padded data."""
    from open3dsot_tpu.train.trainer import Trainer, init_variables

    cfg = m2_cfg()
    cfg.val_tracker = "scan"
    model = get_model("m2track")(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sampler_a = get_dataset(cfg, "test", "test")
    cfg_b = m2_cfg()
    cfg_b.seed = 123  # different synthetic data
    sampler_b = get_dataset(cfg_b, "test", "test")

    tr = Trainer(model, cfg, work_dir=None)
    s_a, p_a = tr._validate(variables, sampler_a)
    cache_a = tr._val_prep_cache
    s_b, p_b = tr._validate(variables, sampler_b)
    assert tr._val_prep_cache is not cache_a, "cache must reset per sampler"
    # and the b metrics must equal a fresh, cache-free evaluation of b
    from open3dsot_tpu.tracking.scan_tracker import evaluate_dataset_scan

    s_ref, p_ref = evaluate_dataset_scan(model, variables, sampler_b, cfg)
    assert s_b == pytest.approx(s_ref)
    assert p_b == pytest.approx(p_ref)


def test_native_quantizer_bit_exact_vs_numpy():
    """The C++ single-pass encoder (native/geomlib.cpp::quantize_per_sample)
    must be BIT-exact vs the numpy semantic reference — same f32 arithmetic,
    same round-half-to-even — over padded rows, all-invalid samples, odd
    trailing shapes, and half-ulp rounding points."""
    import numpy as np

    from open3dsot_tpu.native import available, quantize_per_sample_native
    from open3dsot_tpu.utils.quant import _quantize_per_sample_numpy

    if not available():
        pytest.skip("native lib not built (no toolchain)")
    rng = np.random.default_rng(42)
    for shape in [(16, 1024, 3), (8, 32, 256, 3), (4, 7, 3), (1, 1, 3)]:
        pts = (rng.standard_normal(shape) * 37.5).astype(np.float32)
        valid = rng.random(shape[:-1]) > 0.3
        valid[0] = False  # all-invalid sample branch
        got = quantize_per_sample_native(pts, valid)
        want = _quantize_per_sample_numpy(pts, valid)
        for g, w in zip(got, want):
            assert g.dtype == w.dtype and np.array_equal(g, w)
    # half-integer quantization points exercise the rounding mode
    pts = np.array([[[0.0, 0.5, 1.5], [2.5, -0.5, -1.5]]], np.float32)
    pts = pts * 1e-6  # scale floor makes steps land exactly on .5
    valid = np.ones((1, 2), bool)
    got = quantize_per_sample_native(pts, valid)
    want = _quantize_per_sample_numpy(pts, valid)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
