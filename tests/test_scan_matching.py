"""Matching-model (P2B/BAT) on-device scan tracker."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.data import get_dataset
from open3dsot_tpu.models import get_model
from open3dsot_tpu.tracking.scan_matching import MatchScanTracker


def cfg_for(net, **over):
    base = dict(
        dataset="synthetic",
        net_model=net,
        category_name="Car",
        search_bb_scale=1.25,
        search_bb_offset=2,
        model_bb_scale=1.25,
        model_bb_offset=0,
        template_size=64,
        search_size=128,
        degrees=True,
        up_axis=[0, 0, 1],
        data_limit_box=False,
        train_type="train_siamese",
        num_candidates=1,
        box_aware=(net == "bat"),
        use_fps=(net == "bat"),
        normalize_xyz=False,
        feature_channel=32,
        hidden_channel=32,
        out_channel=32,
        vote_channel=32,
        num_proposal=16,
        k=4,
        bc_channel=9,
        reference_BB="previous_result",
        shape_aggregation="firstandprevious",
        use_z=True,
        limit_box=False,
        IoU_space=3,
        syn_num_tracklets=2,
        syn_tracklet_len=4,
        seed=0,
    )
    base.update(over)
    return make_config(base)


@pytest.mark.parametrize("net", ["p2b", "bat"])
class TestMatchScanTracker:
    def test_runs_and_scores(self, net):
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        ious, distances, boxes = tracker.evaluate_one_sequence(sampler[0], cfg)
        assert len(ious) == len(sampler[0])
        assert all(0.0 <= v <= 1.0 for v in ious)
        assert len(boxes) == len(sampler[0])

    def test_batched_matches_single(self, net):
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        seqs = [sampler[0], sampler[1]]
        batched = tracker.track_batch(seqs)
        singles = [tracker.track_batch([s])[0] for s in seqs]
        for b, s in zip(batched, singles):
            assert np.allclose(b, s, atol=1e-4)

    def test_dispatch_scored_matches_host_score(self, net):
        """On-device trajectory scoring must reproduce the host _score of
        the same boxes per frame."""
        cfg = cfg_for(net)
        model = get_model(net)(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        seqs = [sampler[0], sampler[1]]
        iou_d, dist_d = (np.asarray(x) for x in tracker.dispatch_scored(seqs))
        for b, (ious, dists, _) in enumerate(
            tracker.evaluate_sequences(seqs, cfg)
        ):
            T = len(seqs[b])
            assert np.allclose(iou_d[b, :T], ious, atol=2e-4)
            assert np.allclose(dist_d[b, :T], dists, atol=2e-4)


class TestLimitBox:
    def test_limit_box_config_runs(self):
        """limit_box configs (all P2B + BAT nuScenes/Waymo/Pedestrian) now
        track on device via the deterministic re-draw emulation."""
        cfg = cfg_for("p2b", limit_box=True)
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        ious, distances, boxes = tracker.evaluate_one_sequence(sampler[0], cfg)
        assert len(ious) == len(sampler[0])
        assert all(np.isfinite(v) for v in distances)

    def test_limit_box_offset_semantics(self):
        """Emulation preserves the reference's quirks
        (points_utils.py:70-76): only POSITIVE overshoot triggers, the y
        bound is min(l, 2), z only with use_z (and is exactly 0 there)."""
        from open3dsot_tpu.geometry import rigid

        wlh = jnp.asarray([[1.5, 3.0, 1.4]], np.float32)  # (w, l, h)
        off = lambda dx, dy, dz, th: jnp.asarray([[dx, dy, dz, th]], np.float32)

        out = rigid.limit_box_offset(off(2.0, 0.1, 0.0, 0.3), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.1, 0.0, 0.3]])
        # negative overshoot does NOT trigger (signed comparison quirk)
        out = rigid.limit_box_offset(off(-9.0, -9.0, -9.0, 0.3), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[-9.0, -9.0, -9.0, 0.3]])
        # y bound is min(l, 2) = 2 here
        out = rigid.limit_box_offset(off(0.0, 2.5, 0.0, 0.0), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 0.0, 0.0]])
        # z redraw is exact 0, and only with use_z
        out = rigid.limit_box_offset(off(0.0, 0.0, 2.0, 0.0), wlh, use_z=True)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 0.0, 0.0]])
        out = rigid.limit_box_offset(off(0.0, 0.0, 2.0, 0.0), wlh, use_z=False)
        assert np.allclose(np.asarray(out), [[0.0, 0.0, 2.0, 0.0]])

    def test_limit_box_offset_uniform_redraw(self):
        """redraw= substitutes the provided U(-1,1) values for fired x/y
        components (the reference's np.random.uniform re-draw,
        points_utils.py:71-73); z stays exactly 0 in both modes."""
        from open3dsot_tpu.geometry import rigid

        wlh = jnp.asarray([[1.5, 3.0, 1.4]], np.float32)
        off = jnp.asarray([[2.0, 2.5, 2.0, 0.3]], np.float32)  # all fire
        redraw = jnp.asarray([[0.7, -0.4]], np.float32)
        out = np.asarray(rigid.limit_box_offset(off, wlh, use_z=True,
                                                redraw=redraw))
        assert np.allclose(out, [[0.7, -0.4, 0.0, 0.3]])
        # un-fired components keep the prediction, not the redraw
        off2 = jnp.asarray([[0.5, 2.5, 0.0, 0.1]], np.float32)
        out2 = np.asarray(rigid.limit_box_offset(off2, wlh, use_z=True,
                                                 redraw=redraw))
        assert np.allclose(out2, [[0.5, -0.4, 0.0, 0.1]])

    def test_limit_box_uniform_scan_draws_per_step(self):
        """limit_box_redraw='uniform' (the default): a wild prediction is
        replaced by a real U(-1,1) draw that changes per frame but is
        deterministic across runs; 'zero' reproduces the old deterministic
        substitution. A stub model forces the outlier branch every step."""
        from open3dsot_tpu.tracking.scan_matching import make_match_step

        class _WildModel:
            def apply(self, variables, batch, train=False):
                B = batch["search_points"].shape[0]
                boxes = jnp.zeros((B, 1, 5), jnp.float32)
                boxes = boxes.at[:, 0, 0].set(50.0)  # dx >> wlh[0]
                boxes = boxes.at[:, 0, 1].set(50.0)  # dy >> min(l, 2)
                boxes = boxes.at[:, 0, 4].set(1.0)
                return {"estimation_boxes": boxes}

        B, P = 2, 16
        wlh = jnp.broadcast_to(jnp.asarray([1.5, 3.0, 1.4]), (B, 3))
        fpts = jnp.zeros((B, 8, 3), jnp.float32)
        fval = jnp.ones((B, 8), bool)
        pts = jnp.zeros((B, P, 3), jnp.float32)
        ok = jnp.ones((B, P), bool)
        xs = (pts, ok, pts, ok)

        def run(redraw_mode, ages):
            cfg = cfg_for("p2b", limit_box=True,
                          limit_box_redraw=redraw_mode, degrees=False,
                          use_z=False)
            step = make_match_step(_WildModel(), cfg, None, False,
                                   "firstandprevious", False)
            out = []
            for a in ages:
                carry = (jnp.zeros((B, 4), jnp.float32), wlh)
                if redraw_mode == "uniform":
                    carry = carry + (jnp.full((B,), a, jnp.int32),)
                new_carry, ref = step(None, wlh, fpts, fval, carry, xs)
                if redraw_mode == "uniform":
                    assert int(new_carry[2][0]) == a + 1  # age advances
                out.append(np.asarray(ref))
            return out

        z0, z1 = run("zero", [0, 1])
        assert np.allclose(z0[:, :2], 0.0) and np.allclose(z1[:, :2], 0.0)
        u0, u1 = run("uniform", [0, 1])
        u0b, _ = run("uniform", [0, 1])
        assert np.allclose(u0, u0b)  # deterministic across runs
        assert not np.allclose(u0, u1)  # per-step draws differ
        for u in (u0, u1):
            assert np.all(np.abs(u[:, :2]) < 1.0)  # U(-1,1), not zero
            assert np.any(np.abs(u[:, :2]) > 1e-3)


class TestAggregationAndRefModes:
    """Scan-path support for shape_aggregation first/previous and
    reference_BB previous_gt/current_gt (reference base_model.py:166-221)."""

    def _tracker(self, cfg, variables=None, model=None):
        if model is None:
            model = get_model(cfg.net_model)(cfg)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        return model, variables, MatchScanTracker(
            model, variables, cfg, max_points=1024, first_crop_points=256
        )

    @pytest.mark.parametrize("agg,ref", [
        ("first", "previous_result"),
        ("previous", "previous_result"),
        ("firstandprevious", "previous_gt"),
        ("firstandprevious", "current_gt"),
        ("first", "current_gt"),
    ])
    def test_mode_runs_and_scores(self, agg, ref):
        cfg = cfg_for("p2b", shape_aggregation=agg, reference_BB=ref)
        _, _, tracker = self._tracker(cfg)
        sampler = get_dataset(cfg, "test", "test")
        ious, distances, boxes = tracker.evaluate_one_sequence(sampler[0], cfg)
        assert len(ious) == len(sampler[0])
        assert all(0.0 <= v <= 1.0 for v in ious)
        assert all(np.isfinite(v) for v in distances)

    def test_modes_actually_differ(self):
        """The three template modes must produce different trajectories on
        the same data (they crop different point sets)."""
        sampler = None
        outs = {}
        for agg in ("firstandprevious", "first", "previous"):
            cfg = cfg_for("p2b", shape_aggregation=agg)
            model = get_model("p2b")(cfg)
            variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
            if sampler is None:
                sampler = get_dataset(cfg, "test", "test")
            tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                       first_crop_points=256)
            outs[agg] = tracker.track_batch([sampler[0]])[0]
        assert not np.allclose(outs["firstandprevious"], outs["first"])
        assert not np.allclose(outs["firstandprevious"], outs["previous"])
        assert not np.allclose(outs["first"], outs["previous"])

    def test_gt_modes_break_error_propagation(self):
        """With reference_BB='current_gt' and shape_aggregation='first' each
        frame depends only on (first crop, this frame, this gt): perturbing
        one mid-tracklet frame's points must change ONLY that frame's box,
        while the default previous_result recurrence propagates the change
        downstream."""
        import copy

        def run(cfg, seq):
            model = get_model("p2b")(cfg)
            variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
            tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                       first_crop_points=256)
            return tracker.track_batch([seq])[0]

        cfg_gt = cfg_for("p2b", shape_aggregation="first",
                         reference_BB="current_gt", syn_tracklet_len=5)
        sampler = get_dataset(cfg_gt, "test", "test")
        seq = sampler[0]
        seq_pert = copy.deepcopy(seq)
        # perturb frame 2's raw points (boxes untouched)
        seq_pert[2]["pc"].points = (
            seq_pert[2]["pc"].points + np.float32(0.05)
        )
        boxes_a = run(cfg_gt, seq)
        boxes_b = run(cfg_gt, seq_pert)
        # boxes[t] tracks frame t+1: only frame 2 (boxes[1]) may change
        assert np.allclose(boxes_a[0], boxes_b[0], atol=1e-6)
        assert not np.allclose(boxes_a[1], boxes_b[1])
        assert np.allclose(boxes_a[2:], boxes_b[2:], atol=1e-6)

        cfg_pr = cfg_for("p2b", shape_aggregation="firstandprevious",
                         reference_BB="previous_result", syn_tracklet_len=5)
        boxes_c = run(cfg_pr, seq)
        boxes_d = run(cfg_pr, seq_pert)
        # the recurrence propagates: some later box must also change
        assert not np.allclose(boxes_c[1:], boxes_d[1:], atol=1e-6)

    def test_prev_gt_vs_current_gt_differ_and_compose_on_gt(self):
        """previous_gt crops/composes on frame t-1's gt, current_gt on frame
        t's gt: on a moving synthetic object the trajectories must differ,
        and every predicted center must stay within the search region of its
        gt anchor (the offset is bounded by the proposal range)."""
        cfg_p = cfg_for("p2b", reference_BB="previous_gt")
        cfg_c = cfg_for("p2b", reference_BB="current_gt")
        model = get_model("p2b")(cfg_p)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg_p, "test", "test")
        seq = sampler[0]
        tr_p = MatchScanTracker(model, variables, cfg_p, max_points=1024,
                                first_crop_points=256)
        tr_c = MatchScanTracker(model, variables, cfg_c, max_points=1024,
                                first_crop_points=256)
        boxes_p = tr_p.track_batch([seq])[0]
        boxes_c = tr_c.track_batch([seq])[0]
        gt_centers = np.stack(
            [f["3d_bbox"].center for f in seq]
        )
        moved = np.linalg.norm(np.diff(gt_centers, axis=0), axis=1).max() > 1e-3
        if moved:
            assert not np.allclose(boxes_p, boxes_c)
        # composition anchor: predictions stay near their gt anchor
        for t in range(len(seq) - 1):
            anchor_p = gt_centers[t]      # previous_gt anchors on frame t
            anchor_c = gt_centers[t + 1]  # current_gt anchors on frame t+1
            assert np.linalg.norm(boxes_p[t][:3] - anchor_p) < 5.0
            assert np.linalg.norm(boxes_c[t][:3] - anchor_c) < 5.0

    def test_all_mode_runs_on_device(self):
        """shape_aggregation='all' runs on device via the carried template
        key reservoir: the tracker builds, scores, and the template actually
        accumulates (its trajectories differ from 'previous', whose template
        is only the last crop, and from 'firstandprevious')."""
        model_cache = {}

        def track(agg, **kw):
            cfg = cfg_for("p2b", shape_aggregation=agg)
            if "model" not in model_cache:
                model_cache["model"] = get_model("p2b")(cfg)
                model_cache["vars"] = model_cache["model"].init(
                    jax.random.PRNGKey(0), model_cache["model"].dummy_batch(2)
                )
                model_cache["sampler"] = get_dataset(cfg, "test", "test")
            tracker = MatchScanTracker(
                model_cache["model"], model_cache["vars"], cfg,
                max_points=256, **kw
            )
            return tracker.track_batch([model_cache["sampler"][0]])[0]

        out_all = track("all")
        assert np.isfinite(out_all).all()
        for other in ("previous", "firstandprevious"):
            assert not np.allclose(out_all, track(other)), other
        # a tiny pool forces reservoir overflow mid-tracklet; must stay
        # finite and still produce a valid trajectory (uniform subsample)
        out_tiny = track("all", template_pool=32)
        assert np.isfinite(out_tiny).all()

    def test_all_mode_pool_accumulates_crops_exactly(self):
        """Unit contract of the 'all' carry: while under capacity, the key
        reservoir's valid points are EXACTLY the union of the k previous
        frames' template crops (each canonical to its own carried result
        box) — the reference's 'all' merge, base_model.py:190-194."""
        from open3dsot_tpu.geometry import rigid
        from open3dsot_tpu.tracking.scan_matching import make_match_step

        cfg = cfg_for("p2b", shape_aggregation="all")
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        step = make_match_step(model, cfg, None, False, "all", False)
        B, P, C = 1, 32, 64
        rng = np.random.default_rng(0)
        wlh = jnp.asarray([[2.0, 4.0, 1.5]], jnp.float32)
        m_half = (jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], -1) / 2
                  * cfg.model_bb_scale + cfg.model_bb_offset)
        carry = (jnp.zeros((B, 4), jnp.float32), wlh,
                 jnp.zeros((B, C, 3), jnp.float32),
                 jnp.full((B, C), -jnp.inf, jnp.float32),
                 jnp.zeros((B,), jnp.int32))
        fpts = jnp.zeros((B, 16, 3), jnp.float32)
        fval = jnp.zeros((B, 16), bool)
        valid = np.ones((B, P), bool)
        valid[:, 20:] = False  # pad rows must never enter the pool
        frames = [rng.standard_normal((B, P, 3)).astype(np.float32) * 0.5
                  for _ in range(4)]
        expected = []
        for t in range(3):
            ref = carry[0]
            xs = (jnp.asarray(frames[t]), jnp.asarray(valid),
                  jnp.asarray(frames[t + 1]), jnp.asarray(valid))
            local = rigid.remove_transform_points(
                jnp.asarray(frames[t]), ref, A=None)
            inside = np.asarray(
                jnp.all((local < m_half[:, None])
                        & (local > -m_half[:, None]), -1)) & valid
            expected.extend(map(tuple, np.asarray(local)[0][inside[0]]))
            carry, _ = step(variables, wlh, fpts, fval, carry, xs)
            pool_pts, pool_key, age = map(np.asarray, carry[2:])
            got = pool_pts[0][pool_key[0] > -np.inf]
            assert age[0] == t + 1
            assert len(expected) <= C  # exactness regime for this test
            assert sorted(map(tuple, got)) == sorted(expected), f"step {t}"

    def test_all_mode_pool_overflow_is_uniform_subsample(self):
        """On overflow the reservoir must hold a uniform subsample of ALL
        points seen — not the most recent frames (the old drop-oldest ring):
        every pooled point is a member of the merged stream, exactly C
        survive, and the survivors span early AND late frames."""
        from open3dsot_tpu.geometry import rigid
        from open3dsot_tpu.tracking.scan_matching import make_match_step

        cfg = cfg_for("p2b", shape_aggregation="all")
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        step = make_match_step(model, cfg, None, False, "all", False)
        B, P, C, T = 1, 32, 16, 6
        rng = np.random.default_rng(1)
        wlh = jnp.asarray([[2.0, 4.0, 1.5]], jnp.float32)
        m_half = (jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], -1) / 2
                  * cfg.model_bb_scale + cfg.model_bb_offset)
        carry = (jnp.zeros((B, 4), jnp.float32), wlh,
                 jnp.zeros((B, C, 3), jnp.float32),
                 jnp.full((B, C), -jnp.inf, jnp.float32),
                 jnp.zeros((B,), jnp.int32))
        fpts = jnp.zeros((B, 16, 3), jnp.float32)
        fval = jnp.zeros((B, 16), bool)
        valid = np.ones((B, P), bool)
        frames = [rng.standard_normal((B, P, 3)).astype(np.float32) * 0.3
                  for _ in range(T + 1)]
        stream = {}  # point tuple -> source frame index
        for t in range(T):
            ref = carry[0]
            xs = (jnp.asarray(frames[t]), jnp.asarray(valid),
                  jnp.asarray(frames[t + 1]), jnp.asarray(valid))
            local = rigid.remove_transform_points(
                jnp.asarray(frames[t]), ref, A=None)
            inside = np.asarray(
                jnp.all((local < m_half[:, None])
                        & (local > -m_half[:, None]), -1)) & valid
            for pt in np.asarray(local)[0][inside[0]]:
                stream[tuple(pt)] = t
            carry, _ = step(variables, wlh, fpts, fval, carry, xs)
        pool_pts, pool_key, age = map(np.asarray, carry[2:])
        assert age[0] == T
        got = [tuple(p) for p in pool_pts[0][pool_key[0] > -np.inf]]
        assert len(got) == C  # stream >> capacity: pool is full
        src = [stream[g] for g in got]  # every point came from the stream
        # uniform over ~6 frames: a drop-oldest ring of size 16 would hold
        # only the last frame; demand survivors from >= 3 distinct frames
        # and at least one from the first half (P(miss first half) ~ 2^-16)
        assert len(set(src)) >= 3, src
        assert min(src) < T // 2, src
        # keys descend: the validity mask is a prefix (contract used by
        # _select_fixed)
        finite = pool_key[0] > -np.inf
        assert not (finite[1:] & ~finite[:-1]).any()

    def test_all_mode_online_matches_offline(self):
        """The online serving tracker carries the same pool state: its
        'all'-mode trajectory must equal the offline scan's."""
        from open3dsot_tpu.tracking.online import OnlineMatchTracker

        cfg = cfg_for("p2b", shape_aggregation="all")
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = sampler[0]
        scan = MatchScanTracker(model, variables, cfg, max_points=256,
                                template_pool=512)
        want = scan.track_batch([seq])[0]
        online = OnlineMatchTracker(model, variables, cfg, max_streams=2,
                                    max_points=256, template_pool=512)
        frames = [f["pc"].points.T.astype(np.float32) for f in seq]
        online.reset(0, seq[0]["pc"], seq[0]["3d_bbox"])
        got = np.stack([online.step({0: frames[t]})[0]
                        for t in range(1, len(seq))])
        np.testing.assert_allclose(want, got, rtol=0, atol=2e-5)

    def test_gt_mode_on_mesh(self):
        """The gt reference_BB modes carry two extra batched scan inputs;
        the shard_map mesh path must shard them too and agree with the
        unsharded run."""
        from jax.sharding import Mesh

        cfg = cfg_for("p2b", reference_BB="previous_gt")
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seqs = [sampler[0], sampler[1]]
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
        tr_mesh = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256, mesh=mesh)
        tr_one = MatchScanTracker(model, variables, cfg, max_points=1024,
                                  first_crop_points=256)
        got = tr_mesh.track_batch(seqs)
        want = tr_one.track_batch(seqs)
        for g, w in zip(got, want):
            assert np.allclose(g, w, atol=1e-5)


class TestGtModeWlhSemantics:
    """getOffsetBB copies the anchor's wlh onto the prediction
    (points_utils.py:43-85): with per-frame-varying gt dimensions the gt
    modes must carry/score the anchor wlh, not the first frame's."""

    def _varied_seq(self, sampler):
        import copy

        from open3dsot_tpu.geometry.data_classes import Box

        seq = copy.deepcopy(sampler[0])
        for t, frame in enumerate(seq):
            b = frame["3d_bbox"]
            frame["3d_bbox"] = Box(
                np.asarray(b.center).tolist(),
                (np.asarray(b.wlh) * (1.0 + 0.15 * t)).tolist(),
                b.orientation,
            )
        return seq

    @pytest.mark.parametrize("ref", ["previous_gt", "current_gt"])
    def test_host_score_boxes_carry_anchor_wlh(self, ref):
        cfg = cfg_for("p2b", reference_BB=ref)
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = self._varied_seq(sampler)
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        _, _, boxes = tracker.evaluate_one_sequence(seq, cfg)
        for t in range(1, len(seq)):
            anchor = seq[t - 1] if ref == "previous_gt" else seq[t]
            assert np.allclose(boxes[t].wlh, anchor["3d_bbox"].wlh), t

    @pytest.mark.parametrize("ref", ["previous_gt", "current_gt"])
    def test_device_score_matches_host_score_with_varying_wlh(self, ref):
        cfg = cfg_for("p2b", reference_BB=ref)
        model = get_model("p2b")(cfg)
        variables = model.init(jax.random.PRNGKey(0), model.dummy_batch(2))
        sampler = get_dataset(cfg, "test", "test")
        seq = self._varied_seq(sampler)
        tracker = MatchScanTracker(model, variables, cfg, max_points=1024,
                                   first_crop_points=256)
        iou_d, dist_d = (np.asarray(x) for x in tracker.dispatch_scored([seq]))
        ious, dists, _ = tracker.evaluate_sequences([seq], cfg)[0]
        T = len(seq)
        assert np.allclose(iou_d[0, :T], ious, atol=2e-4)
        assert np.allclose(dist_d[0, :T], dists, atol=2e-4)
