"""Serialized serving bundles for the online trackers (AOT deployment).

The reference deploys by shipping the whole training repo and re-running
model code at load time (a Lightning ckpt stores only weights — rebuilding
the module graph needs models/*.py; /root/reference/main.py:67-70). A
TPU-native serving story can do better: `jax.export` serializes the online
tracker's already-jitted step functions as StableHLO, so a serving host
loads ONE artifact containing

- the `advance` dispatch (all streams, one program) and the slot `reset`
  program as portable StableHLO (`jax.export.serialize`),
- the weights (flax msgpack), and
- the little host-side metadata the slot-pool API needs (pool shape,
  up-axis, template-crop params, transfer codec),

and serves without constructing the flax model, without tracing, and
without the model-definition code having to match the training-time
version. `load_serving_bundle` returns the same OnlineM2Tracker /
OnlineMatchTracker object the live constructor builds — identical `reset` /
`step` / `stop` API, trajectories bit-equal to the exporting tracker's
(tests/test_serving_export.py).

Scope: single-program bundles (mesh=None trackers). Exported programs are
platform-checked by jax at load time; pass platforms=["tpu", "cpu"] at save
time to produce a bundle loadable on both.
"""

from __future__ import annotations

import json
import pathlib
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from open3dsot_tpu.tracking.online import (
    OnlineM2Tracker,
    OnlineMatchTracker,
    _OnlineBase,
)

_FORMAT_VERSION = 1


def _spec_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def _export_fn(jfn, specs, platforms):
    exp = jax_export.export(jfn, platforms=platforms)(*specs)
    return exp.serialize()


def save_serving_bundle(tracker, path, platforms=None):
    """Write a self-contained serving bundle for an online tracker.

    `platforms` follows jax.export semantics: None exports for the current
    backend only; a list like ["tpu", "cpu"] produces a multi-platform
    program (the fused Pallas kernels only lower for "tpu" — export a
    tracker whose config leaves fused_sa on 'auto' if you need a CPU-loadable
    bundle).
    """
    if tracker.mesh is not None:
        raise ValueError(
            "serving bundles are single-program (mesh=None); shard the slot "
            "pool at load time on the serving host instead"
        )
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)

    from flax import serialization

    B, P = tracker.max_streams, tracker.max_points
    var_spec = _spec_of(tracker.variables)
    state_spec = _spec_of(tracker._state)
    pts = jax.ShapeDtypeStruct((B, P, 3), jnp.float32)
    valid = jax.ShapeDtypeStruct((B, P), jnp.bool_)
    (path / "advance.stablehlo").write_bytes(
        _export_fn(tracker._advance, (var_spec, state_spec, pts, valid),
                   platforms)
    )
    q = jax.ShapeDtypeStruct((B, P, 3), jnp.int16)
    scale = jax.ShapeDtypeStruct((B,), jnp.float32)
    off = jax.ShapeDtypeStruct((B, 3), jnp.float32)
    (path / "advance_q.stablehlo").write_bytes(
        _export_fn(tracker._advance_q,
                   (var_spec, state_spec, scale, off, q, valid), platforms)
    )

    slot = jax.ShapeDtypeStruct((), jnp.int32)
    one_pts = jax.ShapeDtypeStruct((P, 3), jnp.float32)
    one_valid = jax.ShapeDtypeStruct((P,), jnp.bool_)
    wlh = jax.ShapeDtypeStruct((3,), jnp.float32)
    init = jax.ShapeDtypeStruct((4,), jnp.float32)
    if isinstance(tracker, OnlineMatchTracker):
        family = "match"
        P1 = tracker.first_crop_points
        reset_specs = (
            state_spec, slot, one_pts, one_valid,
            jax.ShapeDtypeStruct((P1, 3), jnp.float32),
            jax.ShapeDtypeStruct((P1,), jnp.bool_), wlh, init,
        )
    else:
        family = "m2track"
        reset_specs = (state_spec, slot, one_pts, one_valid, wlh, init)
    (path / "reset.stablehlo").write_bytes(
        _export_fn(tracker._reset_slot, reset_specs, platforms)
    )

    (path / "variables.msgpack").write_bytes(
        serialization.to_bytes(tracker.variables)
    )
    cfg = tracker.config
    meta = {
        "format_version": _FORMAT_VERSION,
        "family": family,
        "max_streams": B,
        "max_points": P,
        "transfer_dtype": tracker.transfer_dtype,
        "up_axis": [float(v) for v in cfg.up_axis],
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else None,
        # the device state pool is rebuilt from shape on load ('wlh' slots
        # init to ones, reservoir keys to -inf, everything else zeros — a
        # slot must be reset() before use either way)
        "state_shapes": {
            k: [list(map(int, jnp.shape(v))), str(jnp.result_type(v))]
            for k, v in tracker._state.items()
        },
    }
    if family == "match":
        meta["first_crop_points"] = tracker.first_crop_points
        meta["model_bb_scale"] = float(cfg.model_bb_scale)
        meta["model_bb_offset"] = float(cfg.model_bb_offset)
    (path / "meta.json").write_text(json.dumps(meta, indent=1))


def _deserialized_call(path):
    exp = jax_export.deserialize(bytearray(path.read_bytes()))
    return jax.jit(exp.call)


def load_serving_bundle(path):
    """Load a bundle into a ready-to-serve online tracker.

    No flax model is constructed and nothing is retraced — the step
    functions come back as the exporting process's StableHLO programs, so a
    serving host needs neither the model code nor the training config."""
    path = pathlib.Path(path)
    meta = json.loads((path / "meta.json").read_text())
    if meta["format_version"] != _FORMAT_VERSION:
        raise ValueError(
            f"bundle format {meta['format_version']} != {_FORMAT_VERSION}"
        )
    from flax import serialization

    variables = serialization.msgpack_restore(
        (path / "variables.msgpack").read_bytes()
    )
    cfg = SimpleNamespace(up_axis=meta["up_axis"])
    cls = OnlineMatchTracker if meta["family"] == "match" else OnlineM2Tracker
    self = object.__new__(cls)
    _OnlineBase.__init__(
        self, model=None, variables=variables, config=cfg,
        max_streams=meta["max_streams"], max_points=meta["max_points"],
        mesh=None, transfer_dtype=meta["transfer_dtype"],
    )
    if meta["family"] == "match":
        self.first_crop_points = int(meta["first_crop_points"])
        cfg.model_bb_scale = meta["model_bb_scale"]
        cfg.model_bb_offset = meta["model_bb_offset"]
    # wlh slots init to ones; 'all'-mode reservoir keys to -inf (empty
    # slot marker, scan_matching.make_match_step); everything else zeros
    def _init_state(k, shape, dtype):
        if k == "wlh":
            return np.ones(tuple(shape), dtype)
        if k == "pool_key":
            return np.full(tuple(shape), -np.inf, dtype)
        return np.zeros(tuple(shape), dtype)

    state = {
        k: _init_state(k, shape, dtype)
        for k, (shape, dtype) in meta["state_shapes"].items()
    }
    self._state = self._place(state)

    self._advance = _deserialized_call(path / "advance.stablehlo")
    self._advance_q = _deserialized_call(path / "advance_q.stablehlo")
    reset_call = _deserialized_call(path / "reset.stablehlo")

    def reset_slot(state, slot, *rest):
        return reset_call(state, jnp.int32(slot), *rest)

    self._reset_slot = reset_slot
    return self
