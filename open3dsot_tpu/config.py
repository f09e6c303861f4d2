"""Flat YAML config system.

Preserves the reference's config-API: flat key/value YAML files, one per
(model, dataset) pair, attribute access on the loaded object, CLI overrides
win over YAML (cf. /root/reference/main.py:23-49). Unlike the reference we
make the implicit `getattr(config, key, default)` defaults explicit in
`DEFAULTS`, validate the handful of enum-ish keys, and keep everything a
plain python object (no easydict dependency).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml


# Defaults the reference scatters through the code via getattr(..., default).
DEFAULTS: Dict[str, Any] = {
    # data
    "category_name": "Car",
    "coordinate_mode": "velodyne",
    "up_axis": [0, 0, 1],
    "preload_offset": -1,
    # reference main.py:44: argparse default False, and the CLI value always
    # overrides the YAML — so preloading is opt-in via --preloading
    "preloading": False,
    "num_candidates": 1,
    "use_augmentation": False,
    "random_sample": False,
    "sample_per_epoch": 10000,
    "data_limit_box": True,
    "degrees": True,
    "key_frame_only": False,
    "min_points": 1,
    "tiny": False,
    "version": "v1.0-trainval",
    # model
    "box_aware": False,
    "use_fps": False,
    "normalize_xyz": False,
    "use_motion_cls": True,
    "use_second_stage": True,
    "use_prev_refinement": True,
    "use_search_bc": False,
    "use_search_feature": False,
    "bc_channel": 9,
    "k": 4,
    # test
    "reference_BB": "previous_result",
    "shape_aggregation": "firstandprevious",
    "use_z": False,
    "limit_box": True,
    # scan-path limit_box re-draw for outlier predictions: 'uniform' draws
    # real U(-1,1) from a per-step jax key (distribution-faithful to the
    # reference's host np.random.uniform, points_utils.py:70-76); 'zero'
    # substitutes the uniform's mean (fully deterministic trajectories)
    "limit_box_redraw": "uniform",
    "IoU_space": 3,
    # training
    "batch_size": 64,
    "workers": 0,
    "epoch": 60,
    "lr": 1e-3,
    "optimizer": "Adam",
    "lr_decay_step": 20,
    "lr_decay_rate": 0.1,
    "wd": 0.0,
    "gradient_clip_val": 0.0,
    "check_val_every_n_epoch": 1,
    "save_top_k": -1,
    "log_dir": "./runs",
    "seed": 42,
    # parallelism (new, TPU-native)
    "mesh_shape": None,  # None -> all local devices on one 'data' axis
    "bf16": False,
    # in-training validation path: 'auto' uses the on-device scan tracker
    # when the config allows it, else the host fidelity loop
    "val_tracker": "auto",
    # scan-tracker deterministic resampling: 'strided' (evenly spaced over
    # the cropped points, closest to the reference's uniform random choice)
    # or 'first' (prefix + cyclic fill)
    "scan_resample": "strided",
    # fused set-abstraction eval kernel (ops/sa_fused.py): 'auto' enables it
    # on TPU backends only (the Pallas kernel runs interpreted — slowly —
    # on CPU); True/False force it
    "fused_sa": "auto",
    # fused training-mode SA passes with a custom VJP
    # (ops/sa_fused_train.py); same auto-on-TPU semantics
    "fused_sa_train": "auto",
    # explicit shard_map data parallelism instead of GSPMD jit-shardings:
    # each device runs the step body on its local shard (DDP semantics —
    # per-device BatchNorm batch statistics, pmean'd gradients), which is
    # what lets the fused Pallas kernels run on a multi-chip mesh
    "dp_shard_map": False,
    # build training samples inside the jitted train step
    # (data/device_sampler.py; train_motion only). The host then only pads
    # raw frames — it is ~10x too slow to build samples itself on 1 core
    "device_sampler": False,
    "max_raw_points": 2048,
    # host->device transfer packing: None ships padded frame points as f32;
    # 'int16' ships a fixed-point encoding (offset/scale over the VALID
    # points, <=2mm quantization at +/-64 m extent) dequantized in-jit —
    # halves H2D bytes on the scan/online eval paths AND the
    # device_sampler training path, for links where transfer binds (this
    # environment's tunnel; see BENCH_E2E_EVAL.md)
    "transfer_quant": None,
    # cache the padded validation arrays across epochs (zero host padding
    # after epoch 1); pins the padded val set in host RAM — disable for
    # very large validation splits
    "val_prep_cache": True,
}


class Config:
    """Attribute-accessible flat config (our easydict replacement)."""

    def __init__(self, d: Optional[Dict[str, Any]] = None, **kwargs):
        merged = dict(d or {})
        merged.update(kwargs)
        for k, v in merged.items():
            setattr(self, k, v)

    def __contains__(self, key):
        return hasattr(self, key)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in self.__dict__.items()}

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def __repr__(self):
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"Config({items})"


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def make_config(yaml_dict: Dict[str, Any], overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Defaults < YAML < CLI overrides (matching reference merge order)."""
    cfg = dict(DEFAULTS)
    cfg.update({k: v for k, v in (yaml_dict or {}).items() if v is not None})
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    validate(cfg)
    return Config(cfg)


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    return make_config(load_yaml(path), overrides)


_ENUMS = {
    "coordinate_mode": {"velodyne", "camera"},
    "train_type": {"train_siamese", "train_motion"},
    "limit_box_redraw": {"uniform", "zero"},
}


def validate(cfg: Dict[str, Any]) -> None:
    for key, allowed in _ENUMS.items():
        if key in cfg and cfg[key] is not None and cfg[key] not in allowed:
            raise ValueError(f"config.{key}={cfg[key]!r} not in {sorted(allowed)}")
    if "net_model" in cfg and cfg["net_model"] is not None:
        if cfg["net_model"].lower() not in {"p2b", "bat", "m2track"}:
            raise ValueError(f"unknown net_model {cfg['net_model']!r}")
