"""save_top_k checkpoint retention + preloading CLI semantics.

Reference parity: ModelCheckpoint(monitor='precision/test', mode='max',
save_last, save_top_k) at /root/reference/main.py:78-79; --preloading is
argparse-default False and always overrides YAML (main.py:44,47).
"""

import os

import jax
import numpy as np
import pytest

from open3dsot_tpu.config import make_config
from open3dsot_tpu.models import get_model
from open3dsot_tpu.train.optim import make_optimizer
from open3dsot_tpu.train.trainer import Trainer, create_train_state


def _mk_trainer(tmp_path, k):
    cfg = make_config(
        dict(
            dataset="synthetic", net_model="m2track", category_name="Car",
            point_sample_size=32, degrees=False, use_z=True, limit_box=False,
            IoU_space=3, box_aware=False, batch_size=4, save_top_k=k,
            log_dir=str(tmp_path),
        )
    )
    model = get_model("m2track")(cfg)
    trainer = Trainer(model, cfg, work_dir=str(tmp_path))
    opt = make_optimizer(cfg, steps_per_epoch=2)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    return trainer, state


def _epoch_ckpts(tmp_path):
    return sorted(d for d in os.listdir(tmp_path) if d.startswith("ckpt_ep"))


def test_top_k_keeps_k_best(tmp_path):
    trainer, state = _mk_trainer(tmp_path, k=2)
    precisions = [10.0, 30.0, 20.0, 40.0, 5.0]
    for epoch, prec in enumerate(precisions):
        trainer.save_topk_checkpoint(state, epoch, prec)
    # best two are epoch 3 (40.0) and epoch 1 (30.0)
    assert _epoch_ckpts(tmp_path) == ["ckpt_ep001", "ckpt_ep003"]
    assert [round(p) for p, _ in trainer._topk] == [40, 30]


def test_top_k_minus_one_keeps_all(tmp_path):
    trainer, state = _mk_trainer(tmp_path, k=-1)
    for epoch, prec in enumerate([1.0, 2.0, 3.0]):
        trainer.save_topk_checkpoint(state, epoch, prec)
    assert len(_epoch_ckpts(tmp_path)) == 3


def test_top_k_zero_saves_none(tmp_path):
    trainer, state = _mk_trainer(tmp_path, k=0)
    trainer.save_topk_checkpoint(state, 0, 99.0)
    assert _epoch_ckpts(tmp_path) == []


def test_topk_checkpoint_is_loadable(tmp_path):
    trainer, state = _mk_trainer(tmp_path, k=1)
    trainer.save_topk_checkpoint(state, 0, 12.5)
    restored = Trainer.load_checkpoint(os.path.join(tmp_path, "ckpt_ep000"))
    got = jax.tree_util.tree_leaves(restored["params"])
    want = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.allclose(a, b) for a, b in zip(got, want))


def test_preloading_defaults_false():
    cfg = make_config(dict(dataset="synthetic", net_model="m2track",
                           category_name="Car"))
    assert cfg.preloading is False


def test_cli_has_reference_flags():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "_main_cli", os.path.join(os.path.dirname(os.path.dirname(__file__)), "main.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    try:
        sys.argv = ["main.py", "--cfg", "x.yaml", "--save_top_k", "3",
                    "--check_val_every_n_epoch", "2", "--preloading"]
        args = mod.parse_args()
    finally:
        sys.argv = old_argv
    assert args.save_top_k == 3
    assert args.check_val_every_n_epoch == 2
    assert args.preloading is True
