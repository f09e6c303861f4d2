"""End-to-end training throughput: host sampler vs on-device sample builder.

Measures wall-clock samples/s over full epochs (data pipeline + train step)
on the real TPU, at reference KITTI shapes (1024-point clouds, batch 64).
Usage: python scripts/bench_device_sampler.py [--batch 64] [--bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tracklets", type=int, default=24)
    ap.add_argument("--frames", type=int, default=24)
    a = ap.parse_args()

    from open3dsot_tpu.config import make_config
    from open3dsot_tpu.data import get_dataset
    from open3dsot_tpu.models import get_model
    from open3dsot_tpu.train.trainer import Trainer

    def run(device_sampler: bool) -> float:
        cfg = make_config(dict(
            dataset="synthetic", net_model="m2track", category_name="Car",
            point_sample_size=1024, bb_scale=1.0, bb_offset=0.1,
            degrees=False, up_axis=[0, 0, 1], data_limit_box=True,
            train_type="train_motion", num_candidates=4, motion_threshold=0.15,
            box_aware=True, bc_weight=1.0, use_augmentation=True,
            center_weight=2.0, angle_weight=10.0, seg_weight=0.1,
            motion_cls_seg_weight=0.1, use_z=True, limit_box=False,
            IoU_space=3, batch_size=a.batch, epoch=3, lr=1e-3,
            optimizer="Adam", lr_decay_step=20, lr_decay_rate=0.1, wd=0.0,
            gradient_clip_val=0.0, log_dir="/tmp/bench_ds",
            syn_num_tracklets=a.tracklets, syn_tracklet_len=a.frames,
            seed=0, bf16=a.bf16, device_sampler=device_sampler,
            max_raw_points=2048, val_tracker="scan",
        ))
        model = get_model("m2track")(cfg)
        sampler = get_dataset(cfg, "train_motion", "train")
        trainer = Trainer(model, cfg, work_dir="/tmp/bench_ds", log_every=10**9)
        t0 = time.time()
        trainer.fit(sampler, val_sampler=None, epochs=2)
        # epoch 0 pays the compile; epoch 1 is the steady state
        steady = trainer.history[-1]["time_s"]
        n_samples = (len(sampler) // a.batch) * a.batch
        print(f"device_sampler={device_sampler}: steady epoch {steady:.2f}s, "
              f"{n_samples / steady:.0f} samples/s "
              f"(total fit {time.time() - t0:.1f}s)")
        return n_samples / steady

    r_host = run(False)
    r_dev = run(True)
    print(f"speedup: {r_dev / r_host:.2f}x")


if __name__ == "__main__":
    main()
