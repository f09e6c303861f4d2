"""Tracklet evaluation driver.

Mirrors BaseModel.evaluate_one_sequence (/root/reference/models/base_model.py:59-117):
frame 0 is the ground truth; each later frame builds its model input around
the previous prediction, runs the tracker, converts the local 4-DoF output to
a world box, and scores overlap/accuracy against the ground truth.

TPU-native difference: the forward is one jitted, fixed-shape executable
(compiled once per model), so per-frame work is one small host crop + one
device call — not the reference's module-by-module eager launch. A fully
on-device `lax.scan` tracker for batched tracklets is the next optimization
stage (tracking/scan_tracker.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from open3dsot_tpu.geometry.iou import estimateAccuracy, estimateOverlap
from open3dsot_tpu.utils.metrics import Precision, Success


class Tracker:
    """Holds the jitted eval forward for a (model, variables) pair."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._forward = jax.jit(lambda v, batch: model.apply(v, batch, train=False))

    def forward(self, data_dict: dict) -> dict:
        return self._forward(self.variables, data_dict)

    def evaluate_one_sequence(self, sequence, config):
        ious, distances, results_bbs = [], [], []
        for frame_id in range(len(sequence)):
            this_bb = sequence[frame_id]["3d_bbox"]
            if frame_id == 0:
                results_bbs.append(this_bb)
            else:
                data_dict, ref_bb = self.model.build_input_dict(
                    sequence, frame_id, results_bbs
                )
                output = self.forward(data_dict)
                candidate_box = self.model.extract_output_box(output, ref_bb)
                results_bbs.append(candidate_box)
            ious.append(
                estimateOverlap(
                    this_bb, results_bbs[-1], dim=config.IoU_space, up_axis=config.up_axis
                )
            )
            distances.append(
                estimateAccuracy(
                    this_bb, results_bbs[-1], dim=config.IoU_space, up_axis=config.up_axis
                )
            )
        return ious, distances, results_bbs


def evaluate_dataset(model, variables, test_sampler, config,
                     max_tracklets: Optional[int] = None, verbose: bool = False,
                     shard_across_processes: bool = False,
                     results_writer=None):
    """Run the tracker over every tracklet; returns (success, precision).

    Distributed eval (replacing the reference's Lightning DDP test sharding,
    main.py:89-93): with shard_across_processes, each host walks tracklets
    `process_index, process_index + process_count, ...` and the fixed-size
    metric count-vectors are summed across hosts at the end — O(22 floats)
    of communication regardless of dataset size.

    results_writer: optional tracking.results.ResultsWriter — persists each
    tracklet's predicted trajectory + per-frame scores.
    """
    tracker = Tracker(model, variables)
    success, precision = Success(), Precision()
    n = len(test_sampler)
    if max_tracklets is not None:
        n = min(n, max_tracklets)
    start, step = 0, 1
    if shard_across_processes:
        start, step = jax.process_index(), jax.process_count()
    for i in range(start, n, step):
        sequence = test_sampler[i]
        ious, distances, result_bbs = tracker.evaluate_one_sequence(sequence, config)
        if results_writer is not None:
            results_writer.add(i, result_bbs, ious, distances)
        success.update(ious)
        precision.update(distances)
        if verbose:
            print(
                f"tracklet {i + 1}/{n} len={len(sequence)} "
                f"success={success.compute():.2f} precision={precision.compute():.2f}"
            )
    if shard_across_processes and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        for metric in (success, precision):
            gathered = np.asarray(multihost_utils.process_allgather(metric.state()))
            metric.load_state(gathered.sum(axis=0))
    return success.compute(), precision.compute()
