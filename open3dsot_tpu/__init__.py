"""open3dsot_tpu: a TPU-native LiDAR single-object-tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Open3DSOT
(P2B / BAT / M2-Track 3D single-object tracking): fixed-shape, mask-based
point-cloud geometry; Pallas/XLA point-sampling kernels; flax models that
compile into a single jitted track-step; shard_map/pjit data parallelism
over a device mesh instead of DDP/NCCL.
"""

__version__ = "0.1.0"
