"""open3dsot_tpu: a TPU-native LiDAR single-object-tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Open3DSOT
(P2B / BAT / M2-Track 3D single-object tracking): fixed-shape, mask-based
point-cloud geometry; Pallas/XLA point-sampling kernels; flax models that
compile into a single jitted track-step; shard_map/pjit data parallelism
over a device mesh instead of DDP/NCCL.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache (cross-process). Full-model compiles on
# the remote-helper TPU backend take 5-10 minutes each; with this cache a
# second process (another bench script, a rerun, the driver) loads the
# executable in <1 s. Opt out with OPEN3DSOT_NO_COMPILE_CACHE=1; an
# explicit user-set jax cache dir wins.


def _host_cache_key() -> str:
    """XLA:CPU AOT executables are compiled for the build host's exact CPU
    features and jax's cache key does NOT include them, so a cache dir
    carried across a VM migration serves binaries the new host cannot run
    (cpu_aot_loader: 'could lead to execution errors such as SIGILL' —
    observed killing one worker of the 2-process Gloo tests, surfacing as
    a DEADLINE_EXCEEDED in its peer). Keying the dir on the host's CPU
    flags turns a migration into a clean cache miss."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    ident += line
                    break
    except OSError:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


if (not _os.environ.get("OPEN3DSOT_NO_COMPILE_CACHE")
        and _jax.config.jax_compilation_cache_dir is None):
    _cache = _os.path.join(
        _os.environ.get(
            "OPEN3DSOT_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/open3dsot_tpu/xla"),
        ),
        _host_cache_key(),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except OSError:
        pass  # unwritable cache location: compile as before
