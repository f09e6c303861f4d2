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
    identity turns a migration into a clean cache miss.

    The key must include family/model/stepping, not just the flags line:
    XLA derives LLVM tuning features from the CPU *model* (e.g. Emerald
    Rapids gets +prefer-no-scatter/+prefer-no-gather) that never appear in
    /proc/cpuinfo flags — two migration hosts with identical flags but
    different models were observed colliding on the flags-only key,
    re-surfacing the cpu_aot_loader mismatch warnings."""
    import hashlib
    import platform

    ident = platform.machine()
    want = ("flags", "Features", "cpu family", "model", "stepping",
            "vendor_id", "CPU implementer", "CPU part")
    seen = set()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                k = line.split(":", 1)[0].strip()
                if k in want and k not in seen:
                    seen.add(k)  # first core only; cores are homogeneous
                    ident += line
                if len(seen) == len(want) or line.strip() == "" and seen:
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
