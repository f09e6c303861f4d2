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
#
# CPU-platform processes get NO persistent cache. XLA:CPU entries are AOT
# executables compiled for the build host's exact LLVM target machine —
# including CPU-MODEL-derived tuning features (+prefer-no-gather etc.) that
# appear in no /proc/cpuinfo flags line — and jax's cache key carries no CPU
# identity at all (the CPU backend's platform_version is the literal string
# 'cpu'). On this environment the VM migrates between sessions, and a stale
# entry loaded on the wrong host SIGILLs (cpu_aot_loader.cc mismatch errors
# observed in MULTICHIP_r04.json even after keying the dir on
# family/model/stepping+flags — the tuning features are invisible to any
# host-derived key). CPU compiles are seconds, not minutes, so the fix is to
# never persist them: the hazard class disappears, and TPU executables —
# which don't depend on the host CPU — now share ONE dir across migrations
# instead of re-paying a 5-10 min compile per migration.
# Regression-tested in tests/test_compile_cache_gate.py.


def _should_enable_cache(environ=None, jax_platforms=None) -> bool:
    """True iff the persistent compile cache is safe for this process: the
    effective jax platform is not CPU (see module comment). The effective
    platform is jax.config.jax_platforms when set (tests' conftest forces
    'cpu' there before this package imports), else the JAX_PLATFORMS env
    var; an empty/auto value on this machine resolves to the TPU plugin."""
    environ = _os.environ if environ is None else environ
    if environ.get("OPEN3DSOT_NO_COMPILE_CACHE"):
        return False
    if jax_platforms is None:
        jax_platforms = _jax.config.jax_platforms
    p = jax_platforms or environ.get("JAX_PLATFORMS", "")
    return p.split(",")[0].strip().lower() != "cpu"


if (_should_enable_cache()
        and _jax.config.jax_compilation_cache_dir is None):
    _cache = _os.environ.get(
        "OPEN3DSOT_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/open3dsot_tpu/xla"),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except OSError:
        pass  # unwritable cache location: compile as before
