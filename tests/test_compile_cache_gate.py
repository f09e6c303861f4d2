"""Regression tests for the persistent-compile-cache platform gate.

VERDICT r4 #3: XLA:CPU cache entries are AOT executables compiled for the
build host's exact LLVM target machine, including CPU-MODEL-derived tuning
features (+prefer-no-gather) that no /proc/cpuinfo-derived key can see; on a
migrating VM a stale entry SIGILLs a worker (observed as a Gloo
DEADLINE_EXCEEDED, then again in MULTICHIP_r04.json's tail even after the
cpuinfo key gained family/model/stepping). The fix is to never persist
XLA:CPU executables at all: open3dsot_tpu.__init__ only enables the cache
when the effective jax platform is not CPU, and __graft_entry__._force_cpu_mesh
clears any cache dir enabled earlier in the process (entry() may run on the
TPU platform before dryrun_multichip switches to CPU).
"""

import json
import os
import subprocess
import sys

import jax

import open3dsot_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_logic():
    should = open3dsot_tpu._should_enable_cache
    # jax_platforms=None reads the process-global jax config, which the
    # conftest pins to 'cpu' here — pass it explicitly ('' = fall back to
    # the env var) to exercise each branch.
    # CPU platform (env or config) -> no persistent cache
    assert not should(environ={"JAX_PLATFORMS": "cpu"}, jax_platforms="")
    assert not should(environ={}, jax_platforms="cpu")
    assert not should(environ={"JAX_PLATFORMS": "CPU"}, jax_platforms="")
    assert not should(environ={}, jax_platforms="cpu,tpu")
    # the config (when set) wins over the env, as in jax itself
    assert not should(environ={"JAX_PLATFORMS": "axon"})  # conftest: 'cpu'
    # TPU-ish platforms (and auto, which resolves to the TPU plugin on this
    # machine) -> cache on
    assert should(environ={"JAX_PLATFORMS": "axon"}, jax_platforms="")
    assert should(environ={"JAX_PLATFORMS": "tpu"}, jax_platforms="")
    assert should(environ={}, jax_platforms="tpu,cpu")
    assert should(environ={}, jax_platforms="")  # auto
    # explicit opt-out always wins
    assert not should(environ={"OPEN3DSOT_NO_COMPILE_CACHE": "1",
                               "JAX_PLATFORMS": "axon"}, jax_platforms="")


def test_this_cpu_process_has_no_persistent_cache():
    # the suite runs on the forced-CPU backend (conftest); importing the
    # package must NOT have configured a persistent cache dir here
    assert jax.default_backend() == "cpu"
    assert jax.config.jax_compilation_cache_dir is None


def test_stale_entry_is_never_read_on_cpu(tmp_path):
    """Plant a deliberately wrong-featured (garbage) entry in the cache
    location and prove a CPU-platform process neither reads it nor writes
    new entries: the cache dir is never handed to jax at all."""
    cache = tmp_path / "xla"
    cache.mkdir()
    stale = cache / "jit_f-deadbeef"  # content is irrelevant: must not load
    stale.write_bytes(b"NOT A VALID XLA:CPU AOT EXECUTABLE")
    before = sorted(os.listdir(cache))

    code = (
        "import jax, jax.numpy as jnp, json, sys\n"
        "import open3dsot_tpu\n"
        "out = float(jax.jit(lambda x: x * 2 + 1)(jnp.float32(3)))\n"
        "print(json.dumps({'cache_dir': jax.config.jax_compilation_cache_dir,"
        " 'out': out}))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("OPEN3DSOT_NO_COMPILE_CACHE", None)
    env["OPEN3DSOT_COMPILE_CACHE"] = str(cache)
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["cache_dir"] is None
    assert info["out"] == 7.0
    assert "cpu_aot_loader" not in r.stderr
    assert sorted(os.listdir(cache)) == before  # nothing written either


def test_force_cpu_mesh_clears_cache_dir(tmp_path):
    """entry() may enable the cache on the TPU platform; a later
    dryrun_multichip in the SAME process must not persist CPU executables."""
    code = (
        "import jax, json\n"
        "jax.config.update('jax_compilation_cache_dir', %r)\n"
        "import __graft_entry__ as g\n"
        "g._force_cpu_mesh(2)\n"
        "print(json.dumps({'cache_dir': jax.config.jax_compilation_cache_dir}))\n"
        % str(tmp_path / "xla")
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["cache_dir"] is None
