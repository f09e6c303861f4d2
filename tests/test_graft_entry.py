"""The driver's multichip dryrun must be self-contained and honest.

Round-1 regression (VERDICT #1): `dryrun_multichip` inherited the env-pinned
TPU platform and died; and `make_mesh` silently shrank to the available
device count, so a 1-device run could pass vacuously. These tests pin both
fixes: the dryrun forces its own virtual CPU mesh even when the ambient env
points elsewhere, and `make_mesh` raises rather than shrink.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_mesh_refuses_to_shrink():
    from open3dsot_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="requested 64 devices"):
        make_mesh(64)


def test_dryrun_multichip_forces_own_cpu_mesh():
    # Simulate the driver: ambient env does NOT preconfigure a CPU mesh (and
    # on the real machine pins a TPU platform). The entry must still build an
    # 8-device mesh and run a sharded step.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # keep CI off the tunnel; entry sets cpu itself
    env["JAX_NUM_CPU_DEVICES"] = "1"  # hostile: pretend 1 device unless overridden
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,  # single host core; suite may run under heavy contention
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in out.stdout
