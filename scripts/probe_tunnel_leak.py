"""Measure the axon tunnel client's host-RAM leak per device_put.

Observed on this environment (2026-08-19): every H2D transfer leaks host
memory roughly equal to the transferred bytes — 400 batch-sized puts of
~3 MB grew max RSS 172 -> 1647 MB (~3.7 MB/put), unbounded, gc-immune.
That is an environment bug in the tunnel client, not in this repo's code
(the same loop on the CPU backend is flat), but it OOM-killed a 295-epoch
training run at 130 GB RSS. Mitigation: chunked training with process
restarts (benchmarks/drift_benchmark.py --chunk-epochs +
scripts/run_drift_v2.sh); int16 transfer packing (utils/quant.py) also
halves the leak rate along with the H2D bytes.

Usage: python scripts/probe_tunnel_leak.py [n_steps]
"""

import gc
import resource
import sys

import jax
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    @jax.jit
    def f(x):
        return (x * 2.0).sum()

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    x0 = np.random.rand(256, 1024, 3).astype(np.float32)  # ~3 MB batch
    print("device:", jax.devices()[0].device_kind, flush=True)
    start = rss_mb()
    print(f"start rss {start:.0f} MB", flush=True)
    for i in range(n):
        x = x0 + i  # fresh host array each step, like a new train batch
        y = f(jax.device_put(x))
        if (i + 1) % 100 == 0:
            float(y)  # drain in-flight work (the trainer's log fetch)
            gc.collect()
            print(f"step {i + 1}: rss {rss_mb():.0f} MB", flush=True)
    per_put = (rss_mb() - start) / n
    print(f"leak ~{per_put:.2f} MB/device_put "
          f"({'LEAKING' if per_put > 0.5 else 'flat'})", flush=True)


if __name__ == "__main__":
    main()
