#!/bin/bash
# Drive benchmarks/drift_benchmark.py to completion in chunked processes.
#
# The axon tunnel client leaks host RAM roughly one batch per device_put
# (~3.5 MB/train-step measured — scripts/probe_tunnel_leak.py), so a long
# training run in ONE process gets OOM-killed (a 295-epoch M2 run reached
# 130 GB RSS). drift_benchmark.py trains at most --chunk-epochs per
# invocation and exits 3 when more remain; the leak dies with each process
# and ckpt_last + opt_state/step resume makes the chunked run
# computation-identical to an uninterrupted one.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 40); do
  python benchmarks/drift_benchmark.py "$@"
  rc=$?
  if [ $rc -eq 0 ]; then echo "drift v2 complete"; exit 0; fi
  if [ $rc -ne 3 ]; then echo "drift v2 failed rc=$rc"; exit $rc; fi
done
echo "drift v2: chunk budget exhausted without finishing"
exit 1
