#!/bin/bash
# Pre-warm the repo-local persistent JAX compile cache for the driver's
# multi-chip dryrun (__graft_entry__.dryrun_multichip). The driver runs the
# dryrun with cache WRITES disabled (serializing some large XLA:CPU
# executables segfaults this XLA build, and the driver's run must not crash);
# this script runs the identical program with writes enabled so the driver's
# compile becomes a cache read. Re-run after touching anything on the MSM
# path (fe.py/points.py/scalarmul.py/msm.py/__graft_entry__.py).
cd "$(dirname "$0")/.."
N=${1:-8}
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=$N" \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.0 \
    PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" \
    timeout 1800 python -u -c "
import time; t0 = time.time()
import __graft_entry__ as g
g.dryrun_multichip($N)
print('prewarm dryrun OK in %.1fs' % (time.time() - t0))
"
