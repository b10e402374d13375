#!/bin/bash
# CI-equivalent gate (the reference's per-crate .github workflows analogue).
# What must be green before a round ships:
#   tools/ci.sh            default matrix (chunked) + multi-chip dryrun
#   tools/ci.sh --slow     adds the full conformance matrix (-m slow)
# Benches (real chip): python bench.py --full  (records BENCHES.json)
set -u
cd "$(dirname "$0")/.."
fail=0

if [ "${1:-}" = "--drive" ]; then
    echo "== end-to-end public-API drive (tools/drive.py, CPU) =="
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax-cpu" \
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.0 \
        timeout 3600 python -u tools/drive.py || fail=1
    [ $fail -eq 0 ] && echo "DRIVE GREEN" || echo "DRIVE RED"
    exit $fail
fi

if [ "${1:-}" = "--tpu" ]; then
    echo "== real-TPU kernel gate (tests/test_tpu_kernels.py) =="
    env TPU_ECC_TPU_TESTS=1 timeout 7200 python -u -m pytest \
        tests/test_tpu_kernels.py -q -m tpu -p no:cacheprovider || fail=1
    [ $fail -eq 0 ] && echo "TPU GATE GREEN" || echo "TPU GATE RED"
    exit $fail
fi

echo "== default test matrix (chunked per file; see tools/run_tests.sh) =="
bash tools/run_tests.sh || fail=1
grep -E "rc=[0-9]+" /tmp/tpu_ecc_tests/summary.txt | grep -vE "rc=(0|5) ?" | grep -q . && fail=1

if [ "${1:-}" = "--slow" ]; then
    echo "== slow conformance matrix =="
    bash tools/run_tests.sh -m "slow" || fail=1
    # rc=5 = "no tests collected" (file has no slow tests) — not a failure
    grep -E "rc=[0-9]+" /tmp/tpu_ecc_tests/summary.txt | grep -vE "rc=(0|5) ?" | grep -q . && fail=1
fi

echo "== multi-chip dryrun (8 virtual CPU devices) =="
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" \
    timeout 600 python -u -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun OK')
" || fail=1

[ $fail -eq 0 ] && echo "CI GREEN" || echo "CI RED"
exit $fail
