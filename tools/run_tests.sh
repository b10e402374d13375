#!/bin/bash
# Chunked test runner: one pytest process per file so an XLA:CPU compiler
# segfault (a known flake on this box) only loses that file's run.
# Usage: tools/run_tests.sh [extra pytest args...]
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ecc_tests
SUMMARY=/tmp/tpu_ecc_tests/summary.txt
: > "$SUMMARY"
run_chunk() {  # run_chunk <name> <log> [pytest args...]
    local name="$1" log="$2"; shift 2
    env PALLAS_AXON_POOL_IPS= timeout 7200 python -u -m pytest -q \
        -m "not slow" -p no:cacheprovider "$@" > "$log" 2>&1
    local rc=$?
    local tailline
    tailline=$(grep -E "passed|failed|error" "$log" | tail -1)
    echo "$name: rc=$rc $tailline" | tee -a "$SUMMARY"
}

for f in tests/test_*.py; do
    name=$(basename "$f" .py)
    if [ "$name" = "test_ecdsa" ]; then
        # two processes: the XLA:CPU compiler deterministically segfaults on
        # this box when the p192-verify compile follows the 12 prior tests'
        # compiles in ONE process (accumulated compiler state; 125GB free,
        # not OOM) — each half is green in a fresh process.
        run_chunk "$name.a" "/tmp/tpu_ecc_tests/$name.a.log" "$f" \
            -k "not recovery_vectors and not ethereum and not der_strictness and not p192" "$@"
        run_chunk "$name.b" "/tmp/tpu_ecc_tests/$name.b.log" "$f" \
            -k "recovery_vectors or ethereum or der_strictness or p192" "$@"
        continue
    fi
    run_chunk "$name" "/tmp/tpu_ecc_tests/$name.log" "$f" "$@"
done
echo "==== summary ===="
cat "$SUMMARY"
