#!/bin/bash
# Chunked test runner: one pytest process per file so an XLA:CPU compiler
# segfault (a known flake on this box) only loses that file's run.
# Usage: tools/run_tests.sh [extra pytest args...]
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_ecc_tests
SUMMARY=/tmp/tpu_ecc_tests/summary.txt
: > "$SUMMARY"
for f in tests/test_*.py; do
    name=$(basename "$f" .py)
    log="/tmp/tpu_ecc_tests/$name.log"
    env PALLAS_AXON_POOL_IPS= timeout 7200 python -u -m pytest "$f" -q \
        -m "not slow" -p no:cacheprovider "$@" > "$log" 2>&1
    rc=$?
    tailline=$(grep -E "passed|failed|error" "$log" | tail -1)
    echo "$name: rc=$rc $tailline" | tee -a "$SUMMARY"
done
echo "==== summary ===="
cat "$SUMMARY"
