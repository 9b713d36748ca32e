#!/usr/bin/env bash
# Run the test suite with per-file process isolation.
#
# The jaxlib CPU backend segfaults intermittently after ~30 large compiles
# in one process (upstream bug; every test passes in isolation). One pytest
# process per test file keeps each process under the threshold and makes a
# crash attributable. Exit code is non-zero if any file fails.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    if ! python -m pytest "$f" -q -o addopts=""; then
        echo "FAILED: $f"
        fail=1
    fi
done
exit $fail
