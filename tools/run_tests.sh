#!/usr/bin/env bash
# Run the test suite with per-file process isolation.
#
# The jaxlib CPU backend segfaults intermittently after ~30 large compiles
# in one process (upstream bug; every test passes in isolation). One pytest
# process per test file keeps each process under the threshold and makes a
# crash attributable. Exit code is non-zero if any file fails.
# FAST mode (default): skips the interpret-mode mega parity tests
# (pytest marker slow_interpret — minutes per test on the CPU backend);
# FULL=1 runs everything (nightly).
set -u
cd "$(dirname "$0")/.."
MARK=${FULL:+""}
if [ -z "${FULL:-}" ]; then
    MARK='-m not slow_interpret'
fi
fail=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    # shellcheck disable=SC2086
    if ! python -m pytest "$f" -q -o addopts="" ${MARK:+-m "not slow_interpret"}; then
        echo "FAILED: $f"
        fail=1
    fi
done
exit $fail
