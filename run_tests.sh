#!/usr/bin/env bash
# Run the test suite with one pytest process per test file.
#
# A single long pytest process accumulates hundreds of XLA:CPU executables
# and has been observed to segfault deep into the run (tests that pass in
# isolation crash after ~60 prior tests); per-file processes isolate that
# and parallelize trivially. Usage: ./run_tests.sh [pytest args...]
set -u
cd "$(dirname "$0")"
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    if ! python -m pytest "$f" -q "$@"; then
        fail=1
    fi
done
exit $fail
