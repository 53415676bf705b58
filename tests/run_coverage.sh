#!/usr/bin/env bash
# Test runner with coverage (reference test/run_coverage.sh equivalent).
set -e
cd "$(dirname "$0")/.."
if python -c "import coverage" 2>/dev/null; then
    python -m coverage run -m pytest tests/ -q "$@"
    python -m coverage report --include="fac_via_ppg_tpu/*"
else
    echo "coverage not installed; running plain pytest"
    python -m pytest tests/ -q "$@"
fi
