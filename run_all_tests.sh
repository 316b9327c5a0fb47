#!/bin/sh
# Test runner (reference parity: run_all_tests.sh). `simple` skips the
# slower end-to-end suites.
set -e
cd "$(dirname "$0")"
if [ "$1" = "simple" ]; then
  exec python -m pytest tests/ -q \
    --ignore tests/test_cli_tools.py \
    --ignore tests/test_dp_inference.py \
    --ignore tests/test_training.py
fi
exec python -m pytest tests/ -q
