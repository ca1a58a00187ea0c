#!/usr/bin/env bash
# Round-start health check. The test-data generator REGENERATES
# /root/testdata between rounds and has changed physical details before
# (round 1→2: events.ts ns→µs, which silently broke 16 event queries).
# Run this FIRST each round:
#   1. fixture tripwire — footer schemas vs io.SCHEMAS (seconds)
#   2. full oracle-differential gate at the driver's sf0.01 (~10 min)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_fixture_schemas.py -q
python scripts/verify_contract.py /root/testdata/sf0.01
