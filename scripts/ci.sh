#!/usr/bin/env bash
# CI runner (capability of the reference's ci/run.sh): native build, full
# CPU test suite on a virtual 8-device mesh, graft-entry compile checks,
# and a bench smoke (CPU unless a TPU is attached).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
./scripts/build_native.sh

echo "== install =="
pip install -e . --no-build-isolation --no-deps -q

echo "== lint =="
python scripts/lint.py

echo "== tests (8-device virtual CPU mesh) =="
python -m pytest tests/ -q -x

echo "== docs drift (NOTES.md headline vs collected tests) =="
python scripts/check_docs_drift.py

echo "== graft entry: single-chip compile + multichip dryrun =="
N_DEVICES=8 python __graft_entry__.py

echo "== done =="
