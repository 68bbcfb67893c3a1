#!/usr/bin/env bash
# End-of-round cold-start seeding: populate omni_tpu/_warmcache with the
# persistent-cache entries of EXACTLY the executables bench.py compiles at
# the current HEAD, then verify a fresh default-env process starts warm.
#
# Run on the TPU chip with the source FROZEN (any traced-code change
# invalidates the keys). Commits nothing; inspect + git add after.
set -e
cd "$(dirname "$0")/.."
SEED=omni_tpu/_warmcache
echo "== seeding $SEED from bench.py (cold run, full compiles) =="
OMNI_COMPILE_CACHE="$PWD/$SEED" python bench.py 2>&1 | tail -6
echo "== seed contents =="
ls "$SEED" | grep -c -- '-cache' || true
du -sh "$SEED"
echo "== verification: fresh default-env process (should pick the seed) =="
python bench.py 2>&1 | grep -E "prefill incl|warm turn|kv-bucket|warm prefill|metric"
