#!/usr/bin/env bash
# Build libomni_native.so into native/build/ (picked up by
# omni_tpu.native_ext; everything degrades to the numpy paths without it).
set -euo pipefail
cd "$(dirname "$0")/../native"
cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release "$@" >/dev/null
cmake --build build
echo "built: $(ls build/libomni_native.so)"
