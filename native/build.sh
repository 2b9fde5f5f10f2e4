#!/bin/sh
# Build the native host-ops shared library.
#
# -march=native: the kernels leans on autovectorization (AVX-512 where
# available), so the artifact is HOST-SPECIFIC.  cfun_tpu/native.py
# rebuilds when the CPU fingerprint recorded in .buildinfo changes -- a
# .so carried over from a different microarchitecture either runs the
# slow generic code path (observed 1.9x slower LiTS mold) or traps on
# unsupported instructions.  Build to a temp file + rename so concurrent
# builders/loaders never see a half-written library.
set -e
cd "$(dirname "$0")"
tmp="libcfun_host.so.tmp.$$"
g++ -O3 -march=native -fopenmp -shared -fPIC -o "$tmp" host_ops.cc
mv -f "$tmp" libcfun_host.so
echo "built $(pwd)/libcfun_host.so"
