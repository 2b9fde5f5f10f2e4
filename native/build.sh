#!/bin/sh
# Build the native host-ops shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libcfun_host.so host_ops.cc
echo "built $(pwd)/libcfun_host.so"
