#!/bin/bash
# Build the diffphycon native IO library.
set -e
cd "$(dirname "$0")"
mkdir -p ../diffphycon_tpu/utils/_native
g++ -O3 -shared -fPIC -std=c++17 -o ../diffphycon_tpu/utils/_native/libdiffphycon_io.so \
    io/npy_loader.cc -lz -lpthread
echo "built diffphycon_tpu/utils/_native/libdiffphycon_io.so"
