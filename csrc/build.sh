#!/bin/bash
# Build the native loader: produces pcseqlearning_tpu/lib/libnpy_loader.so
set -e
cd "$(dirname "$0")"
mkdir -p ../pcseqlearning_tpu/lib
g++ -O3 -shared -fPIC -std=c++17 -pthread npy_loader.cpp -o ../pcseqlearning_tpu/lib/libnpy_loader.so
echo "built ../pcseqlearning_tpu/lib/libnpy_loader.so"
