#!/bin/sh
# Build the native host-data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libnsbatch.so batch_sampler.cpp
echo "built native/libnsbatch.so"
