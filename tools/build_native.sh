#!/bin/sh
# Build the native host-ops library (smirk_tpu/native/libfastops.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -pthread \
    smirk_tpu/native/fastops.cpp \
    -o smirk_tpu/native/libfastops.so
echo "built smirk_tpu/native/libfastops.so"
