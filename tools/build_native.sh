#!/bin/sh
# Build the native host-ops library (smirk_tpu/native/libfastops.so).
set -e
cd "$(dirname "$0")/.."
# -ffp-contract=off: GCC's default fma contraction perturbs double rounding
# at exact .5 interpolation ties, breaking bit-equality between clahe_u8 and
# its numpy oracle (tests assert exact match)
g++ -O3 -march=native -ffp-contract=off -shared -fPIC -pthread \
    smirk_tpu/native/fastops.cpp \
    -o smirk_tpu/native/libfastops.so
echo "built smirk_tpu/native/libfastops.so"
