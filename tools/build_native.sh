#!/bin/sh
# Build the native host-ops library (smirk_tpu/native/libfastops.so).
set -e
cd "$(dirname "$0")/.."
# -ffp-contract=off: GCC's default fma contraction perturbs double rounding
# at exact .5 interpolation ties, breaking bit-equality between clahe_u8 and
# its numpy oracle (tests assert exact match)
# Build to a temp file and mv: linking straight onto the .so truncates the
# inode under any RUNNING process that already mapped it (observed: segfault
# in an unrelated jitted step mid-pytest during a rebuild, 2026-08-19).
g++ -O3 -march=native -ffp-contract=off -shared -fPIC -pthread \
    smirk_tpu/native/fastops.cpp \
    -o smirk_tpu/native/libfastops.so.tmp
mv smirk_tpu/native/libfastops.so.tmp smirk_tpu/native/libfastops.so
echo "built smirk_tpu/native/libfastops.so"
