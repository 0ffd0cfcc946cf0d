#!/bin/sh
# Build the native IO library. Idempotent; called lazily from
# ratatosk_tpu/io/native.py when libfastx.so is missing or stale.
set -e
cd "$(dirname "$0")"
CXX="${CXX:-g++}"
$CXX -O3 -march=native -shared -fPIC -std=c++17 fastx.cpp -o libfastx.so -lz
echo "built $(pwd)/libfastx.so"
