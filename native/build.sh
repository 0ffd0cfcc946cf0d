#!/bin/sh
# Build the native libraries. Idempotent; called lazily from the Python
# bindings (ratatosk_tpu/io/native.py, ratatosk_tpu/ops/native_align.py)
# when a .so is missing or stale. Optional arg limits to one target:
#   build.sh [fastx|align|kmers]
set -e
cd "$(dirname "$0")"
CXX="${CXX:-g++}"
want="${1:-all}"
if [ "$want" = "all" ] || [ "$want" = "kmers" ]; then
  $CXX -O3 -march=native -shared -fPIC -std=c++17 kmers.cpp -o libkmers.so -lpthread
  echo "built $(pwd)/libkmers.so"
fi
if [ "$want" = "all" ] || [ "$want" = "fastx" ]; then
  $CXX -O3 -march=native -shared -fPIC -std=c++17 fastx.cpp -o libfastx.so -lz
  echo "built $(pwd)/libfastx.so"
fi
if [ "$want" = "all" ] || [ "$want" = "align" ]; then
  $CXX -O3 -march=native -shared -fPIC -std=c++17 align.cpp -o libralign.so
  echo "built $(pwd)/libralign.so"
fi
