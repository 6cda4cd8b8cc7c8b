#!/bin/sh
# Build the native preprocessing library (no dependencies beyond libstdc++).
set -e
cd "$(dirname "$0")"
# -ffast-math at COMPILE only: linking with it pulls in crtfastmath.o,
# which sets FTZ/DAZ for the whole process at dlopen — silently flushing
# subnormals in the host's numpy/jax float arithmetic. Compile fast,
# link plain.
g++ -O3 -march=native -ffast-math -funroll-loops -fPIC -std=c++17 -pthread \
    -c preprocess.cpp -o preprocess.o
g++ -shared -pthread preprocess.o -o liblvpreprocess.so
rm -f preprocess.o
echo "built native/liblvpreprocess.so"
