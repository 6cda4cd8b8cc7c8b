#!/bin/sh
# Build the native preprocessing library (no dependencies beyond libstdc++).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -funroll-loops -shared -fPIC -std=c++17 -pthread \
    preprocess.cpp -o liblvpreprocess.so
echo "built native/liblvpreprocess.so"
