#!/bin/sh
# Build the native golden decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -fopenmp -std=c++17 -o libpolar_ref.so polar_ref.cpp
echo "built $(pwd)/libpolar_ref.so"
