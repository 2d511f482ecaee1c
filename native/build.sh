#!/bin/sh
# Build the native data-loading runtime (see vf_native.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libvf_native.so \
    vf_native.cpp -ljpeg -lpng -lpthread
echo "built $(pwd)/libvf_native.so"
