#!/bin/sh
# Build the native data-loading runtime (see vf_native.cpp).
# Compiles to a unique temp name and atomically renames into place so
# concurrent builders (e.g. multi-process training starting fresh on a new
# machine) never dlopen a half-written .so.
set -e
cd "$(dirname "$0")"
tmp="libvf_native.so.$$.tmp"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o "$tmp" \
    vf_native.cpp -ljpeg -lpng -lpthread
mv -f "$tmp" libvf_native.so
echo "built $(pwd)/libvf_native.so"
