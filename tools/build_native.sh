#!/bin/sh
# Build the native cocomask library (RLE codec + mask IoU + polygon fill).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/cocomask/cocomask.cpp -o build/libcocomask.so
echo "built build/libcocomask.so"
