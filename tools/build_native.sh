#!/bin/sh
# Build the native libraries: cocomask (RLE codec + mask IoU + polygon
# rasterization) and the data-pipeline prep kernel.
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/cocomask/cocomask.cpp -o build/libcocomask.so
echo "built build/libcocomask.so"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/pipeline/prep.cpp -o build/libprep.so -ljpeg
echo "built build/libprep.so"
