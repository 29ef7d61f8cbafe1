#!/bin/sh
# Build the native data-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    dataloader.cc \
    -lopencv_imgcodecs -lopencv_imgproc -lopencv_core \
    -o libdfv_dataloader.so
echo "built native/libdfv_dataloader.so"
