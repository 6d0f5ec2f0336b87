#!/bin/sh
# Build the native host-side audio library (csrc/evaudio.cpp).
set -e
cd "$(dirname "$0")/.."
mkdir -p easevoice_trainer_tpu/native
g++ -O3 -shared -fPIC -std=c++17 \
    csrc/evaudio.cpp \
    -o easevoice_trainer_tpu/native/libevaudio.so
echo "built easevoice_trainer_tpu/native/libevaudio.so"
