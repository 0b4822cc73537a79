#!/bin/sh
# Build the native helpers into proxsdp_tpu/utils/_native.so
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o ../proxsdp_tpu/utils/_native.so parse_sdpa.cpp
echo "built proxsdp_tpu/utils/_native.so"
