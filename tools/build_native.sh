#!/bin/bash
# Builds the native fast-IO shared object for the data loader.
set -eu
cd "$(dirname "$0")/.."
SRC=xmcgan_image_generation_tpu/data/_native/fastio.c
OUT=xmcgan_image_generation_tpu/data/_native/libfastio.so
cc -O3 -shared -fPIC -o "$OUT" "$SRC"
echo "built $OUT"
