#!/bin/sh
# Build the zxc-tpu WASM module (requires emscripten's emcc on PATH).
set -e
cd "$(dirname "$0")"
emcc -O3 wasm_entry.c ../../zxc_tpu/runtime/zxc_host.cpp \
  -I../../include \
  -sMODULARIZE=1 -sEXPORT_ES6=1 -sALLOW_MEMORY_GROWTH=1 \
  -sEXPORTED_RUNTIME_METHODS=HEAPU8,_malloc,_free \
  -o zxc_wasm_core.js
echo "built zxc_wasm_core.js + zxc_wasm_core.wasm"
