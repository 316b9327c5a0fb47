#!/bin/sh
# Builds the native IO fast-path shared library (ctypes-loaded).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -pthread -o libdcio.lib.so bgzf_ext.cc -lz
echo "built $(pwd)/libdcio.lib.so"
