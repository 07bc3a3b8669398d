#!/bin/sh
# Build the Apple Intelligence shim dylib (macOS arm64 only; needs a
# macOS 26+ SDK for FoundationModels — on older SDKs the shim still
# builds and reports unavailable).
#
#   ./build_apple_llm.sh [outdir]
#
# spittle_tpu/shell/apple_llm.py finds the result next to this script,
# or wherever SPITTLE_APPLE_LLM_DYLIB points.
set -eu
cd "$(dirname "$0")"
out="${1:-.}"
exec swiftc -O -emit-library \
    -o "$out/libspittle_apple_llm.dylib" \
    apple_intelligence.swift
