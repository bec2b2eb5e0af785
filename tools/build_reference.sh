#!/bin/sh
# Build the reference parse-examl + examl (SSE3) binaries serially into
# .refbuild/ using the single-rank MPI shim, for golden-number runs.
# Usage: tools/build_reference.sh
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(dirname "$HERE")
REF=/root/reference
OUT=$REPO/.refbuild
mkdir -p "$OUT/examl" "$OUT/parser"

# fake mpi.h via include path
mkdir -p "$OUT/mpishim"
cp "$HERE/mpi_shim.h" "$OUT/mpishim/mpi.h"

cp "$REF"/examl/*.c "$REF"/examl/*.h "$OUT/examl/"
mkdir -p "$OUT/versionHeader"
cp "$REF"/versionHeader/version.h "$OUT/versionHeader/"
cd "$OUT/examl"
gcc -O2 -msse3 -D__SIM_SSE3 -D_GNU_SOURCE -D_OPTIMIZED_FUNCTIONS \
    -I"$OUT/mpishim" -I"$OUT" -o "$OUT/examl.bin" \
    axml.c optimizeModel.c trash.c searchAlgo.c topologies.c treeIO.c \
    models.c evaluatePartialGenericSpecial.c evaluateGenericSpecial.c \
    newviewGenericSpecial.c makenewzGenericSpecial.c byteFile.c \
    partitionAssignment.c communication.c quartets.c bipartitionList.c \
    restartHashTable.c -lm

cp "$REF"/parser/*.c "$REF"/parser/*.h "$OUT/parser/"
cd "$OUT/parser"
gcc -O2 -msse3 -D__SIM_SSE3 -D_GNU_SOURCE -o "$OUT/parser.bin" \
    axml.c parsePartitions.c -lm

echo "built: $OUT/examl.bin $OUT/parser.bin"
