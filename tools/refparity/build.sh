#!/bin/sh
# Build the reference decoder core (datemoon/ASR-decoder, /root/reference)
# Kaldi-free, plus our parity main, into $1/refparity_main.
#
# Two reference headers do not compile under modern g++; they are copied
# into a shadow include dir at BUILD TIME (never committed) and patched:
#   * src/itf/decodable-itf.h:105  `typedef typename X Y` -> `typedef X Y`
#   * src/newfst/weigth.h:97-122   `operator==<float>(w1,w2)` calls ->
#     direct Value() comparisons (GCC rejects the explicit-template-arg
#     call to a not-yet-declared overload set)
set -e
OUT=${1:?usage: build.sh OUTDIR [REF_ROOT]}
REF=${2:-/root/reference}
SRC=$(dirname "$0")
mkdir -p "$OUT/shadow/src/itf" "$OUT/shadow/src/newfst"

sed 's/typedef typename DecodableInterface AmInterface;/typedef DecodableInterface AmInterface;/' \
    "$REF/src/itf/decodable-itf.h" > "$OUT/shadow/src/itf/decodable-itf.h"
sed -e 's/return operator==<float>(w1, w2);/return w1.Value() == w2.Value();/' \
    -e 's/return operator==<double>(w1, w2);/return w1.Value() == w2.Value();/' \
    -e 's/return operator!=<float>(w1, w2);/return !(w1.Value() == w2.Value());/' \
    -e 's/return operator!=<double>(w1, w2);/return !(w1.Value() == w2.Value());/' \
    "$REF/src/newfst/weigth.h" > "$OUT/shadow/src/newfst/weigth.h"

g++ -std=c++11 -O2 -o "$OUT/refparity_main" \
    -DVERSION='"parity"' \
    -I"$OUT/shadow" -I"$REF" \
    "$SRC/main.cc" \
    "$REF/src/my-decoder/lattice-faster-decoder.cc" \
    "$REF/src/newfst/lattice-fst.cc" \
    "$REF/src/newfst/lattice-functions.cc" \
    "$REF/src/newfst/lattice-determinize-api.cc" \
    "$REF/src/newfst/lattice-to-nbest.cc" \
    "$REF/src/newfst/connect-fst.cc" \
    "$REF/src/newfst/invert.cc" \
    "$REF/src/newfst/reverse.cc" \
    "$REF/src/newfst/topsort.cc" \
    "$REF/src/newfst/dfs-visit-fst.cc" \
    "$REF/src/util/log-message.cc"
