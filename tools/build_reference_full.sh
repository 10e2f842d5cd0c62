#!/bin/sh
# Build the FULL reference physher binary (VB/MCMC/optimizer paths included)
# against tools/gslshim — the image has no GSL, and the reference's
# DISABLE_GSL build drops every estimator (CMakeLists.txt:223-295).
# Produces /tmp/physher_full, used to mint golden fixtures (ELBO, timing
# baselines) from the reference's own examples.
set -e
DIR="$(cd "$(dirname "$0")" && pwd)"
# PhyCConfig.h is cmake-generated; reuse the DISABLE_GSL build's copy
# (cmake -S /root/reference -B /tmp/refbuild -DDISABLE_GSL=ON -GNinja)
cc -O2 -DNDEBUG -I "$DIR/gslshim" -I /tmp/refbuild -I /root/reference/src \
   -o /tmp/physher_full \
   /root/reference/src/phyc/*.c /root/reference/src/physher.c \
   "$DIR/gslshim/gslshim.c" -lm -lpthread
echo built /tmp/physher_full
