#!/bin/sh
# Build the reference oracle (requires the reference mount + its build).
# 1) build libphyc without GSL:
#      cmake -S /root/reference -B /tmp/refbuild -DDISABLE_GSL=ON \
#            -DCMAKE_BUILD_TYPE=Release -GNinja && ninja -C /tmp/refbuild phyc
# 2) build the oracle:
set -e
cc -O2 -DGSL_DISABLED -o /tmp/reforacle "$(dirname "$0")/reforacle.c" \
   -I/root/reference/src -L/tmp/refbuild -Wl,-rpath,/tmp/refbuild -lphyc -lm
echo built /tmp/reforacle
