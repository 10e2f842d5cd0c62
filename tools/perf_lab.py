"""Kernel perf lab: time forward / value+grad for pruning engine variants.

Usage: python tools/perf_lab.py [variant ...]
Not part of the framework; a scratch harness for tuning the Pallas kernels.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern
from physher_tpu.models.substitution import GTR
from physher_tpu.models.sitemodel import GammaSiteModel
from physher_tpu.models.clock import StrictClock
from physher_tpu.models.treelikelihood import TreeLikelihood
from physher_tpu.trees.timetree import TimeTreeData

N_TIPS = 128
N_PATTERNS = 16384


def build(engine="auto"):
    topo = balanced_topology(N_TIPS)
    sp = random_sitepattern(N_TIPS, N_PATTERNS, seed=7)
    heights = np.zeros(topo.N)
    for k in range(topo.I):
        cs = topo.children[k, : topo.child_count[k]]
        heights[topo.T + k] = heights[cs].max() + 0.5
    td = TimeTreeData.from_heights(topo, heights)
    return TreeLikelihood(
        sp, topo, GTR(), GammaSiteModel(4),
        clock=StrictClock(topo.N, rate_init=1e-2), time_data=td,
        rescale=True, pattern_pad_multiple=128, dtype=jnp.float32,
        engine=engine,
    )


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def report(name, dt):
    pps = N_PATTERNS / dt
    print(f"{name:36s} {dt*1e3:9.3f} ms  {pps/1e6:8.3f} M patterns/s")


def run_engine(engine):
    tlk = build(engine)
    space = tlk.param_space()
    params = space.init_params(dtype=jnp.float32)
    f = jax.jit(tlk.log_likelihood)
    vg = jax.jit(jax.value_and_grad(tlk.log_likelihood))
    report(f"{engine}: forward", timeit(f, params))
    report(f"{engine}: value+grad", timeit(vg, params))


if __name__ == "__main__":
    variants = sys.argv[1:] or ["auto", "xla"]
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for v in variants:
        run_engine(v)
