"""Kernel perf lab: time forward / value+grad for pruning engine variants.

Usage: python tools/perf_lab.py [variant ...]
Not part of the framework; a scratch harness for tuning the Pallas kernels.

Round-5 protocol rewrite (round-4 review: this harness used to time
UNPERTURBED repeated calls and reported a physically impossible
559 M patterns/s — execution-cache hits). It now shares bench.py's
variance-aware discipline: ``sustained`` chains perturbed evaluations
through one lax.scan dispatch (amortizing the remote-tunnel latency that
dominates per-call wall-clock), best of 3 repeats, fresh per-process salt
so no two invocations ever see identical inputs; ``timeit`` is the
dispatch-inclusive single-call counterpart. Both come from bench.py —
one protocol, no drift.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import sustained, timeit  # noqa: E402  (the shared protocol)
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


def report(name, dt):
    pps = N_PATTERNS / dt
    print(f"{name:44s} {dt*1e3:9.3f} ms  {pps/1e6:8.3f} M patterns/s")


def run_engine(engine):
    tlk = build(engine)
    space = tlk.param_space()
    params = space.init_params(dtype=jnp.float32)
    resolved = tlk.engine_name()
    tag = engine if engine == resolved else f"{engine}->{resolved}"
    report(f"{tag}: forward (sustained)",
           sustained(tlk.log_likelihood, params, n=64))
    report(f"{tag}: value+grad (sustained)",
           sustained(jax.value_and_grad(tlk.log_likelihood), params, n=64))
    report(f"{tag}: value+grad (single dispatch)",
           timeit(jax.jit(jax.value_and_grad(tlk.log_likelihood)),
                  params, n=10))


if __name__ == "__main__":
    variants = sys.argv[1:] or ["auto", "xla"]
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for v in variants:
        run_engine(v)
