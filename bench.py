"""Benchmark: GTR+Gamma(4) tree-likelihood value+gradient throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: site-patterns/s/chip of full value+gradient evaluation of a
GTR+Gamma(4) time-tree likelihood (128 taxa) — the BASELINE.json primary
metric ("site-patterns/s/chip (GTR+G pruning)").

Baseline: the reference C implementation (4ment/physher) measured on this
machine via its own harness (examples/benchmarking.c built from
/root/reference, run on fluA 69 taxa / 238 patterns, single core + SSE):
GTR evaluation 12.4 ms + analytic gradient 354.0 ms per call =>
238 / 0.3664 s = 650 patterns/s for value+gradient — with a SINGLE rate
category (the TPU run below does 4x that work per pattern with Gamma(4),
so vs_baseline is conservative).
"""

from __future__ import annotations

import json
import time

import numpy as np

PHYSHER_CPU_PATTERNS_PER_SEC = 650.0  # measured; see module docstring


def build(n_tips: int, n_patterns: int, dtype):
    import jax.numpy as jnp

    from physher_tpu.models.clock import StrictClock
    from physher_tpu.models.sitemodel import GammaSiteModel
    from physher_tpu.models.substitution import GTR
    from physher_tpu.models.treelikelihood import TreeLikelihood
    from physher_tpu.trees.timetree import TimeTreeData
    from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern

    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, n_patterns, seed=7)
    heights = np.zeros(topo.N)
    for k in range(topo.I):
        cs = topo.children[k, : topo.child_count[k]]
        heights[topo.T + k] = heights[cs].max() + 0.5
    td = TimeTreeData.from_heights(topo, heights)
    tlk = TreeLikelihood(
        sp, topo, GTR(), GammaSiteModel(4),
        clock=StrictClock(topo.N, rate_init=1e-2), time_data=td,
        rescale=True, pattern_pad_multiple=128, dtype=dtype,
    )
    return tlk


def main():
    import jax
    import jax.numpy as jnp

    n_tips = 128
    n_patterns = 16384
    tlk = build(n_tips, n_patterns, jnp.float32)
    space = tlk.param_space()
    params = space.init_params(dtype=jnp.float32)

    value_and_grad = jax.jit(jax.value_and_grad(tlk.log_likelihood))
    # warmup/compile
    val, grad = value_and_grad(params)
    jax.block_until_ready((val, grad))

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        val, grad = value_and_grad(params)
    jax.block_until_ready((val, grad))
    dt = (time.perf_counter() - t0) / n_iter

    patterns_per_sec = n_patterns / dt
    result = {
        "metric": "site-patterns/s/chip (GTR+G pruning)",
        "value": round(patterns_per_sec, 1),
        "unit": "patterns/s (value+grad, 128 taxa, Gamma4)",
        "vs_baseline": round(patterns_per_sec / PHYSHER_CPU_PATTERNS_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
