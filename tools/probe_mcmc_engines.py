"""Probe: vmapped 64-chain logP throughput per engine on the fluA
time-tree (the MCMC bench hot path)."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physher_tpu.config.builder import build_config, load_json

base = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
cfg = load_json(os.path.join(base, "jc69-time.json"))
ctx, _ = build_config(cfg, base_dir=base)
tlk = ctx.objects["treelikelihood"]
space = tlk.param_space()
params = space.init_params(dtype=jnp.float32)
print("auto-selected engine:", tlk.engine, "resolved:", tlk._resolve_engine()
      if hasattr(tlk, "_resolve_engine") else "?", flush=True)

n_chains = 64
u0 = space.flatten_unconstrained(space.unconstrain(params))
us = jnp.tile(u0, (n_chains, 1)) + 0.01 * jax.random.normal(
    jax.random.PRNGKey(0), (n_chains, u0.shape[0]), dtype=u0.dtype)


def target(z):
    up = space.unflatten_unconstrained(z)
    return tlk.log_likelihood(space.constrain(up))


from physher_tpu.models.treelikelihood import engine_override

import contextlib

for eng in ["auto", "xla", "pallas-fused", "pallas-staged", "pallas-loop"]:
    try:
        ctx_mgr = (contextlib.nullcontext() if eng == "auto"
                   else engine_override(eng))
        with ctx_mgr:
            f = jax.jit(jax.vmap(target))
            out = f(us)
            out.block_until_ready()
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(us)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / n
        print(f"{eng:14s} {dt*1e6:9.1f} us/call "
              f"({n_chains/dt:,.0f} evals/s) logP[0]={float(out[0]):.2f}",
              flush=True)
    except Exception as e:
        print(f"{eng:14s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
