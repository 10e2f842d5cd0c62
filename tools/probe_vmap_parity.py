"""Per-engine vmap parity probe on the fluA time-tree model: compares
per-chain logP unbatched (trusted, parity-tested) vs vmapped, per engine.

Round 3 used this to diagnose the ~54-logP-unit vmap-of-pallas_call
miscompute; since round 4 the engines batch structurally (fused: leading
grid axis; staged/loop: sequential_vmap), so every row should agree.
``engine_override`` honors every engine name, so each row probes the
engine it claims.
"""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physher_tpu.config.builder import build_config, load_json
from physher_tpu.models.treelikelihood import engine_override

base = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
cfg = load_json(os.path.join(base, "jc69-time.json"))
ctx, _ = build_config(cfg, base_dir=base)
tlk = ctx.objects["treelikelihood"]
space = tlk.param_space()
params = space.init_params(dtype=jnp.float32)

u0 = space.flatten_unconstrained(space.unconstrain(params))
us = jnp.tile(u0, (4, 1)) + 0.01 * jax.random.normal(
    jax.random.PRNGKey(0), (4, u0.shape[0]), dtype=u0.dtype)


def target(z):
    up = space.unflatten_unconstrained(z)
    return tlk.log_likelihood(space.constrain(up))


for eng in ["auto", "xla", "pallas-fused", "pallas-staged", "pallas-loop"]:
    with engine_override(eng):
        unb = [float(jax.jit(target)(us[i])) for i in range(4)]
        vm = [float(v) for v in jax.jit(jax.vmap(target))(us)]
    worst = max(abs(a - b) for a, b in zip(unb, vm))
    print(f"{eng:14s} unbatched {['%.2f' % v for v in unb]}", flush=True)
    print(f"{eng:14s} vmapped   {['%.2f' % v for v in vm]}"
          f"  max|diff|={worst:.4g}", flush=True)
