"""Which engine is wrong under vmap? Compare per-chain logP:
unbatched (trusted, parity-tested) vs vmapped, per engine."""
import contextlib
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


for eng in ["xla", "pallas-fused"]:
    with (contextlib.nullcontext() if eng == "auto"
          else engine_override(eng)):
        unb = [float(jax.jit(target)(us[i])) for i in range(4)]
        vm = [float(v) for v in jax.jit(jax.vmap(target))(us)]
    print(f"{eng:14s} unbatched {['%.2f' % v for v in unb]}", flush=True)
    print(f"{eng:14s} vmapped   {['%.2f' % v for v in vm]}", flush=True)
