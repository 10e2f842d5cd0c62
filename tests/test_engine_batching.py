"""Batched (vmap) likelihood parity for every Pallas engine.

Round-3 shipped with vmap of a scalar-prefetch ``pallas_call`` silently
miscomputing on TPU; the engines now intercept batching structurally
(``jax.custom_batching``): the fused kernel lowers vmap onto its leading
grid axis, staged/loop lower to a correct sequential loop. These tests pin
vmapped logP/grad == per-chain unbatched values for each engine, including
the ``vmap(jit(f))`` nesting that defeats tracer sniffing (a jitted callable
is staged without batch tracers and batched at the jaxpr level).

Reference contract: chain/ladder batching replaces the reference's
sequential temperature ladder (src/phyc/mmcmc.c:48-88) and single-chain
MCMC loop (src/phyc/mcmc.c:60-185).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.ops.pruning import pad_patterns, tree_log_likelihood
from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern


def _setup(n_tips=8, n_sites=80, C=4, S=4, datatype="nucleotide", seed=0,
           tile=256):
    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, n_sites, seed=seed, datatype=datatype)
    P = pad_patterns(sp.pattern_count, tile)
    tips = sp.tip_partials(pad_to=P, dtype=np.float32)
    tips = jnp.asarray(tips[[sp.taxa.index(t) for t in topo.taxa]])
    rng = np.random.default_rng(seed)
    Q = rng.random((4, topo.N, C, S, S)).astype(np.float32) + 0.1
    pms = jnp.asarray(Q / Q.sum(-1, keepdims=True))   # batch of 4
    fr = rng.random(S).astype(np.float32)
    freqs = jnp.asarray(fr / fr.sum())
    props = jnp.asarray(np.full(C, 1.0 / C, np.float32))
    w = jnp.asarray(np.asarray(sp.padded_weights(P), np.float32))
    return topo, tips, pms, freqs, props, w


def _engine_fn(name, topo, tips, freqs, props, w):
    if name == "fused":
        from physher_tpu.ops.pallas_fused import fused_site_log

        return lambda pm: jnp.sum(w * fused_site_log(
            tips, pm, topo, freqs, props, interpret=True))
    if name == "staged":
        from physher_tpu.ops.pallas_staged import staged_site_log

        return lambda pm: jnp.sum(w * staged_site_log(
            tips, pm, topo, freqs, props, interpret=True))
    from physher_tpu.ops.pallas_pruning_loop import loop_tree_log_likelihood

    return lambda pm: loop_tree_log_likelihood(
        tips, pm, topo, freqs, props, w, rescale=True, interpret=True)[0]


@pytest.mark.parametrize("engine", ["fused", "staged", "loop"])
def test_vmap_forward_and_grad_parity(engine):
    topo, tips, pms, freqs, props, w = _setup()
    f = _engine_fn(engine, topo, tips, freqs, props, w)
    single = jnp.stack([f(pm) for pm in pms])
    batched = jax.vmap(f)(pms)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-6)
    g_single = jnp.stack([jax.grad(f)(pm) for pm in pms])
    g_batched = jax.vmap(jax.grad(f))(pms)
    np.testing.assert_allclose(np.asarray(g_batched),
                               np.asarray(g_single), rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("engine", ["fused", "staged", "loop"])
def test_vmap_of_jit_parity(engine):
    """vmap(jit(f)): pjit stages f without batch tracers, then batches the
    jaxpr — the exact nesting the round-3 tracer check could not see."""
    topo, tips, pms, freqs, props, w = _setup()
    f = _engine_fn(engine, topo, tips, freqs, props, w)
    single = jnp.stack([f(pm) for pm in pms])
    batched = jax.vmap(jax.jit(f))(pms)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-6)


def test_vmap_csplit_protein():
    """Category-split mode (S=20): batch axis flattens into the same
    leading grid axis as the category split."""
    from physher_tpu.ops.pallas_fused import fused_site_log

    topo, tips, pms, freqs, props, w = _setup(
        S=20, datatype="aminoacid", n_sites=50, tile=128)
    f = lambda pm: jnp.sum(w * fused_site_log(
        tips, pm, topo, freqs, props, interpret=True))
    single = jnp.stack([f(pm) for pm in pms])
    np.testing.assert_allclose(np.asarray(jax.vmap(f)(pms)),
                               np.asarray(single), rtol=1e-6)
    g_single = jnp.stack([jax.grad(f)(pm) for pm in pms])
    g_batched = jax.vmap(jax.grad(f))(pms)
    np.testing.assert_allclose(np.asarray(g_batched), np.asarray(g_single),
                               rtol=1e-5, atol=1e-8)


def test_vmap_treelikelihood_forced_fused():
    """End-to-end: vmapped TreeLikelihood.log_likelihood over a batch of
    parameter pytrees (the MCMC chain layout) matches per-chain values with
    the fused engine forced."""
    from physher_tpu.models.sitemodel import GammaSiteModel
    from physher_tpu.models.substitution import HKY
    from physher_tpu.models.treelikelihood import TreeLikelihood

    topo = balanced_topology(8)
    sp = random_sitepattern(8, 60, seed=3)
    kw = dict(site_model=GammaSiteModel(4), pattern_pad_multiple=256,
              dtype=jnp.float32)
    t_f = TreeLikelihood(sp, topo, HKY(), engine="pallas-fused", **kw)
    t_x = TreeLikelihood(sp, topo, HKY(), engine="xla", **kw)
    space = t_f.param_space()
    p0 = space.init_params(dtype=jnp.float32)
    u0 = space.flatten_unconstrained(space.unconstrain(p0))
    us = u0[None, :] + 0.05 * jnp.asarray(
        np.random.default_rng(0).normal(size=(5, u0.shape[0])),
        dtype=jnp.float32)

    def logp(tlk):
        def f(u):
            return tlk.log_likelihood(
                space.constrain(space.unflatten_unconstrained(u)))
        return f

    batched = jax.vmap(logp(t_f))(us)
    single = jnp.stack([logp(t_f)(u) for u in us])
    ref = jnp.stack([logp(t_x)(u) for u in us])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                               rtol=1e-5)
