"""Staged block-diagonal Pallas kernel: parity with the XLA path (interpret
mode on CPU). Covers forward values, the remat-free spilled-stage backward
(d pmats / d freqs / d props), uneven tree shapes, end-to-end TreeLikelihood
selection, and jit of value_and_grad (the optimizer-facing composition).
Reference hot path: src/phyc/treelikelihood4.c, treelikelihood.c:1454-1735,
gradients treelikelihood.c:2129-3100.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern
from physher_tpu.ops.pruning import tree_log_likelihood, pad_patterns
from physher_tpu.ops.pallas_staged import (
    staged_tree_log_likelihood, TILE)
from physher_tpu.trees.topology import Topology


def _caterpillar_topology(n_tips):
    nested = {"name": "t0", "length": 0.1, "children": []}
    for i in range(1, n_tips):
        nested = {"name": None, "length": 0.1, "children": [
            nested, {"name": f"t{i}", "length": 0.1, "children": []}]}
    topo, _ = Topology.from_nested(nested)
    return topo


def _setup(topo, n_sites=100, C=4, seed=0, dtype=np.float32):
    n_tips = topo.T
    sp = random_sitepattern(n_tips, n_sites, seed=seed)
    S = 4
    P = pad_patterns(sp.pattern_count, TILE)
    tips = sp.tip_partials(pad_to=P, dtype=dtype)
    order = [sp.taxa.index(t) for t in topo.taxa]
    tips = jnp.asarray(tips[order])
    rng = np.random.default_rng(seed)
    Q = rng.random((topo.N, C, S, S)).astype(dtype) + 0.1
    pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
    freqs = jnp.asarray(np.asarray([0.3, 0.2, 0.25, 0.25], dtype))
    props = jnp.asarray((np.arange(1, C + 1) / (C * (C + 1) / 2)).astype(dtype))
    w = jnp.asarray(np.asarray(sp.padded_weights(P), dtype))
    return tips, pm, freqs, props, w


@pytest.mark.parametrize("shape", ["balanced", "caterpillar"])
def test_forward_parity(shape):
    topo = (balanced_topology(12) if shape == "balanced"
            else _caterpillar_topology(9))
    tips, pm, freqs, props, w = _setup(topo)
    ll_x, sl_x = tree_log_likelihood(
        tips.astype(jnp.float64), pm.astype(jnp.float64), topo,
        freqs.astype(jnp.float64), props.astype(jnp.float64),
        w.astype(jnp.float64), rescale=True)
    ll_s, sl_s = staged_tree_log_likelihood(
        tips, pm, topo, freqs, props, w, interpret=True)
    np.testing.assert_allclose(float(ll_s), float(ll_x), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(sl_s)[np.asarray(w) > 0],
        np.asarray(sl_x)[np.asarray(w) > 0], rtol=5e-4, atol=1e-4)


def test_gradient_parity():
    topo = balanced_topology(12)
    tips, pm, freqs, props, w = _setup(topo)

    def f_s(pm_, fr_, pr_):
        ll, _ = staged_tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                           interpret=True)
        return ll

    def f_x(pm_, fr_, pr_):
        ll, _ = tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                    rescale=True)
        return ll

    gs = jax.grad(f_s, argnums=(0, 1, 2))(pm, freqs, props)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(pm, freqs, props)
    for a, b in zip(gs, gx):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=5e-3,
                                   atol=1e-3 * max(1.0, np.abs(b).max()))


def test_value_and_grad_jits():
    topo = balanced_topology(8)
    tips, pm, freqs, props, w = _setup(topo, n_sites=64)

    @jax.jit
    def vg(pm_):
        def f(pm__):
            ll, _ = staged_tree_log_likelihood(tips, pm__, topo, freqs,
                                               props, w, interpret=True)
            return ll
        return jax.value_and_grad(f)(pm_)

    val, grad = vg(pm)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_treelikelihood_engine_selection():
    from physher_tpu.models.treelikelihood import TreeLikelihood
    from physher_tpu.models.substitution import GTR
    from physher_tpu.models.sitemodel import GammaSiteModel

    topo = balanced_topology(8)
    sp = random_sitepattern(8, 60, seed=2)
    tlk_s = TreeLikelihood(sp, topo, GTR(), GammaSiteModel(4), rescale=True,
                           pattern_pad_multiple=TILE, dtype=jnp.float32,
                           engine="pallas-staged")
    tlk_x = TreeLikelihood(sp, topo, GTR(), GammaSiteModel(4), rescale=True,
                           pattern_pad_multiple=TILE, dtype=jnp.float32,
                           engine="xla")
    params = tlk_s.param_space().init_params(dtype=jnp.float32)
    v_s = float(tlk_s.log_likelihood(params))
    v_x = float(tlk_x.log_likelihood(params))
    np.testing.assert_allclose(v_s, v_x, rtol=2e-5)
    g_s = jax.grad(tlk_s.log_likelihood)(params)
    g_x = jax.grad(tlk_x.log_likelihood)(params)
    for k in g_s:
        np.testing.assert_allclose(np.asarray(g_s[k]), np.asarray(g_x[k]),
                                   rtol=5e-3, atol=5e-3)


def test_staged_shard_map():
    """Staged engine under a pattern mesh via shard_map: 1 vs N devices."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from physher_tpu.parallel.mesh import (
        pattern_mesh, shard_map_staged_engine, shard_patterns)

    topo = balanced_topology(8)
    tips, pm, freqs, props, w = _setup(topo, n_sites=900)
    n_dev = 4
    # pad to TILE per shard
    P = pad_patterns(tips.shape[-1], TILE * n_dev)
    tips = jnp.pad(tips, ((0, 0), (0, 0), (0, P - tips.shape[-1])))
    w = jnp.pad(w, (0, P - w.shape[0]))

    ll_1, _ = staged_tree_log_likelihood(tips, pm, topo, freqs, props, w,
                                         interpret=True)
    mesh = pattern_mesh(n_dev)
    tips_s, w_s = shard_patterns(mesh, tips, w)
    run = shard_map_staged_engine(mesh, interpret=True)
    ll_n, _ = run(tips_s, pm, topo, freqs, props, w_s)
    np.testing.assert_allclose(float(ll_n), float(ll_1), rtol=2e-6)
