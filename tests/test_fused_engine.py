"""Fused staged Pallas kernel (whole postorder per grid step): parity with
the XLA path in interpret mode. Covers forward values, the rematerializing
backward (d pmats / d freqs / d props), ladder + balanced trees, category
padding (C*S not a multiple of 8), per-tree block sizes B, end-to-end
TreeLikelihood engine selection, and the shard_map pattern-mesh wrapper.
Reference hot path: src/phyc/treelikelihood4.c update_partials,
treelikelihood.c:1454-1735; gradients treelikelihood.c:2129-3100.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.ops.pallas_fused import (
    TILE, fused_tree_log_likelihood, fused_vmem_estimate, pick_B)
from physher_tpu.ops.pruning import pad_patterns, tree_log_likelihood
from physher_tpu.trees.topology import Topology
from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern


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


@pytest.mark.parametrize("shape,C,B", [
    ("balanced", 4, None),
    ("balanced", 1, 2),       # C*S=4 -> padded to 8 sublanes
    ("caterpillar", 4, None),  # ladder: pick_B must fall to B=1
    ("caterpillar", 3, 1),    # C*S=12 -> padded
])
def test_forward_parity(shape, C, B):
    topo = (balanced_topology(12) if shape == "balanced"
            else _caterpillar_topology(9))
    tips, pm, freqs, props, w = _setup(topo, C=C)
    ll_x, sl_x = tree_log_likelihood(
        tips.astype(jnp.float64), pm.astype(jnp.float64), topo,
        freqs.astype(jnp.float64), props.astype(jnp.float64),
        w.astype(jnp.float64), rescale=True)
    ll_f, sl_f = fused_tree_log_likelihood(
        tips, pm, topo, freqs, props, w, B=B, interpret=True)
    np.testing.assert_allclose(float(ll_f), float(ll_x), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(sl_f)[np.asarray(w) > 0],
        np.asarray(sl_x)[np.asarray(w) > 0], rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("shape", ["balanced", "caterpillar"])
def test_gradient_parity(shape):
    topo = (balanced_topology(12) if shape == "balanced"
            else _caterpillar_topology(9))
    tips, pm, freqs, props, w = _setup(topo)

    def f_f(pm_, fr_, pr_):
        ll, _ = fused_tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                          interpret=True)
        return ll

    def f_x(pm_, fr_, pr_):
        ll, _ = tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                    rescale=True)
        return ll

    gf = jax.grad(f_f, argnums=(0, 1, 2))(pm, freqs, props)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(pm, freqs, props)
    for a, b in zip(gf, gx):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=5e-3,
                                   atol=1e-3 * max(1.0, np.abs(b).max()))


def test_value_and_grad_jits():
    topo = balanced_topology(8)
    tips, pm, freqs, props, w = _setup(topo, n_sites=64)

    @jax.jit
    def vg(pm_):
        def f(pm__):
            ll, _ = fused_tree_log_likelihood(tips, pm__, topo, freqs,
                                              props, w, interpret=True)
            return ll
        return jax.value_and_grad(f)(pm_)

    val, grad = vg(pm)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.parametrize("S,C,dt_name,n_tips", [
    (20, 4, "aminoacid", 12),   # WAG+G4 shape: category-split grid
    (61, 1, "codon", 8),        # codon M0: states padded 61 -> 64
])
def test_csplit_parity(S, C, dt_name, n_tips):
    """Category-split mode (protein/codon state spaces): forward + gradient
    parity with the XLA engine. Reference kernels being replaced:
    src/phyc/treelikelihood20.c, src/phyc/treelikelihoodCodon.c."""
    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, 100, seed=3, datatype=dt_name)
    P = pad_patterns(sp.pattern_count, TILE)
    tips = sp.tip_partials(pad_to=P, dtype=np.float32)
    order = [sp.taxa.index(t) for t in topo.taxa]
    tips = jnp.asarray(tips[order])
    rng = np.random.default_rng(0)
    Q = rng.random((topo.N, C, S, S)).astype(np.float32) + 0.1
    pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
    fr = rng.random(S).astype(np.float32)
    fr = jnp.asarray(fr / fr.sum())
    pr = jnp.asarray((np.arange(1, C + 1) / (C * (C + 1) / 2)
                      ).astype(np.float32))
    w = jnp.asarray(np.asarray(sp.padded_weights(P), np.float32))

    from physher_tpu.ops.pallas_fused import _needs_csplit
    assert _needs_csplit(C, S)

    ll_x, sl_x = tree_log_likelihood(tips, pm, topo, fr, pr, w, rescale=True)
    ll_f, sl_f = fused_tree_log_likelihood(tips, pm, topo, fr, pr, w,
                                           interpret=True)
    np.testing.assert_allclose(float(ll_f), float(ll_x), rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(sl_f)[np.asarray(w) > 0],
        np.asarray(sl_x)[np.asarray(w) > 0], rtol=5e-5, atol=1e-5)

    def f_f(pm_, fr_, pr_):
        return fused_tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                         interpret=True)[0]

    def f_x(pm_, fr_, pr_):
        return tree_log_likelihood(tips, pm_, topo, fr_, pr_, w,
                                   rescale=True)[0]

    gf = jax.grad(f_f, argnums=(0, 1, 2))(pm, fr, pr)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(pm, fr, pr)
    for a, b in zip(gf, gx):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=5e-4,
                                   atol=1e-4 * max(1.0, np.abs(b).max()))


def test_pick_b_and_vmem():
    lad = _caterpillar_topology(16)
    bal = balanced_topology(16)
    assert pick_B(lad) == 1          # levels hold 1 node each
    assert pick_B(bal) >= 2          # levels pack
    # estimate is monotone in B buffers and positive
    assert fused_vmem_estimate(bal, 4, 4, 2) > 0
    assert (fused_vmem_estimate(bal, 4, 4, 2, backward=True)
            > fused_vmem_estimate(bal, 4, 4, 2, backward=False))


def test_treelikelihood_engine_selection():
    from physher_tpu.models.sitemodel import GammaSiteModel
    from physher_tpu.models.substitution import GTR
    from physher_tpu.models.treelikelihood import TreeLikelihood

    topo = balanced_topology(8)
    sp = random_sitepattern(8, 60, seed=2)
    tlk_f = TreeLikelihood(sp, topo, GTR(), GammaSiteModel(4), rescale=True,
                           pattern_pad_multiple=TILE, dtype=jnp.float32,
                           engine="pallas-fused")
    tlk_x = TreeLikelihood(sp, topo, GTR(), GammaSiteModel(4), rescale=True,
                           pattern_pad_multiple=TILE, dtype=jnp.float32,
                           engine="xla")
    params = tlk_f.param_space().init_params(dtype=jnp.float32)
    v_f = float(tlk_f.log_likelihood(params))
    v_x = float(tlk_x.log_likelihood(params))
    np.testing.assert_allclose(v_f, v_x, rtol=2e-5)
    g_f = jax.grad(tlk_f.log_likelihood)(params)
    g_x = jax.grad(tlk_x.log_likelihood)(params)
    for k in g_f:
        np.testing.assert_allclose(np.asarray(g_f[k]), np.asarray(g_x[k]),
                                   rtol=5e-3, atol=5e-3)


def test_fused_shard_map():
    """Fused engine under a pattern mesh via shard_map: 1 vs N devices."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from physher_tpu.parallel.mesh import (
        pattern_mesh, shard_map_fused_engine, shard_patterns)

    topo = balanced_topology(8)
    tips, pm, freqs, props, w = _setup(topo, n_sites=900)
    n_dev = 4
    P = pad_patterns(tips.shape[-1], TILE * n_dev)
    tips = jnp.pad(tips, ((0, 0), (0, 0), (0, P - tips.shape[-1])))
    w = jnp.pad(w, (0, P - w.shape[0]))

    ll_1, _ = fused_tree_log_likelihood(tips, pm, topo, freqs, props, w,
                                        interpret=True)
    mesh = pattern_mesh(n_dev)
    tips_s, w_s = shard_patterns(mesh, tips, w)
    run = shard_map_fused_engine(mesh, interpret=True)
    ll_n, _ = run(tips_s, pm, topo, freqs, props, w_s)
    np.testing.assert_allclose(float(ll_n), float(ll_1), rtol=2e-6)

    # gradient flows through the shard_map wrapper and matches 1-device
    def f_n(pm_):
        ll, _ = run(tips_s, pm_, topo, freqs, props, w_s)
        return ll

    def f_1(pm_):
        ll, _ = fused_tree_log_likelihood(tips, pm_, topo, freqs, props, w,
                                          interpret=True)
        return ll

    g_n = jax.grad(f_n)(pm)
    g_1 = jax.grad(f_1)(pm)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_1),
                               rtol=1e-4, atol=1e-5)
