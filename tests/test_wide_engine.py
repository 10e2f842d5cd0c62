"""Wide-state HBM-staged Pallas kernel (ops/pallas_wide.py): parity with
the XLA level-array path in interpret mode on CPU. This is the
tree-size-scalable large-S engine (codon 64+ taxa, protein 256 taxa —
reference: src/phyc/treelikelihoodCodon.c, treelikelihood20.c): the stage
buffer lives in HBM behind explicit DMA, so VMEM is O(R*TILE) regardless
of tree depth. Covers forward values, the custom-VJP backward
(d pmats / d freqs / d props), state-count padding (codon S=61 -> 64),
caterpillar shapes, and TreeLikelihood engine="pallas-wide" selection.
On-device parity for the real shapes runs via tools/smoke_fused_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern
from physher_tpu.ops.pruning import tree_log_likelihood, pad_patterns
from physher_tpu.ops.pallas_wide import (
    wide_tree_log_likelihood, wide_groups, TILE)
from physher_tpu.trees.topology import Topology


def _caterpillar_topology(n_tips):
    nested = {"name": "t0", "length": 0.1, "children": []}
    for i in range(1, n_tips):
        nested = {"name": None, "length": 0.1, "children": [
            nested, {"name": f"t{i}", "length": 0.1, "children": []}]}
    topo, _ = Topology.from_nested(nested)
    return topo


def _setup(topo, datatype, C, n_sites=80, seed=0):
    sp = random_sitepattern(topo.T, n_sites, seed=seed, datatype=datatype)
    P = pad_patterns(sp.pattern_count, TILE)
    tips = sp.tip_partials(pad_to=P, dtype=np.float64)
    order = [sp.taxa.index(t) for t in topo.taxa]
    tips = jnp.asarray(np.asarray(tips[order], np.float32))
    S = tips.shape[1]
    rng = np.random.default_rng(seed)
    Q = rng.random((topo.N, C, S, S)).astype(np.float32) + 0.05
    pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
    f = rng.random(S).astype(np.float32) + 0.1
    freqs = jnp.asarray(f / f.sum())
    props = jnp.asarray((np.ones(C) / C).astype(np.float32))
    w = jnp.asarray(np.asarray(sp.padded_weights(P), np.float32))
    return tips, pm, freqs, props, w


def _xla_f64(tips, pm, topo, freqs, props, w):
    return tree_log_likelihood(
        tips.astype(jnp.float64), pm.astype(jnp.float64), topo,
        freqs.astype(jnp.float64), props.astype(jnp.float64),
        w.astype(jnp.float64), rescale=True)


@pytest.mark.parametrize("datatype,C,shape", [
    ("codon", 1, "balanced"),       # S=61 -> padded 64, G=2
    ("codon", 1, "caterpillar"),
    ("aminoacid", 4, "balanced"),   # CS=80, G=1
])
def test_forward_parity(datatype, C, shape):
    topo = (balanced_topology(12) if shape == "balanced"
            else _caterpillar_topology(9))
    tips, pm, freqs, props, w = _setup(topo, datatype, C)
    ll_x, sl_x = _xla_f64(tips, pm, topo, freqs, props, w)
    ll_w, sl_w = wide_tree_log_likelihood(
        tips, pm, topo, freqs, props, w, interpret=True)
    np.testing.assert_allclose(float(ll_w), float(ll_x), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(sl_w)[np.asarray(w) > 0],
        np.asarray(sl_x)[np.asarray(w) > 0], rtol=2e-4)


def test_grouping():
    assert wide_groups(1, 64) == 2       # codon: Rg = 128 exactly
    assert wide_groups(4, 24) == 1       # CS = 96 -> no grouping
    assert wide_groups(1, 8) == 8        # small states: full step
    assert 8 % wide_groups(1, 48) == 0   # G always divides B


def test_backward_parity():
    topo = balanced_topology(8)
    tips, pm, freqs, props, w = _setup(topo, "codon", 1)

    def f_wide(pm, freqs, props):
        return wide_tree_log_likelihood(
            tips, pm, topo, freqs, props, w, interpret=True)[0]

    def f_xla(pm, freqs, props):
        return tree_log_likelihood(
            tips.astype(jnp.float64), pm, topo, freqs, props,
            w.astype(jnp.float64), rescale=True)[0]

    gw = jax.grad(f_wide, argnums=(0, 1, 2))(pm, freqs, props)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(
        pm.astype(jnp.float64), freqs.astype(jnp.float64),
        props.astype(jnp.float64))
    for a, b in zip(gw, gx):
        scale = np.max(np.abs(np.asarray(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-4)


def test_treelikelihood_engine_wide():
    from physher_tpu.models.codon import GY94
    from physher_tpu.models.treelikelihood import TreeLikelihood

    topo = balanced_topology(8)
    sp = random_sitepattern(8, 60, seed=2, datatype="codon")
    kw = dict(rescale=True, pattern_pad_multiple=TILE, dtype=jnp.float32)
    tlk_w = TreeLikelihood(sp, topo, GY94(fixed_freqs=True),
                           engine="pallas-wide", **kw)
    tlk_x = TreeLikelihood(sp, topo, GY94(fixed_freqs=True),
                           engine="xla", **kw)
    assert tlk_w.engine_name() == "pallas-wide"
    params = tlk_w.param_space().init_params(dtype=jnp.float32)
    lw = float(tlk_w.log_likelihood(params))
    lx = float(tlk_x.log_likelihood(params))
    np.testing.assert_allclose(lw, lx, rtol=2e-5)
    gw = jax.grad(tlk_w.log_likelihood)(params)
    gx = jax.grad(tlk_x.log_likelihood)(params)
    for k in gw:
        np.testing.assert_allclose(np.asarray(gw[k]), np.asarray(gx[k]),
                                   rtol=2e-3, atol=1e-5)
