"""Loop-based Pallas pruning kernel tests (interpret mode).

The loop kernel (physher_tpu/ops/pallas_pruning_loop.py) is the constant-
program-size fallback engine (reference SIMD pruning + analytic gradients:
treelikelihood4/20/X/Codon, treelikelihood.c:2129-3100); these tests pin
value and gradient parity against the level-batched XLA engine on CPU via
pallas interpret mode. The fused/staged engines have their own suites
(test_fused_engine.py, test_staged_engine.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern
from physher_tpu.ops.pruning import tree_log_likelihood, pad_patterns
from physher_tpu.ops.pallas_pruning_loop import TILE


def _setup(n_tips=8, n_sites=100, C=4, seed=0, dtype=np.float32):
    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, n_sites, seed=seed)
    S = 4
    P = pad_patterns(sp.pattern_count, TILE)
    tips = sp.tip_partials(pad_to=P, dtype=dtype)
    order = [sp.taxa.index(t) for t in topo.taxa]
    tips = jnp.asarray(tips[order])
    rng = np.random.default_rng(seed)
    Q = rng.random((topo.N, C, S, S)).astype(dtype) + 0.1
    pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
    freqs = jnp.asarray(np.full(S, 0.25, dtype))
    props = jnp.asarray(np.full(C, 1.0 / C, dtype))
    w = jnp.asarray(np.asarray(sp.padded_weights(P), dtype))
    return topo, tips, pm, freqs, props, w


class TestLoopKernel:
    """Loop-based (scalar-prefetch) kernel: ops/pallas_pruning_loop.py."""

    def test_parity_binary_tree(self):
        from physher_tpu.ops.pallas_pruning_loop import (
            loop_tree_log_likelihood)
        topo, tips, pm, freqs, props, w = _setup(16, 200)
        ll_x, sl_x = tree_log_likelihood(tips, pm, topo, freqs, props, w,
                                         rescale=True)
        ll_p, sl_p = loop_tree_log_likelihood(
            tips, pm, topo, freqs, props, w, rescale=True, interpret=True)
        np.testing.assert_allclose(float(ll_p), float(ll_x), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sl_p)[np.asarray(w) > 0],
            np.asarray(sl_x)[np.asarray(w) > 0], rtol=2e-4)

    def test_parity_multifurcating_and_blocks(self):
        from collections import OrderedDict

        from physher_tpu.data.sitepattern import SitePattern
        from physher_tpu.io.treeio import read_newick
        from physher_tpu.ops.pallas_pruning_loop import (
            loop_tree_log_likelihood)
        seqs = OrderedDict([("a", "ACGTACGTAC"), ("b", "ACGTACCTAA"),
                            ("c", "AGGTACGTAT"), ("d", "ACGAACGTAA"),
                            ("e", "CCGTACGTAA")])
        topo, _ = read_newick(
            "((a:0.1,b:0.2):0.05,(c:0.3,d:0.1):0.02,e:0.15);")
        sp = SitePattern.from_alignment(seqs)
        P = pad_patterns(sp.pattern_count, TILE)
        tips = sp.tip_partials(pad_to=P, dtype=np.float32)
        tips = jnp.asarray(tips[[sp.taxa.index(t) for t in topo.taxa]])
        rng = np.random.default_rng(1)
        C, S = 2, 4
        Q = rng.random((topo.N, C, S, S)).astype(np.float32) + 0.1
        pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
        freqs = jnp.asarray(np.full(S, 0.25, np.float32))
        props = jnp.asarray(np.full(C, 0.5, np.float32))
        w = jnp.asarray(np.asarray(sp.padded_weights(P), np.float32))
        ll_x, _ = tree_log_likelihood(tips, pm, topo, freqs, props, w,
                                      rescale=True)
        for block in (1, 3):
            ll_p, _ = loop_tree_log_likelihood(
                tips, pm, topo, freqs, props, w, rescale=True,
                interpret=True, block=block)
            np.testing.assert_allclose(float(ll_p), float(ll_x), rtol=1e-5)

    def test_loop_vjp_analytic_gradient(self):
        """Loop-kernel custom VJP (rematerializing backward kernel) matches
        autodiff through the XLA path, including multifurcations and odd
        block sizes."""
        from physher_tpu.ops.pallas_pruning_loop import (
            loop_tree_log_likelihood)
        topo, tips, pm, freqs, props, w = _setup(8, 150)

        def f_x(pm_, fr, pr):
            return tree_log_likelihood(
                tips.astype(jnp.float64), pm_.astype(jnp.float64), topo,
                fr.astype(jnp.float64), pr.astype(jnp.float64),
                w.astype(jnp.float64), rescale=True)[0]

        def f_l(pm_, fr, pr):
            return loop_tree_log_likelihood(
                tips, pm_, topo, fr, pr, w, rescale=True,
                interpret=True, block=3)[0]

        gx = jax.grad(f_x, argnums=(0, 1, 2))(
            pm.astype(jnp.float64), freqs.astype(jnp.float64),
            props.astype(jnp.float64))
        gl = jax.grad(f_l, argnums=(0, 1, 2))(pm, freqs, props)
        for a, b, name in zip(gx, gl, ("dpmats", "dfreqs", "dprops")):
            np.testing.assert_allclose(
                np.asarray(b, np.float64), np.asarray(a), rtol=5e-4,
                atol=1e-4 * (float(jnp.max(jnp.abs(a))) + 1e-12),
                err_msg=name)

    def test_loop_vjp_multifurcating(self):
        from collections import OrderedDict

        from physher_tpu.data.sitepattern import SitePattern
        from physher_tpu.io.treeio import read_newick
        from physher_tpu.ops.pallas_pruning_loop import (
            loop_tree_log_likelihood)
        seqs = OrderedDict([("a", "ACGTACGTAC"), ("b", "ACGTACCTAA"),
                            ("c", "AGGTACGTAT"), ("d", "ACGAACGTAA"),
                            ("e", "CCGTACGTAA")])
        topo, _ = read_newick(
            "((a:0.1,b:0.2):0.05,(c:0.3,d:0.1):0.02,e:0.15);")
        sp = SitePattern.from_alignment(seqs)
        P = pad_patterns(sp.pattern_count, TILE)
        tips = sp.tip_partials(pad_to=P, dtype=np.float32)
        tips = jnp.asarray(tips[[sp.taxa.index(t) for t in topo.taxa]])
        rng = np.random.default_rng(5)
        C, S = 2, 4
        Q = rng.random((topo.N, C, S, S)).astype(np.float32) + 0.1
        pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
        freqs = jnp.asarray(np.full(S, 0.25, np.float32))
        props = jnp.asarray(np.full(C, 0.5, np.float32))
        w = jnp.asarray(np.asarray(sp.padded_weights(P), np.float32))

        def f_x(pm_):
            return tree_log_likelihood(
                tips.astype(jnp.float64), pm_.astype(jnp.float64), topo,
                freqs.astype(jnp.float64), props.astype(jnp.float64),
                w.astype(jnp.float64), rescale=True)[0]

        def f_l(pm_):
            return loop_tree_log_likelihood(
                tips, pm_, topo, freqs, props, w, rescale=True,
                interpret=True, block=2)[0]

        gx = jax.grad(f_x)(pm.astype(jnp.float64))
        gl = jax.grad(f_l)(pm)
        np.testing.assert_allclose(
            np.asarray(gl, np.float64), np.asarray(gx), rtol=5e-4,
            atol=1e-4 * (float(jnp.max(jnp.abs(gx))) + 1e-12))
