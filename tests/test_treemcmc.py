"""Topology MCMC (NNI operator) and discrete bitflip MCMC (SSVS).

Reference parity: src/phyc/operator.c NNI + bitflip operators inside the
mcmc.c store/propose/accept loop; branchmodel.h:64-67 SSVS local-clock
indicators.
"""

import os

import numpy as np
import pytest

import jax

from physher_tpu.data.sitepattern import SitePattern
from physher_tpu.data.datatype import NucleotideDataType
from physher_tpu.io.seqio import read_alignment
from physher_tpu.io.treeio import read_newick, write_newick
from physher_tpu.models.substitution import JC69
from physher_tpu.models.treelikelihood import TreeLikelihood
from physher_tpu.inference.treemcmc import TreeMCMC
from physher_tpu.inference.topology_search import to_nested, nni_neighbors

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tiny_tlk():
    aln = read_alignment(os.path.join(DATA, "tiny.fa"))
    sp = SitePattern.from_alignment(aln)
    from physher_tpu.data.distance import distance_matrix
    from physher_tpu.trees.build import nj

    topo, dist = nj(sp.taxa, distance_matrix(sp))
    return TreeLikelihood(sp, topo, JC69(),
                          distances_init=dist[: topo.N - 1])


class TestTreeMCMC:
    def test_mixes_and_logs_parseable_trees(self):
        tlk = _tiny_tlk()
        tm = TreeMCMC(tlk)
        res = tm.run(jax.random.PRNGKey(0), tm.space.init_params(),
                     n_iter=1500, every=50, burnin=100)
        assert 0.0 < res.acceptance["nni"] < 1.0
        assert 0.0 < res.acceptance["branch"] < 1.0
        assert np.all(np.isfinite(res.log_posterior))
        assert len(res.trees) > 10
        # every logged tree must be a valid newick over the same taxa
        base = sorted(tlk.topo.taxa)
        for t in res.trees[:5] + res.trees[-5:]:
            topo2, _ = read_newick(t)
            assert sorted(topo2.taxa) == base

    def test_nni_proposal_is_symmetric(self):
        # the uniform-NNI proposal is symmetric because every binary
        # topology on T taxa has the same number of rooted-NNI neighbors
        tlk = _tiny_tlk()
        nested = to_nested(tlk.topo, np.nan_to_num(
            np.concatenate([tlk.distances_init, [np.nan]])))
        n0 = len(nni_neighbors(nested))
        assert n0 > 0
        for cand in nni_neighbors(nested)[:6]:
            assert len(nni_neighbors(cand)) == n0

    def test_recovers_true_topology_strong_signal(self):
        # 4 taxa, strong ((A,B),(C,D)) signal: AB identical, CD identical,
        # the two pairs far apart
        rng = np.random.default_rng(0)
        L = 400
        anc = rng.integers(0, 4, L)
        other = (anc + 1 + rng.integers(0, 3, L)) % 4
        alpha = "ACGT"
        seqs = {
            "A": "".join(alpha[i] for i in anc),
            "B": "".join(alpha[i] for i in anc),
            "C": "".join(alpha[i] for i in other),
            "D": "".join(alpha[i] for i in other),
        }
        sp = SitePattern.from_alignment(seqs)
        topo, _ = read_newick("((A:0.1,C:0.1):0.1,(B:0.1,D:0.1):0.1);")
        # tip order of the START tree is wrong on purpose
        tlk = TreeLikelihood(sp, topo, JC69(),
                             distances_init=np.full(topo.N - 1, 0.1))
        tm = TreeMCMC(tlk)
        res = tm.run(jax.random.PRNGKey(1), tm.space.init_params(),
                     n_iter=3000, every=20, burnin=1000, p_topo=0.4)
        # count posterior support for the AB|CD split
        ab = 0
        for t in res.trees:
            topo2, _ = read_newick(t)
            from physher_tpu.trees.stats import splits

            names = set(splits(topo2).keys())
            if frozenset({"A", "B"}) in names or \
               frozenset({"C", "D"}) in names:
                ab += 1
        assert ab / len(res.trees) > 0.95


class TestMixedMCMC:
    def test_bitflip_posterior_frequency(self):
        # target: x ~ N(2*b, 1), prior P(b=1)=0.3 — marginally the bit
        # posterior equals its prior (the Gaussian integrates to the same
        # mass for either mean)
        from physher_tpu.models.parameters import ParamSpec, ParamSpace
        from physher_tpu.inference.mcmc import MixedMCMC

        import jax.numpy as jnp

        space = ParamSpace([ParamSpec.scalar("x", 0.0)])

        def log_prob(params, bits):
            mu = 2.0 * bits[0]
            lp_bit = jnp.where(bits[0] == 1, jnp.log(0.3), jnp.log(0.7))
            return -0.5 * (params["x"] - mu) ** 2 + lp_bit

        mm = MixedMCMC(space, log_prob, n_bits=1, p_flip=0.4)
        out = mm.run(jax.random.PRNGKey(2), {"x": 0.0}, np.zeros(1),
                     n_iter=40000, every=10, burnin=4000)
        freq = out["bits"][:, 0].mean()
        assert abs(freq - 0.3) < 0.06, freq
        assert np.all(np.isfinite(out["log_posterior"]))

    def test_ssvs_local_clock_matches_host_resolution(self):
        from physher_tpu.models.clock import (
            LocalClock, SSVSLocalClock, ancestor_chains)

        topo, _ = read_newick(
            "(((A:1,B:1):1,(C:1,D:1):1):1,(E:1,F:1):2);")
        rng = np.random.default_rng(3)
        bits = np.zeros(topo.N, dtype=np.int32)
        bits[[topo.T + 0, topo.T + 2]] = 1  # two active internal nodes

        ssvs = SSVSLocalClock(topo, rate_init=1e-3)
        params = ssvs.param_space().init_params()
        local = np.asarray(params["local_rates"]).copy()
        local[:] = rng.uniform(1e-4, 1e-2, topo.N)
        params = dict(params, local_rates=local)
        eff = np.asarray(ssvs.rates_from_indicators(params, bits))

        # host-side resolution via the static LocalClock class map
        cmap = LocalClock.class_map_from_indicators(topo, bits.astype(bool))
        active = np.flatnonzero(bits)
        expected = np.where(
            cmap > 0,
            local[np.concatenate([[0], active])[cmap]],
            float(params["rate"]))
        np.testing.assert_allclose(eff, expected, rtol=1e-12)


def _splits_from_children(children, taxa):
    """Clade taxa-sets from a (possibly id-order-violating) children
    array, resolved by fixed-point — the host mirror of
    postorder_from_children."""
    T, I = len(taxa), len(children)
    sets = [frozenset([taxa[t]]) for t in range(T)] + [None] * I
    remaining = set(range(I))
    while remaining:
        progressed = False
        for r in list(remaining):
            l, rt = int(children[r][0]), int(children[r][1])
            if sets[l] is not None and sets[rt] is not None:
                sets[T + r] = sets[l] | sets[rt]
                remaining.discard(r)
                progressed = True
        assert progressed, "cyclic children array"
    return sets


class TestBatchedTreeMCMC:
    """Device-side topology moves: NNI as index edits inside a
    vmapped-chain jitted scan (ops/dynamic_pruning.propose_nni_device +
    postorder_from_children), replacing per-proposal host tree surgery.
    Reference: src/phyc/operator.c NNI inside the mcmc.c loop."""

    def test_device_nni_preserves_tree_validity(self):
        import jax.numpy as jnp

        from physher_tpu.ops.dynamic_pruning import (
            postorder_from_children, propose_nni_device)

        tlk = _tiny_tlk()
        topo = tlk.topo
        ch = jnp.asarray(topo.children[:, :2], jnp.int32)
        taxa = list(topo.taxa)
        key = jax.random.PRNGKey(0)
        for i in range(25):
            key, sub = jax.random.split(key)
            ch, _ = propose_nni_device(sub, ch, topo.T)
            chn = np.asarray(ch)
            # every non-root node appears exactly once as a child
            flat = sorted(chn.ravel().tolist())
            assert flat == list(range(topo.N - 1))
            # root clade covers all taxa (resolvable = acyclic)
            sets = _splits_from_children(chn, taxa)
            assert sets[-1] == frozenset(taxa)
            # the device evaluation order is consistent with dependencies
            order = np.asarray(postorder_from_children(ch, topo.T))
            pos = {topo.T + int(r): i for i, r in enumerate(order)}
            for i2, r in enumerate(order):
                for c in chn[int(r)]:
                    if int(c) >= topo.T:
                        assert pos[int(c)] < i2

    def test_recovers_true_topology_batched_chains(self):
        rng = np.random.default_rng(0)
        L = 400
        anc = rng.integers(0, 4, L)
        other = (anc + 1 + rng.integers(0, 3, L)) % 4
        alpha = "ACGT"
        seqs = {
            "A": "".join(alpha[i] for i in anc),
            "B": "".join(alpha[i] for i in anc),
            "C": "".join(alpha[i] for i in other),
            "D": "".join(alpha[i] for i in other),
        }
        sp = SitePattern.from_alignment(seqs)
        topo, _ = read_newick("((A:0.1,C:0.1):0.1,(B:0.1,D:0.1):0.1);")
        tlk = TreeLikelihood(sp, topo, JC69(),
                             distances_init=np.full(topo.N - 1, 0.1))
        from physher_tpu.inference.treemcmc import BatchedTreeMCMC

        tm = BatchedTreeMCMC(tlk, p_nni=0.4)
        res = tm.run(jax.random.PRNGKey(1), n_iter=1500, every=50,
                     n_chains=8, burnin=500)
        assert 0.0 < res["acceptance"]["nni"] < 1.0
        assert 0.0 < res["acceptance"]["branch"] < 1.0
        assert np.all(np.isfinite(res["logp"]))
        taxa = list(topo.taxa)
        hits = total = 0
        S, B = res["children"].shape[:2]
        for si in range(S):
            for b in range(B):
                sets = set(_splits_from_children(
                    res["children"][si, b], taxa)[topo.T:])
                total += 1
                if frozenset({"A", "B"}) in sets or \
                   frozenset({"C", "D"}) in sets:
                    hits += 1
        assert hits / total > 0.9, hits / total

    def test_incremental_recompute_matches_full(self):
        """The partials-as-state sampler (incremental=True): after a run,
        every chain's carried log-posterior must equal a from-scratch
        evaluation of its final (children, bl) state — stale partials or
        a wrong dirty path would show up here. Mirrors the reference's
        incremental-vs-full recompute invariant
        (src/phyc/treelikelihood.c:126-161)."""
        import jax.numpy as jnp

        from physher_tpu.inference.treemcmc import BatchedTreeMCMC
        from physher_tpu.ops.dynamic_pruning import (
            postorder_from_children, tree_loglik_dynamic_ordered)

        tlk = _tiny_tlk()
        tm = BatchedTreeMCMC(tlk)
        res = tm.run(jax.random.PRNGKey(3), n_iter=400, every=400,
                     n_chains=6, incremental=True)
        assert 0.0 < res["acceptance"]["nni"] < 1.0
        assert 0.0 < res["acceptance"]["branch"] < 1.0
        tp = jnp.asarray(tlk.tip_partials)
        w = jnp.asarray(tlk.weights)
        freqs = tlk.subst.frequencies({})
        props = jnp.ones(1, w.dtype)
        rate = tm.bl_prior_rate
        for b in range(6):
            ch = jnp.asarray(res["children"][-1, b])
            bl = jnp.asarray(res["bl"][-1, b])
            pm = tlk.subst.p_t(
                {}, jnp.clip(bl, 0.0, None)[:, None]).astype(w.dtype)
            order = postorder_from_children(ch, tlk.topo.T)
            ll = tree_loglik_dynamic_ordered(
                tp, pm, ch, order, freqs.astype(w.dtype), props, w,
                rescale=tlk.rescale)[0]
            n_br = bl.shape[0] - 1
            lp = float(ll + n_br * np.log(rate) - rate * np.sum(bl[:-1]))
            np.testing.assert_allclose(res["logp"][-1, b], lp, rtol=1e-8)

    def test_incremental_recovers_true_topology(self):
        rng = np.random.default_rng(0)
        L = 400
        anc = rng.integers(0, 4, L)
        other = (anc + 1 + rng.integers(0, 3, L)) % 4
        alpha = "ACGT"
        seqs = {"A": "".join(alpha[i] for i in anc),
                "B": "".join(alpha[i] for i in anc),
                "C": "".join(alpha[i] for i in other),
                "D": "".join(alpha[i] for i in other)}
        sp = SitePattern.from_alignment(seqs)
        topo, _ = read_newick("((A:0.1,C:0.1):0.1,(B:0.1,D:0.1):0.1);")
        tlk = TreeLikelihood(sp, topo, JC69(),
                             distances_init=np.full(topo.N - 1, 0.1))
        from physher_tpu.inference.treemcmc import BatchedTreeMCMC

        tm = BatchedTreeMCMC(tlk, p_nni=0.4)
        res = tm.run(jax.random.PRNGKey(1), n_iter=1500, every=50,
                     n_chains=8, burnin=500, incremental=True)
        taxa = list(topo.taxa)
        hits = total = 0
        S, B = res["children"].shape[:2]
        for si in range(S):
            for b in range(B):
                sets = set(_splits_from_children(
                    res["children"][si, b], taxa)[topo.T:])
                total += 1
                if frozenset({"A", "B"}) in sets or \
                   frozenset({"C", "D"}) in sets:
                    hits += 1
        assert hits / total > 0.9, hits / total
