"""Parsimony, upper partials/ASR, simulator, tree stats, root-to-tip."""

import jax
import jax.numpy as jnp
import numpy as np

from physher_tpu.data.sitepattern import SitePattern
from physher_tpu.io.treeio import read_newick
from physher_tpu.likelihood.parsimony import Parsimony, fitch_score, tip_state_sets
from physher_tpu.likelihood.analysis import (
    ancestral_states, simulate_alignment, site_rate_posteriors, cat_assignment,
)
from physher_tpu.models.substitution import JC69, HKY
from physher_tpu.models.sitemodel import GammaSiteModel
from physher_tpu.models.treelikelihood import TreeLikelihood
from physher_tpu.ops.pruning import pruning_partials
from physher_tpu.ops.upper import upper_partials
from physher_tpu.trees import stats
from physher_tpu.trees.roottotip import root_to_tip_regression


def _mini_alignment():
    return {"a": "AAC", "b": "AAC", "c": "CCA", "d": "CCA"}


def test_fitch_hand_case():
    topo, _ = read_newick("((a:1,b:1):1,(c:1,d:1):1);")
    sp = SitePattern.from_alignment(_mini_alignment())
    pars = Parsimony(sp, topo)
    # sites: AACC->1 change? pattern1 a=A,b=A,c=C,d=C -> 1; same; third site
    # a=C,b=C,c=A,d=A -> 1  => total = 3 over sites (two patterns w/ weights)
    assert pars.score() == 3.0
    # conflicting grouping costs more
    topo2, _ = read_newick("((a:1,c:1):1,(b:1,d:1):1);")
    pars2 = Parsimony(sp, topo2)
    assert pars2.score() == 6.0


def test_upper_partials_invariant():
    """sum_s lower*upper at ANY node reproduces the root site likelihood."""
    topo, dist = read_newick(
        "(((a:0.1,b:0.2):0.05,c:0.3):0.1,(d:0.15,e:0.25):0.2);")
    rng = np.random.default_rng(0)
    seqs = {t: "".join(rng.choice(list("ACGT"), 40)) for t in topo.taxa}
    sp = SitePattern.from_alignment(seqs)
    tlk = TreeLikelihood(sp, topo, HKY(kappa_init=2.0), GammaSiteModel(4),
                         distances_init=np.nan_to_num(dist[: topo.N - 1]))
    params = tlk.param_space().init_params()
    bl = tlk.branch_lengths(params)
    rates, props = tlk.site_model.rates_props(params)
    pmats = tlk.subst.p_t(params, bl[:, None] * rates[None, :])
    freqs = tlk.subst.frequencies(params)
    lower, _ = pruning_partials(tlk.tip_partials, pmats, topo)
    upper = upper_partials(lower, pmats, topo, freqs)
    ref = jnp.einsum("c,s,csp->p", props, freqs, lower[topo.root])
    for node in range(topo.N):
        site = jnp.einsum("c,csp->p", props, lower[node] * upper[node])
        np.testing.assert_allclose(np.asarray(site), np.asarray(ref),
                                   rtol=1e-10, err_msg=f"node {node}")


def test_asr_posteriors():
    topo, dist = read_newick("((a:0.05,b:0.05):0.05,(c:0.05,d:0.05):0.05);")
    seqs = {"a": "AAAA", "b": "AAAA", "c": "CCCC", "d": "CCCA"}
    sp = SitePattern.from_alignment(seqs)
    tlk = TreeLikelihood(sp, topo, JC69(),
                         distances_init=np.nan_to_num(dist[: topo.N - 1]))
    params = tlk.param_space().init_params()
    post, map_states = ancestral_states(tlk, params)
    np.testing.assert_allclose(post.sum(1), 1.0, rtol=1e-9)
    # the ab ancestor should be confidently A at the first pattern
    ab_rank = None
    for k in range(topo.I):
        kids = set(topo.children[k, : topo.child_count[k]].tolist())
        if kids == {0, 1}:
            ab_rank = k
    a_pattern = int(sp.codes[sp.taxa.index("a"), 0])
    assert post[topo.T + ab_rank, a_pattern, 0] > 0.9


def test_simulator_recovers_frequencies():
    topo, dist = read_newick("((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1);")
    hky = HKY(kappa_init=3.0, freqs_init=[0.4, 0.3, 0.2, 0.1])
    from physher_tpu.models.sitemodel import ConstantSiteModel

    smod = ConstantSiteModel()
    params = {**hky.param_space().init_params()}
    bl = np.nan_to_num(dist, nan=0.0)
    seqs = simulate_alignment(jax.random.PRNGKey(0), topo, hky, smod, params,
                              bl, 20000)
    counts = np.zeros(4)
    for s in seqs.values():
        for i, c in enumerate("ACGT"):
            counts[i] += s.count(c)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.4, 0.3, 0.2, 0.1], atol=0.01)


def test_sim_roundtrip_likelihood():
    """Simulated data should be most likely near the true branch lengths."""
    topo, dist = read_newick("((a:0.2,b:0.2):0.2,(c:0.2,d:0.2):0.2);")
    jc = JC69()
    from physher_tpu.models.sitemodel import ConstantSiteModel

    params = {}
    bl = np.nan_to_num(dist, nan=0.0)
    seqs = simulate_alignment(jax.random.PRNGKey(1), topo, jc,
                              ConstantSiteModel(), params, bl, 5000)
    sp = SitePattern.from_alignment(seqs)
    tlk = TreeLikelihood(sp, topo, JC69(),
                         distances_init=bl[: topo.N - 1])
    space = tlk.param_space()
    from physher_tpu.inference import ml

    res = ml.optimize(tlk.log_likelihood, space, space.init_params(),
                      method="lbfgs")
    est = np.asarray(res.params["tree.distances"])
    true = bl[: topo.N - 1]
    np.testing.assert_allclose(est, true, atol=0.04)


def test_site_rate_posteriors_and_cat():
    topo, dist = read_newick(
        "(((a:0.1,b:0.2):0.05,c:0.3):0.1,(d:0.15,e:0.25):0.2);")
    rng = np.random.default_rng(5)
    seqs = {t: "".join(rng.choice(list("ACGT"), 30)) for t in topo.taxa}
    sp = SitePattern.from_alignment(seqs)
    tlk = TreeLikelihood(sp, topo, JC69(), GammaSiteModel(4),
                         distances_init=np.nan_to_num(dist[: topo.N - 1]))
    params = tlk.param_space().init_params()
    post = site_rate_posteriors(tlk, params)
    np.testing.assert_allclose(post.sum(0), 1.0, rtol=1e-9)
    cats = cat_assignment(tlk, params)
    assert cats.shape == (30,)
    assert (cats >= 0).all() and (cats < 4).all()


def test_rf_and_branch_score():
    t1, d1 = read_newick("((a:1,b:1):1,(c:1,d:1):1,(e:1,f:1):1);")
    t2, d2 = read_newick("((a:1,c:1):1,(b:1,d:1):1,(e:1,f:1):1);")
    assert stats.robinson_foulds(t1, t1) == 0
    assert stats.robinson_foulds(t1, t2) == 4  # ab|.. cd|.. vs ac|.. bd|..
    assert stats.branch_score(t1, d1, t1, d1) == 0.0
    bs = stats.branch_score(t1, d1, t2, d2)
    assert bs > 0
    ks = stats.k_tree_score(t1, d1, t2, d2)
    assert ks > 0


def test_patristic():
    topo, dist = read_newick("((a:1,b:2):3,(c:4,d:5):6);")
    D = stats.patristic_distances(topo, dist)
    ia, ib = topo.taxa.index("a"), topo.taxa.index("b")
    ic = topo.taxa.index("c")
    np.testing.assert_allclose(D[ia, ib], 3.0)
    np.testing.assert_allclose(D[ia, ic], 1 + 3 + 6 + 4)


def test_root_to_tip():
    # perfectly clock-like tree: rate 0.01/year, tips at dates
    topo, dist = read_newick(
        "((a:0.10,b:0.20):0.05,(c:0.05,d:0.15):0.10);")
    dates = {"a": 2000, "b": 2010, "c": 2000, "d": 2010}
    res = root_to_tip_regression(topo, dist, dates)
    np.testing.assert_allclose(res["rate"], 0.01, rtol=1e-9)
    np.testing.assert_allclose(res["r2"], 1.0, atol=1e-12)
