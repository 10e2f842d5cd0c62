"""NNI/SPR topology search recovers the true tree on simulated data."""

import jax
import numpy as np
import pytest

from physher_tpu.data.sitepattern import SitePattern
from physher_tpu.io.treeio import read_newick
from physher_tpu.likelihood.analysis import simulate_alignment
from physher_tpu.models.sitemodel import ConstantSiteModel
from physher_tpu.models.substitution import JC69
from physher_tpu.models.treelikelihood import TreeLikelihood
from physher_tpu.inference.topology_search import (
    TopologySearch, nni_neighbors, spr_candidates, to_nested,
)
from physher_tpu.trees.stats import robinson_foulds
from physher_tpu.trees.topology import Topology

TRUE = "(((a:0.1,b:0.1):0.05,(c:0.1,d:0.1):0.05):0.05,(e:0.1,f:0.1):0.1);"
# maximally scrambled start: every cherry broken (NNI cannot escape this
# star-tree local optimum — that's what SPR's larger neighborhood is for)
WRONG = "(((a:0.1,f:0.1):0.05,(c:0.1,e:0.1):0.05):0.05,(b:0.1,d:0.1):0.1);"
# two NNI moves from the truth: cherries (a,c) and (b,d) instead of (a,b),(c,d)
WRONG_NNI = "(((a:0.1,c:0.1):0.05,(b:0.1,d:0.1):0.05):0.05,(e:0.1,f:0.1):0.1);"


@pytest.fixture(scope="module")
def sim_data():
    topo, dist = read_newick(TRUE)
    seqs = simulate_alignment(
        jax.random.PRNGKey(7), topo, JC69(), ConstantSiteModel(), {},
        np.nan_to_num(dist, nan=0.0), 2000)
    return topo, SitePattern.from_alignment(seqs)


def _factory(sp):
    def make(topo, dist):
        return TreeLikelihood(
            sp, topo, JC69(),
            distances_init=np.nan_to_num(np.asarray(dist)[: topo.N - 1],
                                         nan=0.05))
    return make


def test_nni_move_generation():
    topo, dist = read_newick(TRUE)
    nested = to_nested(topo, dist)
    moves = nni_neighbors(nested)
    # 2 moves per internal non-root node = 2 * (I - 1)
    assert len(moves) == 2 * (topo.I - 1)
    for m in moves:
        t, _ = Topology.from_nested(m)
        assert sorted(t.taxa) == sorted(topo.taxa)
        assert robinson_foulds(t, topo) >= 0


def test_spr_move_generation():
    topo, dist = read_newick(TRUE)
    cands = spr_candidates(to_nested(topo, dist), max_radius=4)
    assert len(cands) > 10
    for m in cands[:10]:
        t, _ = Topology.from_nested(m)
        assert sorted(t.taxa) == sorted(topo.taxa)


def test_nni_recovers_true_tree(sim_data):
    true_topo, sp = sim_data
    wrong_topo, wrong_dist = read_newick(WRONG_NNI)
    search = TopologySearch(_factory(sp), algorithm="nni")
    res = search.run(wrong_topo, wrong_dist)
    assert res.moves_accepted > 0
    assert robinson_foulds(res.topology, true_topo) == 0, \
        "NNI failed to recover the generating topology"


def test_spr_recovers_true_tree(sim_data):
    true_topo, sp = sim_data
    wrong_topo, wrong_dist = read_newick(WRONG)
    search = TopologySearch(_factory(sp), algorithm="spr", spr_radius=6)
    res = search.run(wrong_topo, wrong_dist)
    assert robinson_foulds(res.topology, true_topo) == 0, \
        "SPR failed to recover the generating topology"
