"""SBN counts and model-selection criteria."""

import numpy as np

from physher_tpu.inference.sbn import SBN
from physher_tpu.inference import modelselection as ms
from physher_tpu.io.treeio import read_newick


def test_sbn_counts_and_logprob():
    t1, _ = read_newick("((a:1,b:1):1,(c:1,d:1):1);")
    t2, _ = read_newick("((a:1,c:1):1,(b:1,d:1):1);")
    sbn = SBN.from_trees([t1, t1, t1, t2])
    roots, conds = sbn.probabilities()
    assert abs(sum(roots.values()) - 1.0) < 1e-12
    lp1 = sbn.log_prob(t1)
    lp2 = sbn.log_prob(t2)
    assert lp1 > lp2
    np.testing.assert_allclose(np.exp(lp1), 0.75)
    np.testing.assert_allclose(np.exp(lp2), 0.25)
    t3, _ = read_newick("((a:1,d:1):1,(b:1,c:1):1);")
    assert sbn.log_prob(t3) == -np.inf


def test_information_criteria():
    lnl, k, n = -1000.0, 5, 200
    assert ms.aic(lnl, k) == 2010.0
    assert ms.bic(lnl, k, n) == 5 * np.log(200) + 2000.0
    assert ms.aicc(lnl, k, n) > ms.aic(lnl, k)
    res = ms.lrt(-1010.0, -1000.0, 2)
    assert res["statistic"] == 20.0
    assert res["pvalue"] < 1e-4
    w = ms.ic_weights([100.0, 102.0, 110.0])
    np.testing.assert_allclose(w.sum(), 1.0)
    assert w[0] > w[1] > w[2]


def test_cpo():
    rng = np.random.default_rng(0)
    # constant sitewise logliks -> CPO == that value
    m = np.full((50, 7), -3.0)
    log_cpo, lpml = ms.cpo(m)
    np.testing.assert_allclose(log_cpo, -3.0, atol=1e-12)
    np.testing.assert_allclose(lpml, -21.0)
    # with variation, CPO (harmonic mean) <= arithmetic mean per site
    m = -3.0 + rng.normal(0, 1.0, (500, 7))
    log_cpo, _ = ms.cpo(m)
    assert (log_cpo < m.mean(0) + 1e-9).all()


def test_posterior_predictive():
    p = ms.posterior_predictive_pvalue(5.0, [1, 2, 3, 7, 9, 5])
    np.testing.assert_allclose(p, 0.5)
