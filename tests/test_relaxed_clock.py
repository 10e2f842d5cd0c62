"""Discretized relaxed clocks (reference: branchmodel.c new_RelaxedClock,
_relaxedclock_calculate_rates; lognormal.c:48 / exponential.c:55
discretization at quantile midpoints z_i = (i+0.5)/n)."""

import numpy as np
import scipy.stats as st

from physher_tpu.models.clock import DistributionRelaxedClock


def test_lognormal_bins_match_quantile_midpoints():
    N = 8
    bm = DistributionRelaxedClock(N, "lognormal", logmean_init=-7.0,
                                  logsigma_init=0.5)
    p = bm.param_space().init_params()
    bins = np.asarray(bm.bin_rates(p))
    z = (np.arange(N) + 0.5) / N
    expected = st.lognorm.ppf(z, s=0.5, scale=np.exp(-7.0))
    np.testing.assert_allclose(bins, expected, rtol=1e-6)
    rates = np.asarray(bm.rates(p))
    assert rates.shape == (N,)
    np.testing.assert_allclose(rates, bins[np.arange(N) % N])


def test_exponential_bins_match_quantile_midpoints():
    N = 6
    lam = 250.0
    bm = DistributionRelaxedClock(N, "exponential", lambda_init=lam,
                                  n_cats=4)
    p = bm.param_space().init_params()
    bins = np.asarray(bm.bin_rates(p))
    z = (np.arange(4) + 0.5) / 4
    np.testing.assert_allclose(bins, st.expon.ppf(z, scale=1 / lam),
                               rtol=1e-6)


def test_discrete_bins_span_decade_around_center():
    bm = DistributionRelaxedClock(10, "discrete", center_init=1e-3)
    p = bm.param_space().init_params()
    bins = np.asarray(bm.bin_rates(p))
    assert bins.min() >= 1e-4 * (1 - 1e-9)
    np.testing.assert_allclose(bins.max(), 1e-2, rtol=1e-9)
    assert np.all(np.diff(bins) > 0)


def test_config_builds_distribution_relaxed_clock():
    from physher_tpu.config.builder import Context, build_branchmodel

    ctx = Context()
    node = {"id": "bm", "type": "branchmodel", "model": "relaxed",
            "distribution": "lognormal",
            "parameters": {
                "logmean": {"id": "bm.logmean", "type": "parameter",
                            "value": -6.5},
                "logsigma": {"id": "bm.logsigma", "type": "parameter",
                             "value": 0.3, "lower": 0}},
            "categories": 4}
    bm = build_branchmodel(node, ctx, N=12)
    assert isinstance(bm, DistributionRelaxedClock)
    assert bm.n_cats == 4
    p = bm.param_space().init_params()
    assert float(p["bm.logmean"]) == -6.5
    r = np.asarray(bm.rates(p))
    assert r.shape == (12,) and np.all(r > 0)
    # hyper-parameter ids registered for operators/optimizers
    assert ctx.param_names["bm.logmean"] == "bm.logmean"
