"""Distribution `shift` offsets (reference: src/phyc/distmodel.h:83).

The reference reads ``"shift"`` in every family parser but only gamma
(distgamma.c:31) and kumaraswamy apply it in logP; sampling adds it for
all families (distgamma.c:138-176), so the intended semantics are a
location offset: logP(x) = logpdf(x - shift). physher_tpu applies it
uniformly (PARITY.md notes the reference's internal inconsistency).

The gamma golden below was minted from the reference itself via
tools/reforacle_dist.c (full-source build + tools/gslshim), with
hyper-parameter ids named exactly "shape"/"rate" — the reference's
argument-order guard compares the parameter NAME against "shape"
(distgamma.c:268-272), so ids like "g.shape" silently swap shape and
rate. Note the factory-level allowed-key list rejects "shift" outright
(distmodelfactory.c:47 + mjson.c:588 exit(12)); in the reference it is
reachable only through direct family parsing (laplace refdist,
laplace.c:1025). Our config layer accepts it on any distribution node.
"""

import numpy as np
import pytest
from scipy import stats

from physher_tpu.config.builder import Context
from physher_tpu.config.compound import build_distribution

# minted: /tmp/reforacle_dist shift_g.json g
# gamma(shape=3, rate=1.5) shift=2 at x=2.9
REF_GAMMA_SHIFTED = -1.0374728875511048


def _build(node):
    ctx = Context(".")
    prior = build_distribution(node, ctx)
    space = prior.param_space()
    return prior, space.init_params()


def test_gamma_shift_matches_reference_golden():
    node = {
        "id": "g", "type": "distribution", "distribution": "gamma",
        "shift": 2.0,
        "parameters": {"shape": 3.0, "rate": 1.5},
        "x": {"id": "y", "type": "parameter", "value": 2.9, "lower": 0},
    }
    prior, params = _build(node)
    np.testing.assert_allclose(float(prior.log_prob(params)),
                               REF_GAMMA_SHIFTED, rtol=1e-12)


def test_shift_zero_is_default():
    node = {
        "id": "g", "type": "distribution", "distribution": "gamma",
        "parameters": {"shape": 3.0, "rate": 1.5},
        "x": {"id": "y", "type": "parameter", "value": 0.9, "lower": 0},
    }
    prior, params = _build(node)
    np.testing.assert_allclose(float(prior.log_prob(params)),
                               stats.gamma.logpdf(0.9, 3.0, scale=1 / 1.5),
                               rtol=1e-10)


@pytest.mark.parametrize("dist,hyper,scipy_fn,x,shift", [
    ("lognormal", {"mu": 0.5, "sigma": 1.2},
     lambda z: stats.lognorm.logpdf(z, 1.2, scale=np.exp(0.5)), 3.7, 1.0),
    ("exponential", {"lambda": 2.0},
     lambda z: stats.expon.logpdf(z, scale=0.5), 1.3, 0.5),
])
def test_shift_uniform_semantics(dist, hyper, scipy_fn, x, shift):
    """Families where the reference parses-but-ignores shift in logP:
    physher_tpu applies the (intended, sampling-consistent) location
    offset uniformly."""
    node = {
        "id": "d", "type": "distribution", "distribution": dist,
        "shift": shift, "parameters": dict(hyper),
        "x": {"id": "y", "type": "parameter", "value": x, "lower": 0},
    }
    prior, params = _build(node)
    np.testing.assert_allclose(float(prior.log_prob(params)),
                               float(scipy_fn(x - shift)), rtol=1e-10)
