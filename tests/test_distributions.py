"""Distribution logP/gradient checks against scipy (the reference's
tests/test_distributions.c pins the same quantities to hard-coded values;
scipy is an equivalent independent oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from physher_tpu.models import distributions as D

X = np.array([0.3, 1.7, 2.4])
X01 = np.array([0.1, 0.4, 0.9])


CASES = [
    ("normal", dict(mean=0.5, sigma=2.0), X,
     lambda x: st.norm.logpdf(x, 0.5, 2.0)),
    ("normal-tau", dict(mean=0.5, tau=0.25), X,
     lambda x: st.norm.logpdf(x, 0.5, 2.0)),
    ("lognormal", dict(mu=0.5, sigma=1.5), X,
     lambda x: st.lognorm.logpdf(x, 1.5, scale=np.exp(0.5))),
    ("gamma-rate", dict(shape=2.0, rate=3.0), X,
     lambda x: st.gamma.logpdf(x, 2.0, scale=1 / 3.0)),
    ("gamma-scale", dict(shape=2.0, scale=0.5), X,
     lambda x: st.gamma.logpdf(x, 2.0, scale=0.5)),
    ("exponential-rate", dict(rate=2.0), X,
     lambda x: st.expon.logpdf(x, scale=0.5)),
    ("exponential-mean", dict(mean=0.5), X,
     lambda x: st.expon.logpdf(x, scale=0.5)),
    ("beta", dict(alpha=2.0, beta=3.0), X01,
     lambda x: st.beta.logpdf(x, 2.0, 3.0)),
    ("cauchy", dict(location=1.0, scale=2.0), X,
     lambda x: st.cauchy.logpdf(x, 1.0, 2.0)),
    ("betaprime", dict(alpha=2.0, beta=3.0), X,
     lambda x: st.betaprime.logpdf(x, 2.0, 3.0)),
    ("weibull", dict(shape=1.4, scale=2.0), X,
     lambda x: st.weibull_min.logpdf(x, 1.4, scale=2.0)),
    ("student", dict(df=4.0, loc=0.5, scale=2.0), X,
     lambda x: st.t.logpdf(x, 4.0, 0.5, 2.0)),
    ("halfnormal", dict(sigma=2.0), X,
     lambda x: st.halfnorm.logpdf(x, scale=2.0)),
    ("kumaraswamy", dict(a=2.0, b=3.0), X01,
     lambda x: np.log(2.0 * 3.0) + np.log(x) + 2.0 * np.log1p(-x**2)),
]


@pytest.mark.parametrize("name,kw,x,ref", CASES,
                         ids=[c[0] for c in CASES])
def test_logpdf(name, kw, x, ref):
    fn = D.LOGPDFS[name.split("-")[0]]
    mine = np.asarray(fn(jnp.asarray(x), **kw))
    np.testing.assert_allclose(mine, ref(x), rtol=1e-12)
    # gradient wrt x: autodiff vs FD
    g = jax.grad(lambda xx: jnp.sum(fn(xx, **kw)))(jnp.asarray(x))
    eps = 1e-7
    fd = (np.asarray(fn(jnp.asarray(x + eps), **kw))
          - np.asarray(fn(jnp.asarray(x - eps), **kw))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-5)


def test_dirichlet():
    alpha = np.array([1.0, 2.0, 3.0, 4.0])
    x = np.array([0.1, 0.2, 0.3, 0.4])
    mine = float(D.dirichlet_logpdf(jnp.asarray(x), jnp.asarray(alpha)))
    np.testing.assert_allclose(mine, st.dirichlet.logpdf(x, alpha), rtol=1e-12)


def test_multivariate_normal():
    mean = np.array([0.5, -0.5])
    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    x = np.array([0.2, 0.7])
    mine = float(D.multivariate_normal_logpdf(
        jnp.asarray(x), jnp.asarray(mean), cov=jnp.asarray(cov)))
    np.testing.assert_allclose(
        mine, st.multivariate_normal.logpdf(x, mean, cov), rtol=1e-12)


def test_gmrf():
    lt = np.array([0.3, 0.8, 0.1, -0.4])
    prec = 2.0
    d = np.diff(lt)
    expect = np.sum(st.norm.logpdf(d, 0, 1 / np.sqrt(prec)))
    mine = float(D.gmrf_logpdf(jnp.asarray(lt), prec))
    np.testing.assert_allclose(mine, expect, rtol=1e-12)


def test_oneonx():
    np.testing.assert_allclose(
        np.asarray(D.oneonx_logpdf(jnp.asarray(X))), -np.log(X), rtol=1e-14)


def test_prior_model_and_compound():
    from physher_tpu.models.parameters import ParamSpace, ParamSpec

    prior = D.PriorModel("gamma", [("alpha", None)],
                         {"shape": 0.5, "rate": 0.5})
    params = {"alpha": jnp.asarray(0.7)}
    np.testing.assert_allclose(
        float(prior.log_prob(params)),
        st.gamma.logpdf(0.7, 0.5, scale=2.0), rtol=1e-12)

    prior2 = D.PriorModel("exponential", [("bl", None)], {"rate": 10.0})
    params["bl"] = jnp.asarray([0.1, 0.2])
    comp = D.CompoundModel([prior, prior2])
    np.testing.assert_allclose(
        float(comp.log_prob(params)),
        st.gamma.logpdf(0.7, 0.5, scale=2.0)
        + st.expon.logpdf([0.1, 0.2], scale=0.1).sum(), rtol=1e-12)


def test_sampling_moments():
    key = jax.random.PRNGKey(0)
    s = D.sample("gamma", key, (200000,), shape=3.0, rate=2.0)
    np.testing.assert_allclose(float(jnp.mean(s)), 1.5, rtol=0.02)
    s = D.sample("lognormal", key, (200000,), mu=0.0, sigma=0.5)
    np.testing.assert_allclose(float(jnp.mean(s)), np.exp(0.125), rtol=0.02)
