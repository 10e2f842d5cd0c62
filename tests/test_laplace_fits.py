"""Per-distribution Laplace fits (reference: src/phyc/laplace.c:81-918).

Each envelope family matches mode + curvature at the MAP; when the target
IS an unnormalized member of that family, the estimate equals the true log
normalizer exactly — the same identity the reference exploits.
"""

import math

import jax.numpy as jnp
import numpy as np
from scipy.special import betaln, gammaln

from physher_tpu.inference.marginal import laplace_marginal_fitted
from physher_tpu.models.parameters import ParamSpec, ParamSpace


def _space(name, init, lower=0.0, upper=np.inf):
    return ParamSpace([ParamSpec.scalar(name, init, lower=lower, upper=upper)])


def test_gamma_fit_recovers_exact_normalizer():
    alpha, beta = 3.5, 2.0
    space = _space("x", (alpha - 1) / beta)

    def log_prob(p):
        x = p["x"]
        return (alpha - 1.0) * jnp.log(x) - beta * x

    got = laplace_marginal_fitted(log_prob, space, space.init_params(),
                                  family="gamma")
    expected = float(gammaln(alpha) - alpha * math.log(beta))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_lognormal_fit_recovers_exact_normalizer():
    mu, sigma = 0.3, 0.4
    mode = math.exp(mu - sigma * sigma)
    space = _space("x", mode)

    def log_prob(p):
        x = p["x"]
        return -jnp.log(x) - (jnp.log(x) - mu) ** 2 / (2 * sigma * sigma)

    got = laplace_marginal_fitted(log_prob, space, space.init_params(),
                                  family="lognormal")
    expected = float(0.5 * math.log(2 * math.pi) + math.log(sigma))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_beta_fit_recovers_exact_normalizer():
    a, b = 3.0, 4.0
    mode = (a - 1) / (a + b - 2)
    space = _space("x", mode, lower=0.0, upper=1.0)

    def log_prob(p):
        x = p["x"]
        return (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x)

    got = laplace_marginal_fitted(log_prob, space, space.init_params(),
                                  family="beta")
    np.testing.assert_allclose(got, float(betaln(a, b)), rtol=1e-8)


def test_betaprime_fit_recovers_exact_normalizer():
    a, b = 2.5, 3.0
    mode = (a - 1) / (b + 1)
    space = _space("x", mode)

    def log_prob(p):
        x = p["x"]
        return (a - 1.0) * jnp.log(x) - (a + b) * jnp.log1p(x)

    got = laplace_marginal_fitted(log_prob, space, space.init_params(),
                                  family="betaprime")
    np.testing.assert_allclose(got, float(betaln(a, b)), rtol=1e-8)


def test_gamma_fit_through_runner_action():
    from physher_tpu.config.builder import Context
    from physher_tpu.config.actions import Runner

    alpha, beta = 4.0, 1.5

    class Model:
        def param_space(self):
            return _space("x", (alpha - 1) / beta)

        def log_prob(self, p):
            return (alpha - 1.0) * jnp.log(p["x"]) - beta * p["x"]

    ctx = Context()
    ctx.objects["m"] = Model()
    r = Runner(ctx, seed=0)
    val = r.action_laplace({"model": "&m", "distribution": "gamma",
                            "id": "lap"})
    np.testing.assert_allclose(
        val, float(gammaln(alpha) - alpha * math.log(beta)), rtol=1e-10)
