"""Probability distributions: priors and variational families.

Rebuild of the reference's DistributionModel family (reference:
src/phyc/distmodel.c, distmodelfactory.c:51-117 and the per-density files
distnormal.c, distlognormal.c, distgamma.c, distexp.c, distbeta.c,
distbetaprime.c, distcauchy.c, distdirichlet.c, distkumaraswamy.c,
distmultinormal.c, distoneonx.c, ctmcscale.c, gmrf.c). Each distribution is a
set of pure functions (log_prob / sample) parameterized the same ways the
reference supports (e.g. gamma shape/rate vs shape/scale, normal sigma vs tau,
exponential rate vs mean; reference: distmodel.h:26-35).

``PriorModel`` binds a distribution to target parameter names inside the
global parameter pytree, making it a compound-model component with
``log_prob(params)`` — the functional replacement for the reference's
DistributionModel-over-Parameters objects.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, betaln, ndtr

from .parameters import ParamSpec, ParamSpace

LOG_2PI = math.log(2.0 * math.pi)


# -- densities (elementwise; callers sum) -----------------------------------


def normal_logpdf(x, mean, sigma=None, tau=None):
    if sigma is None:
        sigma = 1.0 / jnp.sqrt(tau)
    z = (x - mean) / sigma
    return -0.5 * (LOG_2PI + z * z) - jnp.log(sigma)


def halfnormal_logpdf(x, sigma=None, tau=None):
    if sigma is None:
        sigma = 1.0 / jnp.sqrt(tau)
    z = x / sigma
    return math.log(2.0) - 0.5 * LOG_2PI - jnp.log(sigma) - 0.5 * z * z


def lognormal_logpdf(x, mu, sigma):
    lx = jnp.log(x)
    z = (lx - mu) / sigma
    return -0.5 * (LOG_2PI + z * z) - jnp.log(sigma) - lx


def gamma_logpdf(x, shape, rate=None, scale=None):
    if rate is None:
        rate = 1.0 / scale
    return (shape * jnp.log(rate) - gammaln(shape)
            + (shape - 1.0) * jnp.log(x) - rate * x)


def exponential_logpdf(x, rate=None, mean=None):
    if rate is None:
        rate = 1.0 / mean
    return jnp.log(rate) - rate * x


def beta_logpdf(x, alpha, beta):
    return ((alpha - 1.0) * jnp.log(x) + (beta - 1.0) * jnp.log1p(-x)
            - betaln(alpha, beta))


def betaprime_logpdf(x, alpha, beta):
    return ((alpha - 1.0) * jnp.log(x) - (alpha + beta) * jnp.log1p(x)
            - betaln(alpha, beta))


def cauchy_logpdf(x, location, scale):
    z = (x - location) / scale
    return -math.log(math.pi) - jnp.log(scale) - jnp.log1p(z * z)


def kumaraswamy_logpdf(x, a, b):
    return (jnp.log(a) + jnp.log(b) + (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-(x ** a)))


def weibull_logpdf(x, shape, scale=1.0):
    z = x / scale
    return (jnp.log(shape) - jnp.log(scale) + (shape - 1.0) * jnp.log(z)
            - z ** shape)


def dirichlet_logpdf(x, alpha):
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dtype=x.dtype), x.shape)
    return (jnp.sum((alpha - 1.0) * jnp.log(x), -1)
            + gammaln(jnp.sum(alpha, -1)) - jnp.sum(gammaln(alpha), -1))


def oneonx_logpdf(x):
    """Improper 1/x prior (reference: src/phyc/distoneonx.c)."""
    return -jnp.log(x)


def uniform_logpdf(x, lower=0.0, upper=1.0):
    inside = (x >= lower) & (x <= upper)
    return jnp.where(inside, -jnp.log(upper - lower), -jnp.inf)


def multivariate_normal_logpdf(x, mean, cov=None, scale_tril=None):
    if scale_tril is None:
        scale_tril = jnp.linalg.cholesky(cov)
    d = x.shape[-1]
    y = jax.scipy.linalg.solve_triangular(scale_tril, x - mean, lower=True)
    logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(scale_tril))))
    return -0.5 * (d * LOG_2PI + jnp.sum(y * y, -1)) - logdet


def student_t_logpdf(x, df, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return (gammaln((df + 1) / 2) - gammaln(df / 2)
            - 0.5 * jnp.log(df * math.pi) - jnp.log(scale)
            - (df + 1) / 2 * jnp.log1p(z * z / df))


def gmrf_logpdf(log_thetas, precision):
    """Gaussian Markov random field over successive differences (reference:
    src/phyc/gmrf.c — skyride/skygrid smoothing prior)."""
    d = jnp.diff(log_thetas)
    n = d.shape[-1]
    return (0.5 * n * (jnp.log(precision) - LOG_2PI)
            - 0.5 * precision * jnp.sum(d * d))


def ctmc_scale_logpdf(rate, tree_length):
    """CTMC reference prior on the clock rate (reference:
    src/phyc/ctmcscale.c:28-31): p(r) ∝ sqrt(T/r) — a Gamma(1/2, T) form."""
    total = tree_length
    return (0.5 * jnp.log(total) - 0.5 * jnp.log(jnp.pi * rate)
            - rate * total)


# -- sampling ---------------------------------------------------------------


def sample(name: str, key, sample_shape, **kw):
    """Draw samples for the named distribution (for simulation/VB/IS)."""
    if name == "normal":
        return kw["mean"] + kw["sigma"] * jax.random.normal(key, sample_shape)
    if name == "lognormal":
        return jnp.exp(kw["mu"] + kw["sigma"] * jax.random.normal(key, sample_shape))
    if name == "gamma":
        rate = kw.get("rate") or 1.0 / kw["scale"]
        return jax.random.gamma(key, kw["shape"], sample_shape) / rate
    if name == "exponential":
        rate = kw.get("rate") or 1.0 / kw["mean"]
        return jax.random.exponential(key, sample_shape) / rate
    if name == "beta":
        return jax.random.beta(key, kw["alpha"], kw["beta"], sample_shape)
    if name == "dirichlet":
        return jax.random.dirichlet(key, kw["alpha"], sample_shape[:-1])
    if name == "cauchy":
        return kw["location"] + kw["scale"] * jax.random.cauchy(key, sample_shape)
    if name == "uniform":
        return jax.random.uniform(key, sample_shape, minval=kw.get("lower", 0.0),
                                  maxval=kw.get("upper", 1.0))
    if name == "kumaraswamy":
        u = jax.random.uniform(key, sample_shape)
        return (1.0 - (1.0 - u) ** (1.0 / kw["b"])) ** (1.0 / kw["a"])
    raise ValueError(f"sampling not implemented for {name!r}")


LOGPDFS = {
    "normal": normal_logpdf,
    "halfnormal": halfnormal_logpdf,
    "lognormal": lognormal_logpdf,
    "gamma": gamma_logpdf,
    "exponential": exponential_logpdf,
    "beta": beta_logpdf,
    "betaprime": betaprime_logpdf,
    "cauchy": cauchy_logpdf,
    "kumaraswamy": kumaraswamy_logpdf,
    "weibull": weibull_logpdf,
    "dirichlet": dirichlet_logpdf,
    "oneonx": oneonx_logpdf,
    "uniform": uniform_logpdf,
    "multivariatenormal": multivariate_normal_logpdf,
    "student": student_t_logpdf,
    "gmrf": gmrf_logpdf,
}


class PriorModel:
    """A distribution over entries of the parameter pytree.

    ``targets`` — list of (param_name, index_or_None); values are gathered,
    flattened and scored elementwise (except dirichlet/mvn which score
    vectors). Hyperparameters may be fixed constants or free parameters with
    their own ParamSpecs.
    """

    def __init__(self, dist: str, targets, hyper: dict, prefix: str = "",
                 hyper_free: dict | None = None, shift: float = 0.0):
        self.dist = dist
        self.targets = list(targets)
        self.hyper = dict(hyper)
        self.prefix = prefix
        self.hyper_free = dict(hyper_free or {})
        # location offset: logP evaluated at x - shift (reference:
        # src/phyc/distmodel.h:83 ``double shift``, applied in e.g.
        # distgamma.c:31; standard for node-calibration densities)
        self.shift = float(shift)
        if dist not in LOGPDFS:
            raise ValueError(f"unknown distribution {dist!r}")

    def key(self, k):
        return f"{self.prefix}{k}" if self.prefix else k

    def param_specs(self):
        specs = []
        for hname, init in self.hyper_free.items():
            specs.append(ParamSpec.scalar(self.key(hname), init, lower=0.0
                         if hname not in ("mean", "mu", "location") else -np.inf))
        # specs for x-parameters defined inline by this distribution's config
        # node (set by config/compound.py build_distribution)
        specs += list(getattr(self, "extra_param_specs", []))
        return specs

    def param_space(self):
        return ParamSpace(self.param_specs())

    def gather(self, params):
        vals = []
        for name, idx in self.targets:
            v = params[name]
            if idx is not None:
                v = v[idx]
            vals.append(jnp.ravel(jnp.asarray(v)))
        return jnp.concatenate(vals) if vals else jnp.zeros(0)

    def hyper_values(self, params):
        out = dict(self.hyper)
        for hname in self.hyper_free:
            out[hname] = params[self.key(hname)]
        return out

    def log_prob(self, params):
        x = self.gather(params)
        if self.shift:
            x = x - self.shift
        kw = self.hyper_values(params)
        fn = LOGPDFS[self.dist]
        if self.dist in ("dirichlet", "multivariatenormal", "gmrf"):
            return jnp.sum(fn(x, **kw))
        return jnp.sum(fn(x, **kw))

    __call__ = log_prob


class CompoundModel:
    """Sum of component log-probabilities (reference:
    src/phyc/compoundmodel.c — the posterior = likelihood + priors)."""

    def __init__(self, components: list):
        self.components = list(components)

    def param_specs(self):
        specs = []
        for c in self.components:
            specs.extend(c.param_specs())
        return specs

    def param_space(self) -> ParamSpace:
        return ParamSpace(self.param_specs())

    def log_prob(self, params):
        total = 0.0
        for c in self.components:
            fn = getattr(c, "log_prob", None) or getattr(c, "log_likelihood")
            total = total + fn(params)
        return total

    __call__ = log_prob
