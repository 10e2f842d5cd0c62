"""Branch-rate (clock) models: strict, discrete/local, relaxed.

Rebuild of the reference's BranchModel (reference: src/phyc/branchmodel.c,
branchmodel.h:31-68). A clock model maps parameters to one substitution rate
per node ``[N]`` (the root entry is unused). Discrete/local clocks use a
static node->rate-class index map (the reference's DiscreteParameter map);
relaxed clocks expose one rate per branch with a lognormal/exponential prior
applied separately at the inference level.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .parameters import ParamSpec, ParamSpace


class BranchModel:
    def __init__(self, N: int, prefix: str = ""):
        self.N = N
        self.prefix = prefix

    def key(self, k):
        return f"{self.prefix}{k}" if self.prefix else k

    def param_specs(self) -> list:
        return []

    def param_space(self) -> ParamSpace:
        return ParamSpace(self.param_specs())

    def rates(self, params) -> jnp.ndarray:
        """Per-node substitution rate [N]."""
        raise NotImplementedError


class StrictClock(BranchModel):
    """One global rate (reference: branchmodel.c CLOCK_STRICT)."""

    def __init__(self, N, prefix="", rate_init=1e-3, fixed=False):
        super().__init__(N, prefix)
        self.rate_init = rate_init
        self.fixed = fixed

    def param_specs(self):
        mk = ParamSpec.fixed if self.fixed else (
            lambda n, v: ParamSpec.scalar(n, v, lower=0.0))
        return [mk(self.key("rate"), self.rate_init)]

    def rates(self, params):
        return jnp.broadcast_to(params[self.key("rate")], (self.N,))


class DiscreteClock(BranchModel):
    """Rate classes assigned to branches via a static index map
    (reference: branchmodel.c CLOCK_DISCRETE / CLOCK_LOCAL with a
    DiscreteParameter node->class map)."""

    def __init__(self, N, class_map, prefix="", rates_init=None):
        super().__init__(N, prefix)
        self.class_map = np.asarray(class_map, dtype=np.int32)
        if self.class_map.shape != (N,):
            raise ValueError("class_map must have one entry per node")
        self.n_classes = int(self.class_map.max()) + 1
        self.rates_init = (np.full(self.n_classes, 1e-3) if rates_init is None
                           else np.asarray(rates_init))

    def param_specs(self):
        return [ParamSpec.vector(self.key("rates"), self.rates_init, lower=0.0)]

    def rates(self, params):
        return params[self.key("rates")][self.class_map]


class LocalClock(DiscreteClock):
    """Local molecular clocks placed by node indicators (reference:
    branchmodel.c CLOCK_LOCAL — indicator bits on nodes; every branch in the
    clade below an active node inherits that node's local rate, nearest
    active ancestor wins; branchmodel.h:64-67 SSVS indicators).

    The indicator->class map is resolved host-side (it is a topology walk,
    not a hot path); clock-placement *search* re-instantiates the map per
    candidate, which is how the reference's GA explores placements.
    """

    def __init__(self, topo, indicators, prefix="", rates_init=None,
                 include_root_clade: bool = True):
        self.topo = topo
        self.indicators = np.asarray(indicators, dtype=bool)
        if self.indicators.shape != (topo.N,):
            raise ValueError("one indicator per node required")
        class_map = self.class_map_from_indicators(topo, self.indicators)
        super().__init__(topo.N, class_map, prefix, rates_init)

    @staticmethod
    def class_map_from_indicators(topo, indicators) -> np.ndarray:
        """class 0 = background; active node i gets class 1+rank(i); a
        node's class is that of its nearest active ancestor-or-self."""
        active = np.flatnonzero(indicators)
        cls_of = {int(n): i + 1 for i, n in enumerate(active)}
        cmap = np.zeros(topo.N, dtype=np.int32)
        # preorder: parents before children => walk internal nodes downward
        for k in range(topo.I - 1, -1, -1):
            node = topo.T + k
            if node in cls_of:
                cmap[node] = cls_of[node]
            for c in topo.children[k, : topo.child_count[k]]:
                cmap[c] = cls_of.get(int(c), cmap[node])
        root = topo.N - 1
        if root in cls_of:
            cmap[root] = cls_of[root]
        return cmap


class RelaxedClock(BranchModel):
    """Free per-branch rates; the distributional assumption (lognormal /
    exponential across branches) enters as a prior on these parameters
    (reference: branchmodel.c CLOCK_RELAXED)."""

    def __init__(self, N, prefix="", rate_init=1e-3):
        super().__init__(N, prefix)
        self.rate_init = rate_init

    def param_specs(self):
        return [ParamSpec.vector(self.key("rates"),
                                 np.full(self.N - 1, self.rate_init),
                                 lower=0.0)]

    def rates(self, params):
        r = params[self.key("rates")]
        return jnp.concatenate([r, jnp.zeros(1, r.dtype)])


class DistributionRelaxedClock(BranchModel):
    """Discretized-distribution relaxed clock (reference: branchmodel.c
    new_RelaxedClock + _relaxedclock_calculate_rates, branchmodel.h:33
    RELAXED_LOGNORMAL / RELAXED_EXPONENTIAL / RELAXED_DISCRETE).

    The distribution is discretized into ``n_cats`` quantile-midpoint rates
    (z_i = (i+0.5)/n; reference: lognormal.c:48 lognormal_discretize,
    exponential.c:55 exponential_discretize) and a per-node assignment map
    selects which bin each branch uses (the reference samples the map with
    MCMC exchange operators; here it is a static int array re-instantiable
    per proposal, matching DiscreteClock's map mechanics).

    Free parameters: the distribution's hyper-parameters
    (lognormal: ``logmean``, ``logsigma``; exponential: ``lambda``;
    discrete: ``center`` with log-spaced bins center/10 .. center*10,
    reference branchmodel.c:1248-1258).
    """

    def __init__(self, N, distribution="lognormal", prefix="",
                 assignment=None, n_cats=None, logmean_init=-7.0,
                 logsigma_init=0.5, lambda_init=1e3, center_init=1e-3):
        super().__init__(N, prefix)
        self.distribution = str(distribution).lower()
        if self.distribution not in ("lognormal", "exponential", "discrete"):
            raise ValueError(f"unknown relaxed distribution {distribution!r}")
        self.n_cats = int(n_cats or N)
        if assignment is None:
            assignment = np.arange(N) % self.n_cats
        self.assignment = np.asarray(assignment, dtype=np.int32)
        if self.assignment.shape != (N,):
            raise ValueError("assignment must have one entry per node")
        self.logmean_init = logmean_init
        self.logsigma_init = logsigma_init
        self.lambda_init = lambda_init
        self.center_init = center_init

    def param_specs(self):
        if self.distribution == "lognormal":
            return [ParamSpec.scalar(self.key("logmean"), self.logmean_init),
                    ParamSpec.scalar(self.key("logsigma"),
                                     self.logsigma_init, lower=0.0)]
        if self.distribution == "exponential":
            return [ParamSpec.scalar(self.key("lambda"), self.lambda_init,
                                     lower=0.0)]
        return [ParamSpec.scalar(self.key("center"), self.center_init,
                                 lower=0.0)]

    def bin_rates(self, params) -> jnp.ndarray:
        """The n_cats quantile-midpoint rates."""
        from jax.scipy.special import ndtri

        n = self.n_cats
        z = (jnp.arange(n) + 0.5) / n
        if self.distribution == "lognormal":
            mu = params[self.key("logmean")]
            sig = params[self.key("logsigma")]
            return jnp.exp(mu + sig * ndtri(z))
        if self.distribution == "exponential":
            lam = params[self.key("lambda")]
            return -jnp.log1p(-z) / lam
        center = params[self.key("center")]
        # log-spaced bins over [center/10, center*10] split at the center
        # (reference: branchmodel.c:1248-1258, magnitude 10)
        n_lower = n // 2
        n_upper = n - n_lower
        lo = jnp.exp(jnp.linspace(jnp.log(center) - jnp.log(10.0),
                                  jnp.log(center), n_lower, endpoint=False))
        hi = jnp.exp(jnp.linspace(jnp.log(center),
                                  jnp.log(center) + jnp.log(10.0), n_upper))
        return jnp.concatenate([lo, hi])

    def rates(self, params):
        return self.bin_rates(params)[self.assignment]


def ancestor_chains(topo) -> np.ndarray:
    """[N, D] ancestor chain per node: row = (self, parent, ..., root),
    right-padded with the root id. Static topology bookkeeping for the
    jittable SSVS rate resolution below."""
    N = topo.N
    chains = []
    for n in range(N):
        chain = [n]
        while topo.parent[chain[-1]] >= 0:
            chain.append(int(topo.parent[chain[-1]]))
        chains.append(chain)
    D = max(len(c) for c in chains)
    out = np.full((N, D), topo.root, dtype=np.int32)
    for n, c in enumerate(chains):
        out[n, : len(c)] = c
    return out


class SSVSLocalClock(BranchModel):
    """Local clocks with *sampled* placements: per-node indicator bits are
    part of the MCMC state (reference: branchmodel.h:64-67 SSVS indicators +
    the bitflip operator, operator.c). Unlike :class:`LocalClock` (static
    host-resolved placements), the indicator->rate resolution here is a
    jittable gather: a node takes the local rate of its nearest
    indicator-active ancestor-or-self, else the background rate.

    Parameters: ``rate`` (background, scalar), ``local_rates`` ([N], the
    rate a node's clade inherits while its indicator is set).
    Use with :class:`physher_tpu.inference.mcmc.MixedMCMC` — the bits vector
    is the sampler's discrete state, not a ParamSpec.
    """

    def __init__(self, topo, prefix="", rate_init=1e-3):
        super().__init__(topo.N, prefix)
        self.topo = topo
        self.chains = jnp.asarray(ancestor_chains(topo))  # [N, D]
        self.rate_init = rate_init

    def param_specs(self):
        return [
            ParamSpec.scalar(self.key("rate"), self.rate_init, lower=0.0),
            ParamSpec.vector(self.key("local_rates"),
                             np.full(self.N, self.rate_init), lower=0.0),
        ]

    def rates_from_indicators(self, params, bits) -> jnp.ndarray:
        """Effective per-node rates [N] given indicator bits [N] (int/bool).

        first-active-ancestor = argmax over the (self->root) chain of the
        bit mask (argmax returns the FIRST maximum, i.e. the nearest).
        """
        bits = jnp.asarray(bits)
        b = bits[self.chains]                        # [N, D]
        has = jnp.any(b > 0, axis=1)                 # [N]
        first = jnp.argmax(b, axis=1)                # [N]
        src = jnp.take_along_axis(self.chains, first[:, None], axis=1)[:, 0]
        local = params[self.key("local_rates")][src]
        return jnp.where(has, local, params[self.key("rate")])

    def rates(self, params):
        # without bits this degenerates to a strict clock
        return jnp.broadcast_to(params[self.key("rate")], (self.N,))
