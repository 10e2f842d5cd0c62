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
