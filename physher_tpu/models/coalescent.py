"""Coalescent models: constant, exponential growth, skyline, skyride,
skygrid, piecewise-linear grid.

Rebuild of the reference's demographic models (reference:
src/phyc/demographicmodels.c:1-2419; parameterizations theta / log-theta
demographicmodels.h:40-44; interval bookkeeping h:51-59). The reference
rebuilds {lineages, times, iscoalescent} interval lists lazily on the CPU;
here the decomposition is a differentiable sort over node heights executed
inside jit, so gradients w.r.t. thetas AND node heights come from autodiff
(the reference hand-codes these, demographicmodels.h:134-136).

All models expose ``log_prob_from_heights(heights, params)`` plus the
compound-model protocol via a bound time tree.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .parameters import ParamSpec, ParamSpace
from ..trees.topology import Topology


def _events(topo: Topology):
    """Static event signs: +1 lineage at tips, -1 at internal (coalescent)."""
    delta = np.concatenate([np.ones(topo.T), -np.ones(topo.I)])
    is_coal = np.concatenate([np.zeros(topo.T, bool), np.ones(topo.I, bool)])
    return delta, is_coal


def interval_decomposition(heights, topo: Topology, extra_times=None):
    """Sort events (and optional grid times) into intervals.

    Returns dict with per-interval start/duration, active-lineage pair counts,
    a flag/time for coalescent events, and the cumulative counters needed to
    index theta arrays. All jnp; differentiable w.r.t. heights.
    """
    delta, is_coal = _events(topo)
    times = heights
    d = jnp.asarray(delta, dtype=heights.dtype)
    c = jnp.asarray(is_coal)
    g = jnp.zeros(topo.N, dtype=bool)
    if extra_times is not None:
        et = jnp.asarray(extra_times, dtype=heights.dtype)
        times = jnp.concatenate([times, et])
        d = jnp.concatenate([d, jnp.zeros_like(et)])
        c = jnp.concatenate([c, jnp.zeros(et.shape[0], dtype=bool)])
        g = jnp.concatenate([g, jnp.ones(et.shape[0], dtype=bool)])
    order = jnp.argsort(times, stable=True)
    t = times[order]
    d = d[order]
    c = c[order]
    g = g[order]
    k = jnp.cumsum(d)                      # lineages AFTER event i
    pairs = k * (k - 1.0) / 2.0            # active pairs on interval [t_i, t_{i+1})
    dt = jnp.diff(t)                       # interval durations (len-1)
    # counters: number of coalescent events strictly before event i;
    # number of grid lines at or before event i
    coal_incl = jnp.cumsum(c.astype(jnp.int32))
    coal_before = coal_incl - c.astype(jnp.int32)
    grid_before = jnp.cumsum(g)
    return {
        "t": t, "dt": dt, "pairs": pairs[:-1], "is_coal": c,
        "is_grid": g, "coal_before": coal_before, "coal_incl": coal_incl,
        "grid_before": grid_before, "start": t[:-1],
    }


class CoalescentModel:
    """Base: theta(t) model over a time tree's heights."""

    def __init__(self, topo: Topology, prefix: str = "coalescent.",
                 log_space: bool = False):
        self.topo = topo
        self.prefix = prefix
        self.log_space = log_space
        self.tree_param_fn = None  # set by bind_tree

    def key(self, k):
        return f"{self.prefix}{k}" if self.prefix else k

    def param_specs(self) -> list:
        return []

    def param_space(self):
        return ParamSpace(self.param_specs())

    def bind_tree(self, heights_fn):
        """Attach a callable params -> heights (a TreeLikelihood.node_heights
        or a TimeTree parameterization) for the compound-model protocol."""
        self.tree_param_fn = heights_fn
        return self

    def log_prob(self, params):
        if self.tree_param_fn is None:
            raise ValueError("coalescent not bound to a tree; call bind_tree")
        return self.log_prob_from_heights(self.tree_param_fn(params), params)

    __call__ = log_prob

    def _thetas(self, params):
        th = params[self.key("thetas")]
        if self.log_space:
            th = jnp.exp(th)
        return th

    def log_prob_from_heights(self, heights, params):
        raise NotImplementedError


class ConstantCoalescent(CoalescentModel):
    """theta(t) = N (reference: demographicmodels.c new_ConstantCoalescent)."""

    def __init__(self, topo, prefix="coalescent.", theta_init=1.0,
                 log_space=False):
        super().__init__(topo, prefix, log_space)
        self.theta_init = theta_init

    def param_specs(self):
        if self.log_space:
            return [ParamSpec.scalar(self.key("theta"),
                                     np.log(self.theta_init))]
        return [ParamSpec.scalar(self.key("theta"), self.theta_init,
                                 lower=0.0)]

    def log_prob_from_heights(self, heights, params):
        theta = params[self.key("theta")]
        if self.log_space:
            theta = jnp.exp(theta)
        iv = interval_decomposition(heights, self.topo)
        integral = jnp.sum(iv["pairs"] * iv["dt"]) / theta
        n_coal = self.topo.I
        return -integral - n_coal * jnp.log(theta)


class ExponentialCoalescent(CoalescentModel):
    """theta(t) = N0 * exp(-r t) (reference: demographicmodels.c exponential
    growth)."""

    def __init__(self, topo, prefix="coalescent.", n0_init=1.0, rate_init=0.0):
        super().__init__(topo, prefix)
        self.n0_init = n0_init
        self.rate_init = rate_init

    def param_specs(self):
        return [
            ParamSpec.scalar(self.key("n0"), self.n0_init, lower=0.0),
            ParamSpec.scalar(self.key("rate"), self.rate_init),
        ]

    def log_prob_from_heights(self, heights, params):
        n0 = params[self.key("n0")]
        r = params[self.key("rate")]
        iv = interval_decomposition(heights, self.topo)
        t0 = iv["start"]
        t1 = iv["start"] + iv["dt"]
        # int dt / (N0 e^{-rt}) = (e^{r t1} - e^{r t0}) / (N0 r); -> dt/N0 as r->0
        small = jnp.abs(r) < 1e-12
        rs = jnp.where(small, 1.0, r)
        seg = jnp.where(
            small, iv["dt"] / n0,
            (jnp.exp(rs * t1) - jnp.exp(rs * t0)) / (n0 * rs))
        integral = jnp.sum(iv["pairs"] * seg)
        coal_t = heights[self.topo.T:]
        log_theta_at_coal = jnp.log(n0) - r * coal_t
        return -integral - jnp.sum(log_theta_at_coal)


class SkyrideCoalescent(CoalescentModel):
    """One theta per inter-coalescent interval (reference:
    demographicmodels.c new_SkyrideCoalescent; Minin et al skyride).

    Parameterizations (reference: demographicmodels.h:40-44):
    - theta / logtheta — direct (possibly logged) per-interval population
      sizes;
    - delta — incremental: v[0] = theta_0 (real space), then
      log theta_i = log theta_{i-1} + zeta*(zgam/tau)*v[i] with zeta=0.015
      and (zgam, tau) appended as the last two entries of the parameter
      vector (reference: _coalescent_skyride_calculate_deltas,
      demographicmodels.c:1337-1373; note the reference's JSON dispatch at
      demographicmodels.c:506-512 inverts its strcasecmp tests, making
      "delta" unreachable from JSON there — we implement the intended
      semantics).
    """

    ZETA = 0.015  # fixed smoothing constant (demographicmodels.c:1344)

    def __init__(self, topo, prefix="coalescent.", thetas_init=None,
                 log_space=True, delta: bool = False):
        super().__init__(topo, prefix, log_space)
        self.delta = bool(delta)
        n = topo.I + 2 if self.delta else topo.I
        self.thetas_init = (np.zeros(n) if thetas_init is None
                            else np.asarray(thetas_init))
        if self.delta and len(self.thetas_init) != n:
            raise ValueError(
                f"delta parameterization needs {n} values "
                f"(theta0, {topo.I - 1} increments, zgam, tau)")

    def param_specs(self):
        if self.delta:
            return [ParamSpec.vector(self.key("thetas"), self.thetas_init)]
        if self.log_space:
            return [ParamSpec.vector(self.key("thetas"), self.thetas_init)]
        return [ParamSpec.vector(self.key("thetas"), self.thetas_init,
                                 lower=0.0)]

    def _thetas(self, params):
        if not self.delta:
            return super()._thetas(params)
        v = params[self.key("thetas")]
        zgam, tau = v[-2], v[-1]
        gam = zgam / tau
        incr = self.ZETA * gam * v[1:-2]
        log_thetas = jnp.log(v[0]) + jnp.concatenate(
            [jnp.zeros(1, v.dtype), jnp.cumsum(incr)])
        return jnp.exp(log_thetas)

    def log_prob_from_heights(self, heights, params):
        thetas = self._thetas(params)
        iv = interval_decomposition(heights, self.topo)
        idx = iv["coal_incl"][:-1]  # theta index per interval (inclusive)
        theta_iv = thetas[idx]
        integral = jnp.sum(iv["pairs"] * iv["dt"] / theta_iv)
        # one -log theta per coalescent event, theta of ITS interval
        idx_ev = iv["coal_before"]
        ev_terms = jnp.where(iv["is_coal"], jnp.log(thetas[idx_ev]), 0.0)
        return -integral - jnp.sum(ev_terms)


class SkylineCoalescent(SkyrideCoalescent):
    """Grouped skyline: consecutive coalescent intervals share thetas via a
    static group-size map (reference: demographicmodels.c classic/Bayesian
    skyline)."""

    def __init__(self, topo, groups, prefix="coalescent.", thetas_init=None,
                 log_space=True):
        self.groups = np.asarray(groups, dtype=np.int64)
        if self.groups.sum() != topo.I:
            raise ValueError("skyline group sizes must sum to #coalescences")
        n = len(self.groups)
        CoalescentModel.__init__(self, topo, prefix, log_space)
        self.delta = False
        self.thetas_init = (np.zeros(n) if thetas_init is None
                            else np.asarray(thetas_init))
        # map coalescent-interval index -> group index
        self.interval_group = np.repeat(np.arange(n), self.groups)

    def log_prob_from_heights(self, heights, params):
        thetas = self._thetas(params)[jnp.asarray(self.interval_group)]
        iv = interval_decomposition(heights, self.topo)
        idx = iv["coal_incl"][:-1]
        integral = jnp.sum(iv["pairs"] * iv["dt"] / thetas[idx])
        ev = jnp.where(iv["is_coal"], jnp.log(thetas[iv["coal_before"]]), 0.0)
        return -integral - jnp.sum(ev)


class SkygridCoalescent(CoalescentModel):
    """Piecewise-constant theta on a fixed grid [0, cutoff] (reference:
    demographicmodels.c new_GridCoalescent; Gill et al skygrid).

    ``grid`` thetas; edges at k*cutoff/(grid-1), k=1..grid-1; the last theta
    extends beyond the cutoff.
    """

    def __init__(self, topo, grid: int, cutoff: float, prefix="coalescent.",
                 thetas_init=None, log_space=True):
        super().__init__(topo, prefix, log_space)
        self.grid = int(grid)
        self.cutoff = float(cutoff)
        self.edges = np.linspace(0.0, cutoff, grid)[1:]  # grid-1 edges
        self.thetas_init = (np.zeros(self.grid) if thetas_init is None
                            else np.asarray(thetas_init))

    def param_specs(self):
        if self.log_space:
            return [ParamSpec.vector(self.key("thetas"), self.thetas_init)]
        return [ParamSpec.vector(self.key("thetas"), self.thetas_init,
                                 lower=0.0)]

    def log_prob_from_heights(self, heights, params):
        thetas = self._thetas(params)
        iv = interval_decomposition(heights, self.topo, self.edges)
        cell = iv["grid_before"][:-1]  # theta index per interval
        integral = jnp.sum(iv["pairs"] * iv["dt"] / thetas[cell])
        ev = jnp.where(iv["is_coal"], jnp.log(thetas[iv["grid_before"]]), 0.0)
        return -integral - jnp.sum(ev)


class PiecewiseLinearCoalescent(CoalescentModel):
    """theta linear between grid points, constant beyond the cutoff
    (reference: demographicmodels.c new_PiecewiseLinearGridCoalescent)."""

    def __init__(self, topo, grid: int, cutoff: float, prefix="coalescent.",
                 thetas_init=None, log_space=False):
        super().__init__(topo, prefix, log_space)
        self.grid = int(grid)
        self.cutoff = float(cutoff)
        self.points = np.linspace(0.0, cutoff, grid)  # theta at these times
        self.thetas_init = (np.ones(self.grid) if thetas_init is None
                            else np.asarray(thetas_init))

    def param_specs(self):
        if self.log_space:
            return [ParamSpec.vector(self.key("thetas"),
                                     np.log(self.thetas_init))]
        return [ParamSpec.vector(self.key("thetas"), self.thetas_init,
                                 lower=0.0)]

    def _theta_at(self, thetas, t):
        pts = jnp.asarray(self.points, dtype=t.dtype)
        step = self.points[1] - self.points[0]
        i = jnp.clip(jnp.floor(t / step).astype(jnp.int32), 0, self.grid - 2)
        frac = jnp.clip((t - pts[i]) / step, 0.0, None)
        frac = jnp.where(t >= self.cutoff, 1.0, frac)
        return thetas[i] + (thetas[i + 1] - thetas[i]) * jnp.clip(frac, 0.0, 1.0)

    def log_prob_from_heights(self, heights, params):
        thetas = self._thetas(params)
        iv = interval_decomposition(heights, self.topo,
                                    self.points[1:])
        t0 = iv["start"]
        t1 = iv["start"] + iv["dt"]
        th0 = self._theta_at(thetas, t0)
        th1 = self._theta_at(thetas, t1)
        # int_{t0}^{t1} dt / theta(t), theta linear: (t1-t0) ln(th1/th0)/(th1-th0)
        near = jnp.abs(th1 - th0) < 1e-12 * jnp.maximum(th0, th1)
        denom = jnp.where(near, 1.0, th1 - th0)
        seg = jnp.where(
            near, iv["dt"] / th0,
            iv["dt"] * (jnp.log(th1) - jnp.log(th0)) / denom)
        integral = jnp.sum(iv["pairs"] * seg)
        th_ev = self._theta_at(thetas, iv["t"])
        ev = jnp.where(iv["is_coal"], jnp.log(th_ev), 0.0)
        return -integral - jnp.sum(ev)
