"""TreeLikelihood: assembles data + tree + substitution/site/clock models into
one pure, jittable log-likelihood function of a parameter pytree.

Functional rebuild of the reference's SingleTreeLikelihood orchestrator
(reference: src/phyc/treelikelihood.c:46-124 struct, 819-832 JSON keys,
1454-1735 calculation). There is no dirty tracking: the full likelihood is
recomputed per call inside jit, which XLA fuses end-to-end; gradients come
from jax.grad (exact counterpart of the reference's O(N) analytic gradient
assembly at treelikelihood.c:2129-3100, which autodiff on the level-batched
pruning reproduces with the same asymptotic cost).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data.sitepattern import SitePattern
from ..ops.pruning import tree_log_likelihood, pad_patterns
from ..trees.topology import Topology
from ..trees.timetree import TimeTreeData
from ..trees.heights import (
    heights_from_ratios, heights_from_shifts, shifts_from_heights,
    ratio_log_jacobian, branch_durations,
)
from .parameters import ParamSpec, ParamSpace
from .clock import BranchModel
from .sitemodel import SiteModel, ConstantSiteModel
from .substitution import SubstitutionModel


_ENGINE_OVERRIDE: list = []


def _is_batch_traced(x) -> bool:
    """True when ``x`` carries a ``vmap`` batch dimension (possibly beneath
    other transform tracers, e.g. ``vmap(grad(f))``).

    The Pallas engines do not batch correctly: ``vmap`` of a
    scalar-prefetch ``pallas_call`` silently miscomputes (measured ~54 logP
    units off on the fluA time tree), so batched calls must fall back to
    the level-batched XLA engine — which is also the faster engine at
    MCMC-chain batch sizes (64 chains: 790us vs 1120us per call on v5e).
    """
    from jax._src.interpreters.batching import BatchTracer

    seen = 0
    while isinstance(x, jax.core.Tracer) and seen < 16:
        if isinstance(x, BatchTracer):
            return True
        for attr in ("primal", "val"):
            inner = getattr(x, attr, None)
            if inner is not None:
                x = inner
                break
        else:
            return False
        seen += 1
    return False


class engine_override:
    """Force a pruning engine for every TreeLikelihood within the block.

    Used by second-derivative consumers (config action "hessian",
    laplace_marginal): the Pallas engines' custom-VJP backward kernels are
    not themselves differentiable, so jax.jacrev(jax.grad(f)) needs the
    plain XLA engine. Example: ``with engine_override("xla"): ...``.
    """

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        _ENGINE_OVERRIDE.append(self.name)
        return self

    def __exit__(self, *exc):
        _ENGINE_OVERRIDE.pop()
        return False


class TreeLikelihood:
    """Phylogenetic likelihood model over a fixed topology.

    Two parameterizations of branch lengths:
    - unrooted/distance mode: free branch-length vector ``{prefix}distances``
      (one per non-root node, node-id order),
    - time mode (``time_data`` given): node-height ratio parameters
      ``{prefix}ratios`` (internal postorder order) + ``{prefix}root_height``,
      with a clock model mapping durations to substitution branch lengths.
    """

    def __init__(self, site_pattern: SitePattern, topo: Topology,
                 subst_model: SubstitutionModel, site_model: SiteModel = None,
                 *, clock: BranchModel = None, time_data: TimeTreeData = None,
                 distances_init: np.ndarray = None,
                 include_jacobian: bool = False, tipstates: bool = False,
                 use_ambiguities: bool = True, rescale: bool | None = None,
                 pattern_pad_multiple: int = 1, prefix: str = "tree.",
                 dtype=None, engine: str = "auto",
                 height_transform: str = "ratio"):
        if site_model is None:
            site_model = ConstantSiteModel()
        self.sp = site_pattern
        self.topo = topo
        self.subst = subst_model
        self.site_model = site_model
        self.clock = clock
        self.time_data = time_data
        self.include_jacobian = include_jacobian
        self.prefix = prefix
        self.engine = engine
        # set by parallel.mesh.shard_tree_likelihood: pattern-axis mesh the
        # Pallas engines wrap with shard_map (the XLA engine shards via
        # GSPMD propagation from the input shardings alone)
        self.mesh = None
        self.pattern_axis = "patterns"
        # RATIO / RATIO_NAIVE / PROPORTION share one transform in the
        # reference (treetransform.c new_HeightTreeTransform assigns the same
        # `update`; only the gradient algorithm differs, which autodiff
        # subsumes); SHIFT is a distinct parameterization with |J| = 1
        # (reference: src/phyc/treetransform.h:17-22)
        ht = str(height_transform or "ratio").lower()
        if ht in ("ratio", "ratio_naive", "proportion", ""):
            self.height_transform = "ratio"
        elif ht == "shift":
            self.height_transform = "shift"
        else:
            raise ValueError(f"unknown height transform {height_transform!r}")
        self.dtype = dtype or jnp.zeros(0).dtype
        if rescale is None:
            # f32 partials underflow on realistic trees; rescaling is exact
            # (the reference switches it on reactively at -inf,
            # treelikelihood.c:1497-1520; we enable it up front)
            rescale = jnp.dtype(self.dtype).itemsize < 8
        self.rescale = rescale

        if time_data is not None and clock is None:
            raise ValueError("time mode requires a clock (branch rate) model")

        # order site-pattern rows to match tip ids
        order = [site_pattern.taxa.index(t) for t in topo.taxa]
        self._P = pad_patterns(site_pattern.pattern_count, pattern_pad_multiple)
        tp = site_pattern.tip_partials(
            tipstates=tipstates or not use_ambiguities, pad_to=self._P,
            dtype=np.float64)
        self.tip_partials = jnp.asarray(tp[order], dtype=self.dtype)
        self.weights = jnp.asarray(
            site_pattern.padded_weights(self._P), dtype=self.dtype)

        if distances_init is None:
            distances_init = np.full(topo.N - 1, 0.1)
        self.distances_init = np.asarray(distances_init, dtype=np.float64)[
            : topo.N - 1]

    # -- parameters --------------------------------------------------------

    def key(self, k):
        return f"{self.prefix}{k}" if self.prefix else k

    def param_specs(self):
        specs = []
        if self.time_data is not None:
            td = self.time_data
            I = self.topo.I
            if self.height_transform == "shift":
                shifts0 = shifts_from_heights(td.node_heights0, self.topo)
                specs.append(ParamSpec.vector(
                    self.key("shifts"), np.maximum(shifts0, 1e-6), lower=0.0))
            else:
                specs.append(ParamSpec.vector(
                    self.key("ratios"), td.ratios0[: I - 1],
                    lower=0.0, upper=1.0))
                specs.append(ParamSpec.scalar(
                    self.key("root_height"), td.ratios0[I - 1],
                    lower=float(td.lowers[self.topo.root])))
        else:
            specs.append(ParamSpec.vector(
                self.key("distances"), self.distances_init, lower=0.0))
        specs += self.subst.param_specs()
        specs += self.site_model.param_specs()
        if self.clock is not None:
            specs += self.clock.param_specs()
        return specs

    def param_space(self) -> ParamSpace:
        return ParamSpace(self.param_specs())

    # -- computation -------------------------------------------------------

    def node_heights(self, params) -> jnp.ndarray:
        td = self.time_data
        if self.height_transform == "shift":
            return heights_from_shifts(params[self.key("shifts")], self.topo,
                                       td.tip_heights)
        ratios = jnp.concatenate([
            jnp.atleast_1d(params[self.key("ratios")]),
            jnp.atleast_1d(params[self.key("root_height")]),
        ])
        return heights_from_ratios(ratios, self.topo, td.tip_heights, td.lowers)

    def branch_lengths(self, params) -> jnp.ndarray:
        """Substitution branch length per node [N] (root entry 0)."""
        if self.time_data is not None:
            h = self.node_heights(params)
            d = branch_durations(h, self.topo)
            return d * self.clock.rates(params)
        dist = params[self.key("distances")]
        return jnp.concatenate([dist, jnp.zeros(1, dist.dtype)])

    def _engine(self):
        """Select the pruning engine: the loop-based Pallas TPU kernel when
        it fits (ops/pallas_pruning_loop.py — whole postorder in VMEM per
        pattern tile, constant program size, analytic rematerializing VJP),
        the unrolled Pallas kernel on request (ops/pallas_pruning.py), else
        the level-batched XLA path (ops/pruning.py)."""
        if _ENGINE_OVERRIDE and _ENGINE_OVERRIDE[-1] == "xla":
            return tree_log_likelihood
        if self.engine == "pallas-fused" or (
                self.engine == "auto" and self._pallas_fused_fits()):
            interpret = jax.default_backend() != "tpu"
            from ..ops.pallas_fused import fused_tree_log_likelihood
            if self.mesh is not None:
                from ..parallel.mesh import shard_map_fused_engine
                return shard_map_fused_engine(
                    self.mesh, self.pattern_axis, interpret=interpret)

            def run(tips, pmats, topo, freqs, props, weights, rescale):
                return fused_tree_log_likelihood(
                    tips, pmats, topo, freqs, props, weights,
                    rescale=rescale, interpret=interpret)

            return run
        if self.engine == "pallas-staged" or (
                self.engine == "auto" and self._pallas_staged_fits()):
            interpret = jax.default_backend() != "tpu"
            from ..ops.pallas_staged import staged_tree_log_likelihood
            if self.mesh is not None:
                from ..parallel.mesh import shard_map_staged_engine
                return shard_map_staged_engine(
                    self.mesh, self.pattern_axis, interpret=interpret)

            def run(tips, pmats, topo, freqs, props, weights, rescale):
                return staged_tree_log_likelihood(
                    tips, pmats, topo, freqs, props, weights,
                    rescale=rescale, interpret=interpret)

            return run
        if self.engine == "pallas-loop" or (
                self.engine == "auto" and self._pallas_loop_fits()):
            interpret = jax.default_backend() != "tpu"
            if self.mesh is not None:
                from ..parallel.mesh import shard_map_loop_engine
                return shard_map_loop_engine(
                    self.mesh, self.pattern_axis, interpret=interpret)
            from ..ops.pallas_pruning_loop import loop_tree_log_likelihood

            def run(tips, pmats, topo, freqs, props, weights, rescale):
                return loop_tree_log_likelihood(
                    tips, pmats, topo, freqs, props, weights,
                    rescale=rescale, interpret=interpret)

            return run
        if self.engine == "pallas" or (
                self.engine == "auto" and self._pallas_fits()):
            from ..ops.pallas_pruning import pallas_tree_log_likelihood

            def run(tips, pmats, topo, freqs, props, weights, rescale):
                return pallas_tree_log_likelihood(
                    tips, pmats, topo, freqs, props, weights,
                    rescale=rescale,
                    interpret=jax.default_backend() != "tpu")

            return run
        return tree_log_likelihood

    def _shard_P(self) -> int:
        """Per-device pattern count: the Pallas kernels see the per-shard
        slice inside shard_map, so tile-divisibility gates on this."""
        if self.mesh is not None:
            return self._P // int(self.mesh.shape[self.pattern_axis])
        return self._P

    def _pallas_fused_fits(self) -> bool:
        import os

        from ..ops.pallas_fused import (
            TILE, TILE_CSPLIT, _needs_csplit, fused_vmem_estimate,
            pad_states, pick_B)

        if os.environ.get("PHYSHER_TPU_ENGINE") not in (None, "", "fused"):
            return False
        if jax.default_backend() != "tpu":
            return False
        if jax.config.jax_enable_x64:
            return False
        if jnp.dtype(self.dtype).itemsize != 4 or self._shard_P() % TILE:
            return False
        C = len(self.site_model.rates_props(
            self.site_model.param_space().init_params())[1])
        S = self.tip_partials.shape[1]
        maxc = int(self.topo.child_count.max())
        if maxc != 2:  # polytomies opt in with engine="pallas-fused"
            return False
        B = pick_B(self.topo)
        if _needs_csplit(C, S):
            # protein/codon: category-split grid, state-padded blocks
            return fused_vmem_estimate(
                self.topo, 1, pad_states(S), B, backward=True,
                tile=TILE_CSPLIT) < 13 << 20
        if S != 4:
            return False
        while (C * S) % 8:  # fused_site_log pads categories to 8 sublanes
            C += 1
        return fused_vmem_estimate(self.topo, C, S, B,
                                   backward=True) < 13 << 20

    def _pallas_staged_fits(self) -> bool:
        import os

        from ..ops.pallas_staged import (
            TILE, staged_n_steps, vmem_estimate_staged)

        if os.environ.get("PHYSHER_TPU_ENGINE") not in (None, "", "staged"):
            return False
        if jax.default_backend() != "tpu":
            return False
        if jax.config.jax_enable_x64:
            return False
        if jnp.dtype(self.dtype).itemsize != 4 or self._shard_P() % TILE:
            return False
        C = len(self.site_model.rates_props(
            self.site_model.param_space().init_params())[1])
        S = self.tip_partials.shape[1]
        maxc = int(self.topo.child_count.max())
        # auto only for the TPU-validated nucleotide case (same policy as
        # the loop kernel); other state counts opt in explicitly
        if S != 4 or maxc != 2:
            return False
        while (C * S) % 8:  # staged_site_log pads categories to 8 sublanes
            C += 1
        return vmem_estimate_staged(
            self.topo.N, C, S, backward=True,
            n_steps=staged_n_steps(self.topo)) < 13 << 20

    def _pallas_loop_fits(self) -> bool:
        import os

        from ..ops.pallas_pruning_loop import TILE, vmem_estimate_loop

        if os.environ.get("PHYSHER_TPU_ENGINE") == "xla":
            return False
        if jax.default_backend() != "tpu":
            return False
        if jax.config.jax_enable_x64:
            # x64 mode makes Pallas index maps emit i64, which Mosaic
            # rejects; f64 runs use the XLA path (TPUs have no f64 anyway)
            return False
        if jnp.dtype(self.dtype).itemsize != 4 or self._shard_P() % TILE:
            return False
        C = len(self.site_model.rates_props(
            self.site_model.param_space().init_params())[1])
        S = self.tip_partials.shape[1]
        # auto only for the TPU-validated nucleotide case; other state
        # counts opt in with engine="pallas-loop"
        if S != 4:
            return False
        return vmem_estimate_loop(self.topo.N, C, S, backward=True,
                                  n_tips=self.topo.T) < 10 << 20

    def _pallas_fits(self) -> bool:
        import os

        from ..ops.pallas_pruning import TILE, vmem_estimate

        # conservative default: the fused kernel is opt-in
        # (PHYSHER_TPU_ENGINE=pallas or engine="pallas") until its Mosaic
        # compile time is validated on the target TPU generation
        if os.environ.get("PHYSHER_TPU_ENGINE") != "pallas":
            return False
        if jax.default_backend() != "tpu":
            return False
        if jnp.dtype(self.dtype).itemsize != 4 or self._P % TILE:
            return False
        C = len(self.site_model.rates_props(
            self.site_model.param_space().init_params())[1])
        S = self.tip_partials.shape[1]
        return vmem_estimate(self.topo.N, C, S, backward=True) < 10 << 20

    def _run_engine(self, params):
        bl = self.branch_lengths(params)
        rates, props = self.site_model.rates_props(params)
        blc = bl[:, None] * rates[None, :]  # [N, C]
        pmats = self.subst.p_t(params, blc)  # [N, C, S, S]
        freqs = self.subst.frequencies(params)
        engine = self._engine()
        if engine is not tree_log_likelihood and _is_batch_traced(pmats):
            engine = tree_log_likelihood
        return engine(
            self.tip_partials, pmats.astype(self.dtype), self.topo,
            freqs.astype(self.dtype), props.astype(self.dtype), self.weights,
            rescale=self.rescale)

    def log_likelihood_only(self, params) -> jnp.ndarray:
        logL, _ = self._run_engine(params)
        return logL

    def log_jacobian(self, params) -> jnp.ndarray:
        if self.height_transform == "shift":
            # |d heights / d shifts| = 1 (reference:
            # treetransform.c _node_transform_log_jacobian_zero)
            return jnp.zeros((), self.dtype)
        h = self.node_heights(params)
        return ratio_log_jacobian(h, self.topo, self.time_data.lowers)

    def log_likelihood(self, params) -> jnp.ndarray:
        logL = self.log_likelihood_only(params)
        if self.include_jacobian and self.time_data is not None:
            logL = logL + self.log_jacobian(params)
        return logL

    __call__ = log_likelihood

    def site_log_likelihoods(self, params) -> jnp.ndarray:
        _, site_log = self._run_engine(params)
        return site_log[: self.sp.pattern_count]
