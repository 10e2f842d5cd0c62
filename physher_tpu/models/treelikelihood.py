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


def _vmap_batch_size(x):
    """Batch size when ``x`` is being traced under ``vmap``, else None.

    The engine auto-selection runs at trace time, where a vmapped chain
    batch (MCMC, tempered ladders, GA fitness) is visible as a
    BatchTracer on the computed tensors. Measured on v5e (fluA, 69 taxa
    x 238 patterns, vmapped target evals/s): level-array XLA 21.4k at
    B=512, 92k at 4096, 134k at 16384 vs fused Pallas 15.0k / 36k /
    compile-failure — past a few hundred chains the level-array path
    wins, and batch size is the only signal that distinguishes the two
    regimes.

    LIMITATION: inside a ``lax.scan`` body there are never BatchTracers —
    scan traces its body abstractly once and applies batching at the
    jaxpr level — so vmapped SAMPLERS (vmap of a scan kernel) are
    invisible to this probe. Drivers that know their chain count apply
    ``engine_override("xla")`` around tracing instead (inference/mcmc.py,
    inference/marginal.py)."""
    try:
        from jax.interpreters.batching import BatchTracer
    except ImportError:  # jax>=0.9 moved it under _src
        from jax._src.interpreters.batching import BatchTracer

    for _ in range(8):
        if isinstance(x, BatchTracer):
            bd = x.batch_dim
            if isinstance(bd, int):
                try:
                    return int(x.val.shape[bd])
                except Exception:
                    return None
            return None
        nxt = getattr(x, "primal", None)
        if nxt is None:
            return None
        x = nxt
    return None


class engine_override:
    """Force a pruning engine for every TreeLikelihood within the block.

    Used by second-derivative consumers (config action "hessian",
    laplace_marginal): the Pallas engines' custom-VJP backward kernels are
    not themselves differentiable, so jax.jacrev(jax.grad(f)) needs the
    plain XLA engine. Example: ``with engine_override("xla"): ...``.
    Every engine name is honored ("xla", "pallas-fused", "pallas-staged",
    "pallas-wide", "pallas-loop", "auto"), bypassing the auto-selection
    VMEM gates.
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
                 pattern_pad_multiple: int | None = None, prefix: str = "tree.",
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
        if pattern_pad_multiple is None:
            # f32 runs (TPU): pad to the Pallas TILE so small alignments
            # (fluA: 238 patterns) reach the fused kernel; the pad columns
            # carry zero weight, exact. f64 (CPU golden runs) keeps exact
            # pattern counts.
            pattern_pad_multiple = (
                256 if jnp.dtype(self.dtype).itemsize == 4 else 1)
        self._P = pad_patterns(site_pattern.pattern_count, pattern_pad_multiple)
        tp = site_pattern.tip_partials(
            tipstates=tipstates or not use_ambiguities, pad_to=self._P,
            dtype=np.float64)
        # HOST-side constants: jit embeds numpy closure constants directly
        # during lowering, whereas device-committed jnp arrays are fetched
        # back device->host at EVERY fresh-process lowering — minutes over
        # a remote-TPU tunnel. shard_tree_likelihood device_puts these when
        # a mesh is attached (the only consumer that needs placement).
        self.tip_partials = np.asarray(tp[order], dtype=self.dtype)
        self.weights = np.asarray(
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

    def _engine(self, vmap_batch=None):
        """Select the pruning engine: the fused whole-postorder-in-VMEM
        Pallas kernel when it fits (ops/pallas_fused.py — batch-capable via
        its custom_vmap rules), the staged block-diagonal kernel
        (ops/pallas_staged.py) for shapes past the fused VMEM gate, the
        loop kernel (ops/pallas_pruning_loop.py) past that, else the
        level-batched XLA path (ops/pruning.py). An ``engine_override``
        block or ``engine=`` constructor argument forces any of them.
        Large vmapped chain batches (``vmap_batch``, detected at trace
        time) auto-route to the level-array XLA path — see
        ``_vmap_batch_size`` for the v5e measurements."""
        name = self.engine
        if _ENGINE_OVERRIDE:
            name = _ENGINE_OVERRIDE[-1]
        if name == "auto" and vmap_batch is not None and vmap_batch >= 256:
            return tree_log_likelihood
        if name == "xla":
            return tree_log_likelihood
        if name == "auto" and self._prefer_staged() \
                and self._pallas_staged_fits():
            # large pattern counts amortize the staged kernel's per-stage
            # grid steps and its blockP streaming beats the fused kernel's
            # in-VMEM re-walk. Sustained perturbed-scan protocol
            # (bench.sustained, n=32, v5e, 128 taxa x 16k patterns,
            # value+grad ms): staged 4.26, fused 4.76, xla 5.68,
            # loop 12.2. Small tile counts (fluA: 1 tile) favor the fused
            # whole-postorder-per-tile kernel
            name = "pallas-staged"
        if name == "pallas-fused" or (
                name == "auto" and self._pallas_fused_fits()):
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
        if name == "pallas-staged" or (
                name == "auto" and self._pallas_staged_fits()):
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
        if name == "pallas-wide":
            # wide-state HBM-staged kernel (ops/pallas_wide.py): the
            # tree-size-scalable Pallas path for S>=16 (stage buffer in
            # HBM, VMEM O(R*TILE) regardless of depth). OPT-IN only:
            # sustained perturbed-scan protocol on v5e measured the
            # level-array XLA path 1.5-2x FASTER on every large-S shape
            # (codon 64 taxa x 4096: fwd 1.74 vs 2.97 ms; codon 128:
            # 2.56 vs 4.28; WAG 256: v+g 16.7 vs 19.9) — XLA's batched
            # [S,S]@[S,P] dots pipeline better than per-step DMA staging
            interpret = jax.default_backend() != "tpu"
            from ..ops.pallas_wide import wide_tree_log_likelihood
            if self.mesh is not None:
                from ..parallel.mesh import shard_map_wide_engine
                return shard_map_wide_engine(
                    self.mesh, self.pattern_axis, interpret=interpret)

            def run(tips, pmats, topo, freqs, props, weights, rescale):
                return wide_tree_log_likelihood(
                    tips, pmats, topo, freqs, props, weights,
                    rescale=rescale, interpret=interpret)

            return run
        if name == "pallas-loop" or (
                name == "auto" and self._pallas_loop_fits()):
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
        return tree_log_likelihood

    def engine_name(self) -> str:
        """The engine auto-selection's concrete choice for this model
        (for benchmarking/diagnostics: BENCH records what auto picked)."""
        name = self.engine
        if _ENGINE_OVERRIDE:
            name = _ENGINE_OVERRIDE[-1]
        if name != "auto":
            return name
        if self._prefer_staged() and self._pallas_staged_fits():
            return "pallas-staged"
        if self._pallas_fused_fits():
            return "pallas-fused"
        if self._pallas_staged_fits():
            return "pallas-staged"
        if self._pallas_loop_fits():
            return "pallas-loop"
        return "xla"

    def _prefer_staged(self) -> bool:
        from ..ops.pallas_staged import TILE

        return self.tip_partials.shape[1] == 4 and \
            self._shard_P() >= 32 * TILE

    def _shard_P(self) -> int:
        """Per-device pattern count: the Pallas kernels see the per-shard
        slice inside shard_map, so tile-divisibility gates on this."""
        if self.mesh is not None:
            return self._P // int(self.mesh.shape[self.pattern_axis])
        return self._P

    def _pallas_fused_fits(self) -> bool:
        import os

        from ..ops.pallas_fused import fused_plan

        if os.environ.get("PHYSHER_TPU_ENGINE") not in (None, "", "fused"):
            return False
        if jax.default_backend() != "tpu":
            return False
        if jax.config.jax_enable_x64:
            return False
        if jnp.dtype(self.dtype).itemsize != 4:
            return False
        maxc = int(self.topo.child_count.max())
        if maxc != 2:  # polytomies opt in with engine="pallas-fused"
            return False
        C = len(self.site_model.rates_props(
            self.site_model.param_space().init_params())[1])
        S = self.tip_partials.shape[1]
        # auto only for the packed nucleotide mode. The csplit mode
        # (S>=16) works and is opt-in via engine="pallas-fused", but the
        # sustained perturbed-scan protocol measured the level-array XLA
        # path faster on every large-S value+grad workload (v5e: WAG 64
        # taxa x 8192: 9.1 vs 13.6 ms; codon 32 x 4096: 2.21 vs 2.71 ms
        # — the csplit backward re-walk costs 3.4x its forward)
        if S != 4:
            return False
        return fused_plan(self.topo, C, S, self._shard_P()) is not None

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

    def _run_engine(self, params):
        bl = self.branch_lengths(params)
        rates, props = self.site_model.rates_props(params)
        blc = bl[:, None] * rates[None, :]  # [N, C]
        pmats = self.subst.p_t(params, blc)  # [N, C, S, S]
        freqs = self.subst.frequencies(params)
        engine = self._engine(vmap_batch=_vmap_batch_size(pmats))
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
