"""Fused staged Pallas pruning kernel: whole postorder per grid step.

Fourth-generation engine for the Felsenstein pruning hot loop (reference:
src/phyc/treelikelihood4.c update_partials / treelikelihood.c:1454-1735).
Same staged block-diagonal dataflow as ops/pallas_staged.py (B nodes per
step as one [Rb, Rb] @ [Rb, TILE] dot per child index, outputs written
straight into the consumer step's input slab), but the step dimension runs
as a ``fori_loop`` INSIDE the kernel instead of a grid axis:

- **one grid step per pattern tile**: grid-step overhead (~2-4 us/step on
  v5e, which dominated the staged kernel on small or ladder-shaped trees
  where levels hold 1-2 nodes) is paid once per tile, not once per stage;
- **fully VMEM-resident**: the block P matrices, the stage buffer, and (in
  the backward) the cotangent buffer and dblockP accumulator all live in
  VMEM for the whole sweep — the backward REMATERIALIZES the forward
  instead of spilling partials through HBM (the staged kernel's spill was
  ~2x the useful HBM traffic of the whole computation);
- **megacore**: the leading (instance) and tile axes are ``parallel`` in
  the forward, so the two v5e cores split the grid; the backward keeps the
  tile axis ``arbitrary`` (it accumulates dblockP across tiles).

Every kernel instance carries a **leading grid axis L** indexing
independent (blockP, rootw) sets over shared tips. The axis serves two
roles:

- **category-split** mode (protein S=20, codon S=61 — the reference's
  biggest kernels, src/phyc/treelikelihood20.c / treelikelihoodCodon.c):
  rate categories run as L instances of a C=1 kernel on state-padded
  blocks (20->24, 61->64), combined by a logsumexp outside; this keeps
  per-tile buffers under VMEM where a packed C*S layout would blow past;
- **batch** mode: vmapped likelihoods (MCMC chains, tempered ladders,
  eta search, GA fitness) batch into the same axis via the
  ``jax.custom_batching.custom_vmap`` rules on the kernel entry points —
  vmap of a raw scalar-prefetch ``pallas_call`` miscomputes on TPU, so
  batching is intercepted structurally (works under any jit nesting,
  replacing the round-3 tracer sniffing) and lowered to a batched grid.

Gradient math is the reference's O(N) upper-partials sweep
(treelikelihood.c:2129-3100) as cotangents of the staged values, identical
to ops/pallas_staged.py; the custom VJP is defined on (tips, blockP, rootw)
so (pmats -> blockP, props x freqs -> rootw) transpose via autodiff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology
from .pallas_staged import _plan, build_block_pmats, staged_schedule

TILE = 256
TILE_CSPLIT = 128

# Mosaic lowers f32 jnp.dot at DEFAULT precision to a single bf16 MXU pass
# (measured 1.5e-3 relative error; ~54 logP units on the fluA time tree —
# the true source of the round-3 "vmap miscompute"). HIGHEST = 6-pass
# bf16 expansion, true-f32 accurate (2.4e-7), near-identical latency on
# the bandwidth-bound pruning shapes.
_MXU_PRECISION = jax.lax.Precision.HIGHEST

# per-instance VMEM budget for the auto gates (v5e/v5p have ~16 MB more
# headroom is needed for Mosaic's own spill margins)
VMEM_BUDGET = 13 << 20


def pick_B(topo: Topology, candidates=(8, 4, 2, 1), min_eff: float = 0.6):
    """Largest step block size whose level packing wastes <40% of slots."""
    I = topo.I
    for B in candidates:
        n_steps = sum(-(-len(r) // B) for r in topo.levels)
        if I / (n_steps * B) >= min_eff:
            return B
    return 1


def pad_states(S: int) -> int:
    """States padded to the 8-sublane boundary (20 -> 24, 61 -> 64)."""
    return -(-S // 8) * 8


def pad_categories(C: int, S: int) -> int:
    """Categories padded (with zero-weight copies) until C*S is a multiple
    of the 8-sublane boundary."""
    while (C * S) % 8:
        C += 1
    return C


def fused_vmem_estimate(topo: Topology, C: int, S: int, B: int,
                        backward: bool = True, tile: int = TILE) -> int:
    """Bytes of VMEM the fused kernel needs per pattern tile (f32).

    For the category-split mode pass C=1 and S=pad_states(S)."""
    CS = C * S
    Rb = B * CS
    maxc = int(topo.child_count.max())
    R = maxc * Rb
    n_steps = sum(-(-len(r) // B) for r in topo.levels)
    stage = (n_steps + 1) * R * tile * 4
    blockP = n_steps * maxc * Rb * Rb * 4
    tips = topo.T * S * tile * 4
    valid = n_steps * R * 4
    base = stage + blockP + tips + valid + 4 * tile * 4
    if not backward:
        return base
    gbuf = (n_steps + 1) * R * tile * 4
    minv = n_steps * B * tile * 4
    return base + gbuf + minv + blockP  # dblockP accumulator = blockP size


def _needs_csplit(C: int, S: int) -> bool:
    """Packed rows need C*S % 8 == 0 with tolerable padding; odd S (61)
    can never satisfy it by padding categories, and big C*S blows VMEM."""
    if S <= 8:
        return False
    CS = C * S
    while CS % 8:
        CS += S
    return CS > 64 or S % 2


def fused_plan(topo: Topology, C: int, S: int, P: int, *,
               backward: bool = True, budget: int = VMEM_BUDGET,
               min_eff: float = 0.6):
    """Pick (B, tile, csplit) for the fused kernel, or None if nothing fits.

    Candidates are tried largest-tile-first (fewer grid steps, better
    pipelining), then largest node-block B whose level packing is efficient
    AND whose per-instance VMEM fits ``budget``; if no efficient B fits,
    any fitting B is accepted (small dots beat no kernel). Codon (S=64
    padded) lands on B=1-2 this way — [64..128]-wide MXU dots with a VMEM
    footprint ~10x below the packed-B=8 layout that failed the round-3
    gate.
    """
    csplit = _needs_csplit(C, S)
    if csplit:
        Ck, Sk = 1, pad_states(S)
        tiles = (TILE_CSPLIT, TILE)
    else:
        Ck, Sk = pad_categories(C, S), S
        tiles = (TILE, TILE_CSPLIT)
    for require_eff in (True, False):
        for tile in tiles:
            if P % tile:
                continue
            for B in (8, 4, 2, 1):
                if require_eff:
                    n_steps = sum(-(-len(r) // B) for r in topo.levels)
                    if topo.I / (n_steps * B) < min_eff:
                        continue
                if fused_vmem_estimate(topo, Ck, Sk, B, backward=backward,
                                       tile=tile) < budget:
                    return dict(B=B, tile=tile, csplit=csplit)
    return None


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_body(C, S, B, maxc, n_steps, T, n_zero, tile,
              tipcons_ref, nodecons_ref, zrows_ref,
              valid_ref, tips_ref, blockP_ref, rootw_ref,
              stage, scal_acc, minv_ref=None):
    """Shared forward sweep: init stage, run all steps, return nothing
    (results live in ``stage``/``scal_acc``; ``minv_ref`` captures 1/max
    per node when the backward needs it)."""
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    Rb = B * CS

    def init_zero(i, _):
        r = pl.multiple_of(zrows_ref[i, 1], CS)
        stage[zrows_ref[i, 0], pl.ds(r, CS)] = jnp.zeros((CS, tile), f32)
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_zero), init_zero,
                      jnp.int32(0))

    def init_tip(t, _):
        tp = tips_ref[pl.ds(t, 1)][0]                  # [S, tile]
        exp = jnp.broadcast_to(tp[None], (C, S, tile)).reshape(CS, tile)
        stage[tipcons_ref[t, 0],
              pl.ds(pl.multiple_of(tipcons_ref[t, 1], CS), CS)] = exp
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), init_tip, jnp.int32(0))
    scal_acc[0, :] = jnp.zeros((tile,), f32)

    def step(s, _):
        bp = blockP_ref[pl.ds(s, 1)][0]                # [maxc, Rb, Rb]
        v_all = valid_ref[pl.ds(s, 1)][0]              # [R]
        res = None
        for j in range(maxc):
            stacked = stage[s, pl.ds(j * Rb, Rb)]      # [Rb, tile]
            contrib = jnp.dot(bp[j], stacked, preferred_element_type=f32,
                          precision=_MXU_PRECISION)
            v = v_all[j * Rb:(j + 1) * Rb][:, None]    # [Rb, 1]
            contrib = contrib * v + (1.0 - v)
            res = contrib if res is None else res * contrib
        logm_sum = None
        for b in range(B):
            rb = res[b * CS:(b + 1) * CS]
            m = jnp.max(rb, axis=0, keepdims=True)     # [1, tile]
            m = jnp.maximum(m, jnp.finfo(f32).tiny)
            rb = rb / m
            lm = jnp.log(m)
            logm_sum = lm if logm_sum is None else logm_sum + lm
            if minv_ref is not None:
                minv_ref[s, pl.ds(b, 1)] = 1.0 / m
            ps = nodecons_ref[s, b, 0]
            pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
            stage[ps, pl.ds(pr, CS)] = rb
        scal_acc[0, :] = scal_acc[0, :] + logm_sum[0]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, jnp.int32(0))


def _fused_fwd_kernel(C, S, B, maxc, n_steps, T, n_zero, tile,
                      tipcons_ref, nodecons_ref, zrows_ref,
                      valid_ref, tips_ref, blockP_ref, rootw_ref,
                      site_log_ref, stage, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    _fwd_body(C, S, B, maxc, n_steps, T, n_zero, tile,
              tipcons_ref, nodecons_ref, zrows_ref,
              valid_ref, tips_ref, blockP_ref, rootw_ref, stage, scal_acc)
    rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, tile]
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_fused_forward(topo: Topology, C: int, S: int, P: int, L: int, *,
                        B: int = 8, interpret: bool = False,
                        dtype=jnp.float32, tile: int = TILE):
    """Returns (fn(tips [T,S,P], blockP [L,n_steps,maxc,Rb,Rb],
    rootw [L,1,CS]) -> site_log [L,P], sched).

    ``L`` is the leading grid axis: independent kernel instances over
    shared tips — rate categories in category-split mode, likelihood
    batches (vmapped chains/ladders), or their product.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // tile

    kernel = partial(_fused_fwd_kernel, C, S, B, maxc, n_steps, T,
                     pn["n_zero"], tile)

    # the leading axis rides as a squeezed (None) block dim: a (1, CS)
    # block over an (L, CS) array violates Mosaic's second-to-minor
    # divisibility rule, so rootw/site_log carry an explicit singleton
    # row axis instead
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # tipcons, nodecons, zrows
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec((n_steps, R), lambda l, t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda l, t, *_: (0, 0, t)),
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda l, t, *_: (l, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda l, t, *_: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, tile), lambda l, t, *_: (l, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, tile), dtype),
            pltpu.VMEM((1, tile), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, 1, P), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw):
        out = call(tipcons_j, nodecons_j, zrows_j, valid_j, tips, blockP,
                   rootw)
        return out[:, 0]

    return fn, sched


# --------------------------------------------------------------------------
# backward (rematerializing)
# --------------------------------------------------------------------------


def _fused_bwd_kernel(C, S, B, maxc, n_steps, T, n_zero, tile,
                      tipcons_ref, nodecons_ref, zrows_ref,
                      valid_ref, tips_ref, blockP_ref, rootw_ref, g_ref,
                      dblockP_ref, drootw_ref,
                      stage, gbuf, minv, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    Rb = B * CS

    @pl.when(pl.program_id(1) == 0)
    def _init_out():
        dblockP_ref[...] = jnp.zeros_like(dblockP_ref[...])
        drootw_ref[...] = jnp.zeros_like(drootw_ref[...])

    # ---- forward recompute (captures minv) ----
    _fwd_body(C, S, B, maxc, n_steps, T, n_zero, tile,
              tipcons_ref, nodecons_ref, zrows_ref,
              valid_ref, tips_ref, blockP_ref, rootw_ref, stage, scal_acc,
              minv_ref=minv)

    # ---- root cotangent (scaled coordinates) ----
    gbuf[...] = jnp.zeros_like(gbuf[...])
    rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, tile]
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    inv = g_ref[0, :] / site                           # [tile]
    gbuf[n_steps, pl.ds(0, CS)] = rootw_ref[0][:, None] * inv[None, :]
    drootw_ref[0, :] = drootw_ref[0, :] + jnp.sum(rp * inv[None, :], axis=1)

    # ---- reverse sweep ----
    def bstep(sr, _):
        s = n_steps - 1 - sr
        bp = blockP_ref[pl.ds(s, 1)][0]                # [maxc, Rb, Rb]
        v_all = valid_ref[pl.ds(s, 1)][0]              # [R]
        # node cotangents in raw (pre-rescale) coordinates
        g_rows = []
        for b in range(B):
            ps = nodecons_ref[s, b, 0]
            pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
            gn = gbuf[ps, pl.ds(pr, CS)]               # [CS, tile]
            g_rows.append(gn * minv[s, pl.ds(b, 1)][0][None, :])
        g_raw = jnp.concatenate(g_rows, axis=0)        # [Rb, tile]

        contribs, stacks, vs = [], [], []
        for j in range(maxc):
            stacked = stage[s, pl.ds(j * Rb, Rb)]      # [Rb, tile]
            contrib = jnp.dot(bp[j], stacked, preferred_element_type=f32,
                          precision=_MXU_PRECISION)
            v = v_all[j * Rb:(j + 1) * Rb][:, None]
            contribs.append(contrib * v + (1.0 - v))
            stacks.append(stacked)
            vs.append(v)

        dbps = []
        for i in range(maxc):
            other = g_raw * vs[i]
            for j in range(maxc):
                if j != i:
                    other = other * contribs[j]        # [Rb, tile]
            dbps.append(jax.lax.dot_general(
                other, stacks[i], (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=_MXU_PRECISION))           # [Rb, Rb]
            gch = jax.lax.dot_general(
                bp[i], other, (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=_MXU_PRECISION)            # [Rb, tile]
            gbuf[s, pl.ds(i * Rb, Rb)] = gch
        cur = dblockP_ref[pl.ds(s, 1)]
        dblockP_ref[pl.ds(s, 1)] = cur + jnp.stack(dbps)[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), bstep, jnp.int32(0))


def build_fused_backward(topo: Topology, C: int, S: int, P: int, L: int, *,
                         B: int = 8, interpret: bool = False,
                         dtype=jnp.float32, tile: int = TILE):
    """Returns fn(tips, blockP [L,...], rootw [L,1,CS], g [L,P]) ->
    (dblockP [L,...], drootw [L,1,CS])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // tile

    kernel = partial(_fused_bwd_kernel, C, S, B, maxc, n_steps, T,
                     pn["n_zero"], tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec((n_steps, R), lambda l, t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda l, t, *_: (0, 0, t)),
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda l, t, *_: (l, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda l, t, *_: (l, 0, 0)),
            pl.BlockSpec((None, 1, tile), lambda l, t, *_: (l, 0, t)),
        ],
        out_specs=[
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda l, t, *_: (l, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda l, t, *_: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, tile), dtype),
            pltpu.VMEM((n_steps + 1, R, tile), dtype),
            pltpu.VMEM((n_steps, B, tile), dtype),
            pltpu.VMEM((1, tile), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, n_steps, maxc, Rb, Rb), dtype),
            jax.ShapeDtypeStruct((L, 1, CS), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw, g):
        L_ = blockP.shape[0]
        dblockP, drootw = call(tipcons_j, nodecons_j, zrows_j, valid_j,
                               tips, blockP, rootw,
                               g.reshape(L_, 1, P))
        return dblockP, drootw

    return fn, sched


# --------------------------------------------------------------------------
# custom-vmap'd kernel entries + custom-VJP wrapper
# --------------------------------------------------------------------------


def _batched_call(inner, tips, others, axis_size, in_batched):
    """Shared custom_vmap rule body: flatten a new batch axis into the
    kernel's leading L axis.

    ``others`` are the [L, ...]-leading operands (blockP, rootw, [g]);
    batched entries arrive with the batch axis at 0 ([G, L, ...]).
    ``inner`` is the custom_vmap-wrapped callable itself, so nested vmaps
    recurse through the rule rather than hitting the raw pallas_call.
    """
    G = axis_size
    tb, rest_b = in_batched[0], in_batched[1:]
    if tb:
        # tips batched: no shared-tips kernel applies; run per batch
        # element sequentially (correct; rare — tips are constants in
        # every framework path)
        ins = (tips,) + tuple(
            o if b else jnp.broadcast_to(o[None], (G,) + o.shape)
            for o, b in zip(others, rest_b))
        out = jax.lax.map(lambda a: inner(a[0], *a[1:]), ins)
        if isinstance(out, tuple):
            return out, (True,) * len(out)
        return out, True
    flat = []
    for o, b in zip(others, rest_b):
        if not b:
            o = jnp.broadcast_to(o[None], (G,) + o.shape)
        L = o.shape[1]
        flat.append(o.reshape((G * L,) + o.shape[2:]))
    out = inner(tips, *flat)
    if isinstance(out, tuple):
        return (tuple(o.reshape((G, o.shape[0] // G) + o.shape[1:])
                      for o in out), (True,) * len(out))
    return out.reshape((G, out.shape[0] // G) + out.shape[1:]), True


def _fwd_callable(topo, C, B, interpret, S, tile):
    """custom_vmap-wrapped forward kernel entry: (tips, blockP, rootw) ->
    site [L, P]. vmap flattens into the leading L grid axis."""

    @jax.custom_batching.custom_vmap
    def fwd(tips, blockP, rootw):
        P = tips.shape[-1]
        fn, _ = build_fused_forward(topo, C, S, P, blockP.shape[0], B=B,
                                    interpret=interpret, dtype=tips.dtype,
                                    tile=tile)
        return fn(tips, blockP, rootw)

    @fwd.def_vmap
    def _rule(axis_size, in_batched, tips, blockP, rootw):
        return _batched_call(fwd, tips, (blockP, rootw),
                             axis_size, in_batched)

    return fwd


def _bwd_callable(topo, C, B, interpret, S, tile):
    """custom_vmap-wrapped backward kernel entry:
    (tips, blockP, rootw, g) -> (dblockP, drootw)."""

    @jax.custom_batching.custom_vmap
    def bwd(tips, blockP, rootw, g):
        P = tips.shape[-1]
        fn, _ = build_fused_backward(topo, C, S, P, blockP.shape[0], B=B,
                                     interpret=interpret, dtype=tips.dtype,
                                     tile=tile)
        return fn(tips, blockP, rootw, g)

    @bwd.def_vmap
    def _rule(axis_size, in_batched, tips, blockP, rootw, g):
        return _batched_call(bwd, tips, (blockP, rootw, g),
                             axis_size, in_batched)

    return bwd


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_site_log(topo: Topology, C: int, B: int, interpret: bool,
                    S: int, tile: int, tips, blockP, rootw):
    return _fwd_callable(topo, C, B, interpret, S, tile)(
        tips, blockP, rootw)


def _fused_fwd(topo, C, B, interpret, S, tile, tips, blockP, rootw):
    site = _fwd_callable(topo, C, B, interpret, S, tile)(
        tips, blockP, rootw)
    return site, (tips, blockP, rootw)


def _fused_bwd(topo, C, B, interpret, S, tile, residuals, g):
    tips, blockP, rootw = residuals
    dblockP, drootw = _bwd_callable(topo, C, B, interpret, S, tile)(
        tips, blockP, rootw, g)
    return (jnp.zeros_like(tips), dblockP, drootw.reshape(rootw.shape))


_fused_site_log.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def fused_site_log(tip_partials, pmats, topo: Topology, freqs, props, *,
                   B: int = None, tile: int = None, interpret: bool = False,
                   split_categories: bool = None):
    """Per-pattern site log-likelihoods [P] via the fused kernel.

    Differentiable w.r.t. pmats/freqs/props (tips are constants) and
    batchable with vmap (chains/ladders lower onto the kernel's leading
    grid axis via the custom_vmap rules). ``split_categories`` (default:
    auto by state count) selects the category-grid variant used for
    protein/codon state spaces."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    if split_categories is None:
        split_categories = _needs_csplit(C, S)
    if B is None or tile is None:
        plan = fused_plan(topo, C, S, P)
        if plan is None:  # explicit engine choice on an over-budget shape:
            plan = dict(B=pick_B(topo),  # run anyway, largest efficient B
                        tile=TILE_CSPLIT if split_categories else TILE)
        B = B if B is not None else plan["B"]
        tile = tile if tile is not None else plan["tile"]

    if split_categories:
        Sp = pad_states(S)
        tips = jax.lax.stop_gradient(tip_partials)
        if Sp != S:
            pmats = jnp.pad(pmats, ((0, 0), (0, 0), (0, Sp - S),
                                    (0, Sp - S)))
            tips = jnp.pad(tips, ((0, 0), (0, Sp - S), (0, 0)))
        sched = staged_schedule(topo, B)
        # per-category block-diagonal step matrices: [C, n_steps, m, Rb, Rb]
        blockP = jax.vmap(
            lambda pc: build_block_pmats(pc[:, None], sched, 1, Sp, B)
        )(jnp.moveaxis(pmats, 1, 0))
        rootw = props[:, None] * freqs[None, :]        # [C, S]
        rootw = jnp.pad(rootw, ((0, 0), (0, Sp - S))).reshape(C, 1, Sp)
        percat = _fused_site_log(topo, 1, B, interpret, Sp, tile,
                                 tips, blockP.astype(tips.dtype),
                                 rootw.astype(tips.dtype))
        # percat[c] = log(prop_c * freqs . root_partial_c) + scale_log_c;
        # the site likelihood is the category sum in linear space
        return jax.scipy.special.logsumexp(percat, axis=0)

    C2 = pad_categories(C, S)   # 8-sublane alignment of stage row blocks
    if C2 != C:
        reps = C2 - C
        pmats = jnp.concatenate(
            [pmats, jnp.repeat(pmats[:, -1:], reps, axis=1)], axis=1)
        props = jnp.concatenate([props, jnp.zeros(reps, props.dtype)])
        C = C2
    sched = staged_schedule(topo, B)
    blockP = build_block_pmats(pmats, sched, C, S, B)
    rootw = (props[:, None] * freqs[None, :]).reshape(1, 1, C * S)
    tips = jax.lax.stop_gradient(tip_partials)
    return _fused_site_log(topo, C, B, interpret, S, tile, tips,
                           blockP.astype(tips.dtype)[None],
                           rootw.astype(tips.dtype))[0]


def fused_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                              props, weights, *, rescale: bool = True,
                              B: int = None, interpret: bool = False):
    """(logL, site_log) via the fused kernel. ``rescale`` accepted for
    engine-API compatibility; the kernel always rescales (exact)."""
    site_log = fused_site_log(tip_partials, pmats, topo, freqs, props,
                              B=B, interpret=interpret)
    return jnp.sum(weights * site_log), site_log
