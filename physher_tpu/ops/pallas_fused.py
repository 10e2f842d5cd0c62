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
- **megacore**: the tile axis is marked ``parallel`` in the forward, so the
  two v5e cores split tiles; the backward accumulates dblockP across tiles
  and stays ``arbitrary``;
- **per-tree block size**: ``pick_B`` chooses B from the level-packing
  efficiency, so ladder trees (fluA) use small dots at full occupancy while
  balanced trees batch 8 nodes into MXU-native [128, 128] operands.

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


def pick_B(topo: Topology, candidates=(8, 4, 2, 1), min_eff: float = 0.6):
    """Largest step block size whose level packing wastes <40% of slots."""
    I = topo.I
    for B in candidates:
        n_steps = sum(-(-len(r) // B) for r in topo.levels)
        if I / (n_steps * B) >= min_eff:
            return B
    return 1


def fused_vmem_estimate(topo: Topology, C: int, S: int, B: int,
                        backward: bool = True) -> int:
    """Bytes of VMEM the fused kernel needs per pattern tile (f32)."""
    CS = C * S
    Rb = B * CS
    maxc = int(topo.child_count.max())
    R = maxc * Rb
    n_steps = sum(-(-len(r) // B) for r in topo.levels)
    stage = (n_steps + 1) * R * TILE * 4
    blockP = n_steps * maxc * Rb * Rb * 4
    tips = topo.T * S * TILE * 4
    valid = n_steps * R * 4
    base = stage + blockP + tips + valid + 4 * TILE * 4
    if not backward:
        return base
    gbuf = (n_steps + 1) * R * TILE * 4
    minv = n_steps * B * TILE * 4
    return base + gbuf + minv + blockP  # dblockP accumulator = blockP size


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_body(C, S, B, maxc, n_steps, T, n_zero,
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
        stage[zrows_ref[i, 0], pl.ds(r, CS)] = jnp.zeros((CS, TILE), f32)
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_zero), init_zero,
                      jnp.int32(0))

    def init_tip(t, _):
        tp = tips_ref[pl.ds(t, 1)][0]                  # [S, TILE]
        exp = jnp.broadcast_to(tp[None], (C, S, TILE)).reshape(CS, TILE)
        stage[tipcons_ref[t, 0],
              pl.ds(pl.multiple_of(tipcons_ref[t, 1], CS), CS)] = exp
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), init_tip, jnp.int32(0))
    scal_acc[0, :] = jnp.zeros((TILE,), f32)

    def step(s, _):
        bp = blockP_ref[pl.ds(s, 1)][0]                # [maxc, Rb, Rb]
        v_all = valid_ref[pl.ds(s, 1)][0]              # [R]
        res = None
        for j in range(maxc):
            stacked = stage[s, pl.ds(j * Rb, Rb)]      # [Rb, TILE]
            contrib = jnp.dot(bp[j], stacked, preferred_element_type=f32)
            v = v_all[j * Rb:(j + 1) * Rb][:, None]    # [Rb, 1]
            contrib = contrib * v + (1.0 - v)
            res = contrib if res is None else res * contrib
        logm_sum = None
        for b in range(B):
            rb = res[b * CS:(b + 1) * CS]
            m = jnp.max(rb, axis=0, keepdims=True)     # [1, TILE]
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


def _fused_fwd_kernel(C, S, B, maxc, n_steps, T, n_zero,
                      tipcons_ref, nodecons_ref, zrows_ref,
                      valid_ref, tips_ref, blockP_ref, rootw_ref,
                      site_log_ref, stage, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    _fwd_body(C, S, B, maxc, n_steps, T, n_zero,
              tipcons_ref, nodecons_ref, zrows_ref,
              valid_ref, tips_ref, blockP_ref, rootw_ref, stage, scal_acc)
    rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, TILE]
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_fused_forward(topo: Topology, C: int, S: int, P: int, *,
                        B: int = None, interpret: bool = False,
                        dtype=jnp.float32):
    """Returns (fn(tips [T,S,P], blockP, rootw) -> site_log [P], sched)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B is None:
        B = pick_B(topo)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // TILE

    kernel = partial(_fused_fwd_kernel, C, S, B, maxc, n_steps, T,
                     pn["n_zero"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # tipcons, nodecons, zrows
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_steps, R), lambda t, *_: (0, 0)),
            pl.BlockSpec((T, S, TILE), lambda t, *_: (0, 0, t)),
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda t, *_: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, TILE), dtype),
            pltpu.VMEM((1, TILE), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, P), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw):
        out = call(tipcons_j, nodecons_j, zrows_j, valid_j, tips, blockP,
                   rootw)
        return out[0]

    return fn, sched


# --------------------------------------------------------------------------
# backward (rematerializing)
# --------------------------------------------------------------------------


def _fused_bwd_kernel(C, S, B, maxc, n_steps, T, n_zero,
                      tipcons_ref, nodecons_ref, zrows_ref,
                      valid_ref, tips_ref, blockP_ref, rootw_ref, g_ref,
                      dblockP_ref, drootw_ref,
                      stage, gbuf, minv, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    Rb = B * CS

    @pl.when(pl.program_id(0) == 0)
    def _init_out():
        dblockP_ref[...] = jnp.zeros_like(dblockP_ref[...])
        drootw_ref[...] = jnp.zeros_like(drootw_ref[...])

    # ---- forward recompute (captures minv) ----
    _fwd_body(C, S, B, maxc, n_steps, T, n_zero,
              tipcons_ref, nodecons_ref, zrows_ref,
              valid_ref, tips_ref, blockP_ref, rootw_ref, stage, scal_acc,
              minv_ref=minv)

    # ---- root cotangent (scaled coordinates) ----
    gbuf[...] = jnp.zeros_like(gbuf[...])
    rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, TILE]
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    inv = g_ref[0, :] / site                           # [TILE]
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
            gn = gbuf[ps, pl.ds(pr, CS)]               # [CS, TILE]
            g_rows.append(gn * minv[s, pl.ds(b, 1)][0][None, :])
        g_raw = jnp.concatenate(g_rows, axis=0)        # [Rb, TILE]

        contribs, stacks, vs = [], [], []
        for j in range(maxc):
            stacked = stage[s, pl.ds(j * Rb, Rb)]      # [Rb, TILE]
            contrib = jnp.dot(bp[j], stacked, preferred_element_type=f32)
            v = v_all[j * Rb:(j + 1) * Rb][:, None]
            contribs.append(contrib * v + (1.0 - v))
            stacks.append(stacked)
            vs.append(v)

        dbps = []
        for i in range(maxc):
            other = g_raw * vs[i]
            for j in range(maxc):
                if j != i:
                    other = other * contribs[j]        # [Rb, TILE]
            dbps.append(jax.lax.dot_general(
                other, stacks[i], (((1,), (1,)), ((), ())),
                preferred_element_type=f32))           # [Rb, Rb]
            gch = jax.lax.dot_general(
                bp[i], other, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)            # [Rb, TILE]
            gbuf[s, pl.ds(i * Rb, Rb)] = gch
        cur = dblockP_ref[pl.ds(s, 1)]
        dblockP_ref[pl.ds(s, 1)] = cur + jnp.stack(dbps)[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), bstep, jnp.int32(0))


def build_fused_backward(topo: Topology, C: int, S: int, P: int, *,
                         B: int = None, interpret: bool = False,
                         dtype=jnp.float32):
    """Returns fn(tips, blockP, rootw, g) -> (dblockP, drootw)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B is None:
        B = pick_B(topo)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // TILE

    kernel = partial(_fused_bwd_kernel, C, S, B, maxc, n_steps, T,
                     pn["n_zero"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_steps, R), lambda t, *_: (0, 0)),
            pl.BlockSpec((T, S, TILE), lambda t, *_: (0, 0, t)),
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, TILE), lambda t, *_: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, TILE), dtype),
            pltpu.VMEM((n_steps + 1, R, TILE), dtype),
            pltpu.VMEM((n_steps, B, TILE), dtype),
            pltpu.VMEM((1, TILE), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, maxc, Rb, Rb), dtype),
            jax.ShapeDtypeStruct((1, CS), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw, g):
        dblockP, drootw = call(tipcons_j, nodecons_j, zrows_j, valid_j,
                               tips, blockP, rootw, g.reshape(1, P))
        return dblockP, drootw[0]

    return fn, sched


# --------------------------------------------------------------------------
# custom-VJP wrapper + public API
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_site_log(topo: Topology, C: int, B: int, interpret: bool,
                    S: int, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_fused_forward(topo, C, S, P, B=B, interpret=interpret,
                                dtype=tips.dtype)
    return fn(tips, blockP, rootw)


def _fused_fwd(topo, C, B, interpret, S, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_fused_forward(topo, C, S, P, B=B, interpret=interpret,
                                dtype=tips.dtype)
    site = fn(tips, blockP, rootw)
    return site, (tips, blockP, rootw)


def _fused_bwd(topo, C, B, interpret, S, residuals, g):
    tips, blockP, rootw = residuals
    P = tips.shape[-1]
    fn, _ = build_fused_backward(topo, C, S, P, B=B, interpret=interpret,
                                 dtype=tips.dtype)
    dblockP, drootw = fn(tips, blockP, rootw, g)
    return (jnp.zeros_like(tips), dblockP, drootw.reshape(1, -1))


_fused_site_log.defvjp(_fused_fwd, _fused_bwd)


def fused_site_log(tip_partials, pmats, topo: Topology, freqs, props, *,
                   B: int = None, interpret: bool = False):
    """Per-pattern site log-likelihoods [P] via the fused kernel.

    Differentiable w.r.t. pmats/freqs/props (same contract as
    staged_site_log: tips are constants)."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    if (C * S) % 8:  # 8-sublane alignment of stage row blocks
        C2 = C
        while (C2 * S) % 8:
            C2 += 1
        reps = C2 - C
        pmats = jnp.concatenate(
            [pmats, jnp.repeat(pmats[:, -1:], reps, axis=1)], axis=1)
        props = jnp.concatenate([props, jnp.zeros(reps, props.dtype)])
        C = C2
    if B is None:
        B = pick_B(topo)
    sched = staged_schedule(topo, B)
    blockP = build_block_pmats(pmats, sched, C, S, B)
    rootw = (props[:, None] * freqs[None, :]).reshape(1, C * S)
    tips = jax.lax.stop_gradient(tip_partials)
    return _fused_site_log(topo, C, B, interpret, S, tips,
                           blockP.astype(tips.dtype),
                           rootw.astype(tips.dtype))


def fused_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                              props, weights, *, rescale: bool = True,
                              B: int = None, interpret: bool = False):
    """(logL, site_log) via the fused kernel. ``rescale`` accepted for
    engine-API compatibility; the kernel always rescales (exact)."""
    site_log = fused_site_log(tip_partials, pmats, topo, freqs, props,
                              B=B, interpret=interpret)
    return jnp.sum(weights * site_log), site_log
