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

Large state spaces (protein S=20, codon S=61 — the reference's biggest
kernels, src/phyc/treelikelihood20.c / treelikelihoodCodon.c) use the
**category-split** mode: rate categories become a second (parallel) grid
axis, each instance runs the same kernel with C=1 on state-padded blocks
(20->24, 61->64 zero-padded rows/cols), and the per-category site values
combine in a logsumexp outside the kernel. This keeps every per-tile
buffer under VMEM where the packed C*S layout would blow past it.

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
            contrib = jnp.dot(bp[j], stacked, preferred_element_type=f32)
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
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_fused_forward(topo: Topology, C: int, S: int, P: int, *,
                        B: int = None, interpret: bool = False,
                        dtype=jnp.float32, tile: int = TILE,
                        n_cat: int = 0):
    """Returns (fn(tips [T,S,P], blockP, rootw) -> site_log, sched).

    ``n_cat = 0``: packed mode — blockP [n_steps, maxc, Rb, Rb] with
    C categories inside the block rows, site_log [P].
    ``n_cat > 0``: category-split mode — C must be 1, blockP has a leading
    [n_cat] axis, rootw is [n_cat, S], site_log is [n_cat, P] per-category
    (log of the prop-weighted category site likelihood + its scale log).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B is None:
        B = pick_B(topo)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // tile

    kernel = partial(_fused_fwd_kernel, C, S, B, maxc, n_steps, T,
                     pn["n_zero"], tile)

    if n_cat:
        assert C == 1
        grid = (n_cat, n_tiles)
        # the category axis rides as a squeezed (None) leading block dim:
        # a (1, CS) block over a (n_cat, CS) array violates Mosaic's
        # second-to-minor divisibility rule, so rootw/site_log carry an
        # explicit singleton row axis instead
        in_specs = [
            pl.BlockSpec((n_steps, R), lambda c, t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda c, t, *_: (0, 0, t)),
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda c, t, *_: (c, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda c, t, *_: (c, 0, 0)),
        ]
        out_spec = pl.BlockSpec((None, 1, tile), lambda c, t, *_: (c, 0, t))
        out_shape = jax.ShapeDtypeStruct((n_cat, 1, P), dtype)
        semantics = ("parallel", "parallel")
    else:
        grid = (n_tiles,)
        in_specs = [
            pl.BlockSpec((n_steps, R), lambda t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda t, *_: (0, 0, t)),
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
        ]
        out_spec = pl.BlockSpec((1, tile), lambda t, *_: (0, t))
        out_shape = jax.ShapeDtypeStruct((1, P), dtype)
        semantics = ("parallel",)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # tipcons, nodecons, zrows
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, tile), dtype),
            pltpu.VMEM((1, tile), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw):
        rw = rootw.reshape(n_cat, 1, CS) if n_cat else rootw
        out = call(tipcons_j, nodecons_j, zrows_j, valid_j, tips, blockP,
                   rw)
        return out[:, 0] if n_cat else out[0]

    return fn, sched


# --------------------------------------------------------------------------
# backward (rematerializing)
# --------------------------------------------------------------------------


def _fused_bwd_kernel(C, S, B, maxc, n_steps, T, n_zero, tile, tpid,
                      tipcons_ref, nodecons_ref, zrows_ref,
                      valid_ref, tips_ref, blockP_ref, rootw_ref, g_ref,
                      dblockP_ref, drootw_ref,
                      stage, gbuf, minv, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    Rb = B * CS

    @pl.when(pl.program_id(tpid) == 0)
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
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32)[0]
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
                    other = other * contribs[j]        # [Rb, tile]
            dbps.append(jax.lax.dot_general(
                other, stacks[i], (((1,), (1,)), ((), ())),
                preferred_element_type=f32))           # [Rb, Rb]
            gch = jax.lax.dot_general(
                bp[i], other, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)            # [Rb, tile]
            gbuf[s, pl.ds(i * Rb, Rb)] = gch
        cur = dblockP_ref[pl.ds(s, 1)]
        dblockP_ref[pl.ds(s, 1)] = cur + jnp.stack(dbps)[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), bstep, jnp.int32(0))


def build_fused_backward(topo: Topology, C: int, S: int, P: int, *,
                         B: int = None, interpret: bool = False,
                         dtype=jnp.float32, tile: int = TILE,
                         n_cat: int = 0):
    """Returns fn(tips, blockP, rootw, g) -> (dblockP, drootw). In
    category-split mode (``n_cat > 0``) g is [n_cat, P] and the outputs
    carry the leading [n_cat] axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B is None:
        B = pick_B(topo)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // tile

    if n_cat:
        assert C == 1
        kernel = partial(_fused_bwd_kernel, C, S, B, maxc, n_steps, T,
                         pn["n_zero"], tile, 1)
        grid = (n_cat, n_tiles)
        # same squeezed-category-axis trick as the forward: (1, CS)/(1, tile)
        # blocks over (n_cat, ...) arrays violate Mosaic's second-to-minor
        # rule, so rootw/g/drootw carry an explicit singleton row axis
        in_specs = [
            pl.BlockSpec((n_steps, R), lambda c, t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda c, t, *_: (0, 0, t)),
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda c, t, *_: (c, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda c, t, *_: (c, 0, 0)),
            pl.BlockSpec((None, 1, tile), lambda c, t, *_: (c, 0, t)),
        ]
        out_specs = [
            pl.BlockSpec((None, n_steps, maxc, Rb, Rb),
                         lambda c, t, *_: (c, 0, 0, 0, 0)),
            pl.BlockSpec((None, 1, CS), lambda c, t, *_: (c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_cat, n_steps, maxc, Rb, Rb), dtype),
            jax.ShapeDtypeStruct((n_cat, 1, CS), dtype),
        ]
        semantics = ("parallel", "arbitrary")
    else:
        kernel = partial(_fused_bwd_kernel, C, S, B, maxc, n_steps, T,
                         pn["n_zero"], tile, 0)
        grid = (n_tiles,)
        in_specs = [
            pl.BlockSpec((n_steps, R), lambda t, *_: (0, 0)),
            pl.BlockSpec((T, S, tile), lambda t, *_: (0, 0, t)),
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, tile), lambda t, *_: (0, t)),
        ]
        out_specs = [
            pl.BlockSpec((n_steps, maxc, Rb, Rb), lambda t, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, *_: (0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_steps, maxc, Rb, Rb), dtype),
            jax.ShapeDtypeStruct((1, CS), dtype),
        ]
        semantics = ("arbitrary",)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
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
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
    )

    tipcons_j = jnp.asarray(pn["tipcons"])
    nodecons_j = jnp.asarray(pn["nodecons"])
    zrows_j = jnp.asarray(pn["zrows"])
    valid_j = jnp.asarray(pn["validf"], dtype)

    def fn(tips, blockP, rootw, g):
        if n_cat:
            rw = rootw.reshape(n_cat, 1, CS)
            g2 = g.reshape(n_cat, 1, P)
        else:
            rw = rootw
            g2 = g.reshape(1, P)
        dblockP, drootw = call(tipcons_j, nodecons_j, zrows_j, valid_j,
                               tips, blockP, rw, g2)
        return dblockP, drootw

    return fn, sched


# --------------------------------------------------------------------------
# custom-VJP wrapper + public API
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_site_log(topo: Topology, C: int, B: int, interpret: bool,
                    S: int, tile: int, n_cat: int, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_fused_forward(topo, C, S, P, B=B, interpret=interpret,
                                dtype=tips.dtype, tile=tile, n_cat=n_cat)
    return fn(tips, blockP, rootw)


def _fused_fwd(topo, C, B, interpret, S, tile, n_cat, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_fused_forward(topo, C, S, P, B=B, interpret=interpret,
                                dtype=tips.dtype, tile=tile, n_cat=n_cat)
    site = fn(tips, blockP, rootw)
    return site, (tips, blockP, rootw)


def _fused_bwd(topo, C, B, interpret, S, tile, n_cat, residuals, g):
    tips, blockP, rootw = residuals
    P = tips.shape[-1]
    fn, _ = build_fused_backward(topo, C, S, P, B=B, interpret=interpret,
                                 dtype=tips.dtype, tile=tile, n_cat=n_cat)
    dblockP, drootw = fn(tips, blockP, rootw, g)
    return (jnp.zeros_like(tips), dblockP, drootw.reshape(rootw.shape))


_fused_site_log.defvjp(_fused_fwd, _fused_bwd)


def _needs_csplit(C: int, S: int) -> bool:
    """Packed rows need C*S % 8 == 0 with tolerable padding; odd S (61)
    can never satisfy it by padding categories, and big C*S blows VMEM."""
    if S <= 8:
        return False
    CS = C * S
    while CS % 8:
        CS += S
    return CS > 64 or S % 2


def fused_site_log(tip_partials, pmats, topo: Topology, freqs, props, *,
                   B: int = None, interpret: bool = False,
                   split_categories: bool = None):
    """Per-pattern site log-likelihoods [P] via the fused kernel.

    Differentiable w.r.t. pmats/freqs/props (same contract as
    staged_site_log: tips are constants). ``split_categories`` (default:
    auto by state count) selects the category-grid variant used for
    protein/codon state spaces."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    if split_categories is None:
        split_categories = _needs_csplit(C, S)
    if B is None:
        B = pick_B(topo)

    if split_categories:
        Sp = pad_states(S)
        tile = TILE_CSPLIT if P % TILE_CSPLIT == 0 else TILE
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
        rootw = jnp.pad(rootw, ((0, 0), (0, Sp - S)))
        percat = _fused_site_log(topo, 1, B, interpret, Sp, tile, C,
                                 tips, blockP.astype(tips.dtype),
                                 rootw.astype(tips.dtype))
        # percat[c] = log(prop_c * freqs . root_partial_c) + scale_log_c;
        # the site likelihood is the category sum in linear space
        return jax.scipy.special.logsumexp(percat, axis=0)

    if (C * S) % 8:  # 8-sublane alignment of stage row blocks
        C2 = C
        while (C2 * S) % 8:
            C2 += 1
        reps = C2 - C
        pmats = jnp.concatenate(
            [pmats, jnp.repeat(pmats[:, -1:], reps, axis=1)], axis=1)
        props = jnp.concatenate([props, jnp.zeros(reps, props.dtype)])
        C = C2
    sched = staged_schedule(topo, B)
    blockP = build_block_pmats(pmats, sched, C, S, B)
    rootw = (props[:, None] * freqs[None, :]).reshape(1, C * S)
    tips = jax.lax.stop_gradient(tip_partials)
    return _fused_site_log(topo, C, B, interpret, S, TILE, 0, tips,
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
