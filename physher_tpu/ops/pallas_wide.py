"""Wide-state HBM-staged Pallas pruning kernel (TPU).

Fourth-generation engine for the Felsenstein pruning hot loop, built for
LARGE state spaces on LARGE trees — codon models at 64+ taxa and protein
models at 256+ taxa, the shapes the reference serves with its 7.8 kLoC
codon kernel family (reference: src/phyc/treelikelihoodCodon.c:1,
treelikelihood20.c) and that fall outside the fused kernel's
whole-postorder-in-VMEM gate (ops/pallas_fused.py) and the staged
kernel's resident stage buffer (ops/pallas_staged.py).

Design deltas vs the staged kernel:

- **Stage buffer in HBM**: the consumer-slot stage buffer — the staged
  kernel's VMEM-resident [(n_steps+1), R, TILE] array, which at codon/
  protein CS blows past VMEM for deep trees — lives in HBM
  (``memory_space=ANY``), donated through ``input_output_aliases`` so the
  forward writes it in place. Each grid step DMAs its input slab
  [R, TILE] into VMEM, computes, and DMAs each node's rescaled partials
  [CS, TILE] to its consumer's slot at a dynamic (step, row) offset.
  VMEM per step is O(R * TILE), independent of tree depth.
- **Grid (steps, tiles)** with steps OUTER (both axes "arbitrary" =
  sequential): a write issued at program (s, t) lands before any read at
  (s', t'), s' > s, because every write's semaphore is awaited before
  program end. The backward accumulates each step's dblockP over the
  inner tile axis in VMEM (consecutive output-block revisiting), so the
  [n_steps, maxc, BG, Rg, Rg] gradient buffer streams instead of sitting
  resident (the staged backward's other VMEM cliff).
- **Group-diagonal MXU dots**: nodes pack into groups of
  G = max(1, 128 // CS); each group's step matrix is block-diagonal over
  (node-in-group, category) with the children's [S, S] P-matrices, so the
  MXU sees [Rg, Rg] @ [Rg, TILE] with Rg = G*CS <= 128 — full-width dots
  at a G*C FLOP-padding factor instead of S/128-utilization slivers
  (codon: Rg = 128 exactly).
- **Tips prestaged in plain JAX**: the initial stage buffer (zeros +
  category-broadcast tip partials scattered to their consumer slots) is
  built with one XLA scatter per call and donated to the kernel — no
  in-kernel tip init and no uninitialized-row hazard (every never-written
  row is zero, and masked slots contribute (1 - valid) = 1 exactly as in
  the staged kernel).

Gradients follow the staged kernel's scheme (reference O(N)
upper-partials sweep, treelikelihood.c:2129-3100, as cotangents of the
staged values): the forward spills the stage + per-node 1/max factors,
the backward walks steps in reverse with the cotangent buffer ``gbuf``
living in HBM under the same DMA discipline. The custom VJP is defined
on (tips, blockP, rootw); pmats -> blockP and (freqs, props) -> rootw
stay ordinary differentiable JAX.

State counts are padded to a multiple of 8 (Mosaic sublane alignment)
with zero states — exact: zero P-matrix rows/columns, zero tip rows and
zero root frequencies keep padded states out of every product, max and
log (probabilities are >= 0 so per-node maxima ignore the zero rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology
from .pallas_staged import _MXU_PRECISION, _plan, staged_schedule

TILE = 256


def wide_groups(C: int, S: int, B: int = 8) -> int:
    """Nodes per MXU dot: the largest G with G*C*S <= 128 dividing B."""
    CS = C * S
    G = max(1, 128 // CS)
    while B % G:
        G -= 1
    return G


def build_group_pmats(pmats, sched, C, S, B, G, dtype=None):
    """[n_steps, maxc, BG, Rg, Rg] group-diagonal step matrices from
    pmats [N, C, S, S]: group g of step s covers nodes b = g*G .. g*G+G-1,
    block (bg, c) of its per-child matrix is P[child(j, g*G+bg), c].

    Same scatter-free construction as the staged kernel's
    ``build_block_pmats`` (pad-to-column-offset + reshape): layout ops
    only, so the VJP transposes to slices instead of a serial
    scatter-add on the gradient hot path."""
    maxc = sched["maxc"]
    n_steps = sched["n_steps"]
    CS = C * S
    Rg = G * CS
    BG = B // G
    dt = dtype or pmats.dtype
    child = sched["child_id"].reshape(n_steps, maxc, B)   # slot = j*B + b
    csafe = np.maximum(child, 0)
    pmg = pmats[csafe]                                    # [s, m, B, C, S, S]
    pmg = pmg * jnp.asarray(child >= 0, pmg.dtype)[..., None, None, None]
    # row index within a group, (bg, c, i) -> bg*CS + c*S + i, is the
    # row-major flatten; only columns need the per-block diagonal shift
    GC = G * C
    pmg = pmg.reshape(n_steps, maxc, BG, GC, S, S).astype(dt)
    cols = [jnp.pad(pmg[:, :, :, k],
                    ((0, 0), (0, 0), (0, 0), (0, 0),
                     (k * S, Rg - (k + 1) * S)))
            for k in range(GC)]
    return jnp.stack(cols, axis=3).reshape(n_steps, maxc, BG, Rg, Rg)


def build_stage0(tips, pn, C, dtype):
    """Initial HBM stage buffer: zeros with category-broadcast tip slabs
    scattered to their consumer slots.

    The scatter operates on whole [CS, P] slot blocks with T int32
    indices — a per-ROW index formulation (T*CS indices) compiled its
    index operand into ~0.5 MB of SMEM and broke 2048-taxa compiles
    (SMEM is 1 MB total)."""
    T, S, P = tips.shape
    CS = C * S
    R = pn["R"]
    slots_per_step = R // CS
    n_slots = (pn["n_steps"] + 1) * slots_per_step
    texp = jnp.broadcast_to(tips[:, None], (T, C, S, P)).reshape(T, CS, P)
    idx = (pn["tipcons"][:, 0].astype(np.int32) * slots_per_step
           + pn["tipcons"][:, 1].astype(np.int32) // CS)
    stage = jnp.zeros((n_slots, CS, P), dtype)
    stage = stage.at[jnp.asarray(idx)].set(texp.astype(dtype))
    return stage.reshape(pn["n_steps"] + 1, R, P)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(C, S, B, G, maxc, n_steps,
                nodecons_ref,
                stage_in, blockP_ref, rootw_ref,
                stage, minv_ref, site_ref,
                in_buf, obuf, rbuf, sbuf, scal_acc, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = in_buf.dtype
    CS = C * S
    Rg = G * CS
    BG = B // G
    Rb = B * CS
    s = pl.program_id(0)
    t = pl.program_id(1)

    rd = pltpu.make_async_copy(
        stage.at[s, :, pl.ds(t * TILE, TILE)], in_buf, sems.at[0])
    rd.start()
    rd.wait()

    @pl.when(s == 0)
    def _init():
        scal_acc[t] = jnp.zeros((1, TILE), f32)

    # no validity masking on the slabs: the prestaged buffer is zero
    # everywhere never written (build_stage0), so a dummy node position's
    # slots read zeros, its product is zero and its rescale max clamps to
    # tiny; only the log-max accumulator needs the real-node flag
    # (nodecons[.., 2]) to keep log(tiny) out of the site scalers. Real
    # nodes are binary-complete (maxc == 2 gate), so their slots are
    # always live.
    writes = []
    logm_sum = None
    for g in range(BG):
        res = None
        for j in range(maxc):
            rows = j * Rb + g * Rg
            stacked = in_buf[pl.ds(rows, Rg)]               # [Rg, TILE]
            contrib = jnp.dot(blockP_ref[0, j, g], stacked,
                              preferred_element_type=f32,
                              precision=_MXU_PRECISION)
            res = contrib if res is None else res * contrib
        for bg in range(G):
            b = g * G + bg
            rb = res[bg * CS:(bg + 1) * CS]                 # [CS, TILE]
            m = jnp.max(rb, axis=0, keepdims=True)
            m = jnp.maximum(m, jnp.finfo(f32).tiny)
            obuf[b] = rb / m
            real = nodecons_ref[s, b, 2].astype(f32)
            lm = jnp.log(m) * real
            logm_sum = lm if logm_sum is None else logm_sum + lm
            minv_ref[0, b] = (1.0 / m)[0]
            ps = nodecons_ref[s, b, 0]
            pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
            wr = pltpu.make_async_copy(
                obuf.at[b],
                stage.at[ps, pl.ds(pr, CS), pl.ds(t * TILE, TILE)],
                sems.at[1 + b])
            wr.start()
            writes.append(wr)
    scal_acc[t] = scal_acc[t] + logm_sum
    for wr in writes:
        wr.wait()

    @pl.when(s == n_steps - 1)
    def _root():
        rd2 = pltpu.make_async_copy(
            stage.at[n_steps, pl.ds(0, CS), pl.ds(t * TILE, TILE)],
            rbuf, sems.at[0])
        rd2.start()
        rd2.wait()
        site = jnp.dot(rootw_ref[:], rbuf[...],
                       preferred_element_type=f32,
                       precision=_MXU_PRECISION)[0]
        site = jnp.maximum(site, jnp.finfo(f32).tiny)
        sbuf[0, :] = jnp.log(site) + scal_acc[t][0]
        wr2 = pltpu.make_async_copy(
            sbuf, site_ref.at[:, pl.ds(t * TILE, TILE)], sems.at[0])
        wr2.start()
        wr2.wait()


def build_wide_forward(topo: Topology, C: int, S: int, P: int, *,
                       B: int = 8, G: int = None, interpret: bool = False,
                       dtype=jnp.float32):
    """Returns fn(tips [T,S,P], blockP [n_steps,maxc,BG,Rg,Rg],
    rootw [1,CS]) -> (site_log [P], stage, minv)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if G is None:
        G = wide_groups(C, S, B)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    Rg = G * CS
    BG = B // G
    n_tiles = P // TILE

    kernel = partial(_fwd_kernel, C, S, B, G, maxc, n_steps)

    # nodecons + per-(step, b) real-node flag (replaces the former dense
    # [n_steps, R] validity plane, whose SMEM prefetch footprint broke
    # 2048-taxa compiles)
    ncw = np.concatenate(
        [pn["nodecons"],
         np.zeros((n_steps, pn["nodecons"].shape[1], 1), np.int32)],
        axis=2)
    for k in range(topo.I):
        ncw[sched["node_step"][k], sched["node_pos"][k], 2] = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # nodecons (+ real flag)
        grid=(n_steps, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                   # stage_in
            pl.BlockSpec((1, maxc, BG, Rg, Rg),
                         lambda s, t, *_: (s, 0, 0, 0, 0)),       # blockP
            pl.BlockSpec((1, CS), lambda s, t, *_: (0, 0)),       # rootw
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # stage
            pl.BlockSpec((1, B, TILE), lambda s, t, *_: (s, 0, t)),
            pl.BlockSpec(memory_space=pl.ANY),                    # site_log
        ],
        scratch_shapes=[
            pltpu.VMEM((R, TILE), dtype),          # in_buf
            pltpu.VMEM((B, CS, TILE), dtype),      # obuf
            pltpu.VMEM((CS, TILE), dtype),         # rbuf (root slab)
            pltpu.VMEM((1, TILE), dtype),          # sbuf (site row)
            pltpu.VMEM((n_tiles, 1, TILE), dtype),  # scal_acc
            pltpu.SemaphoreType.DMA((B + 1,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps + 1, R, P), dtype),
            jax.ShapeDtypeStruct((n_steps, B, P), dtype),
            jax.ShapeDtypeStruct((1, P), dtype),
        ],
        input_output_aliases={1: 0},      # stage_in (after prefetch) -> stage
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    def fn(tips, blockP, rootw):
        stage0 = build_stage0(tips, pn, C, tips.dtype)
        stage, minv, site = call(jnp.asarray(ncw), stage0, blockP, rootw)
        return site[0], stage, minv

    return fn, sched


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(C, S, B, G, maxc, n_steps, n_tiles,
                nodecons_ref,
                stage_ref, root_stage_ref, blockP_ref,
                minv_ref, rootw_ref, g_ref,
                dblockP_ref, drootw_ref, gbuf,
                gin, gout, rbuf, zbuf, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = gin.dtype
    CS = C * S
    Rg = G * CS
    BG = B // G
    Rb = B * CS
    sr = pl.program_id(0)
    s = n_steps - 1 - sr
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init_block():
        dblockP_ref[...] = jnp.zeros_like(dblockP_ref[...])

    @pl.when((sr == 0) & (t == 0))
    def _init_root_out():
        drootw_ref[...] = jnp.zeros_like(drootw_ref[...])

    @pl.when(sr == 0)
    def _root():
        rp = root_stage_ref[0, pl.ds(0, CS)]               # [CS, TILE]
        site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32,
                       precision=_MXU_PRECISION)[0]
        site = jnp.maximum(site, jnp.finfo(f32).tiny)
        inv = g_ref[0, :] / site
        rbuf[...] = rootw_ref[0][:, None] * inv[None, :]
        zbuf[...] = jnp.zeros((CS, TILE), f32)
        wr = pltpu.make_async_copy(
            rbuf, gbuf.at[n_steps, pl.ds(0, CS), pl.ds(t * TILE, TILE)],
            sems.at[B])
        wr.start()
        wz = pltpu.make_async_copy(
            zbuf, gbuf.at[n_steps, pl.ds(CS, CS), pl.ds(t * TILE, TILE)],
            sems.at[B + 1])
        wz.start()
        drootw_ref[0, :] = drootw_ref[0, :] + jnp.sum(rp * inv[None, :],
                                                      axis=1)
        wr.wait()
        wz.wait()

    # gather this step's node cotangents (written by consumer steps,
    # processed earlier in the reversed order)
    reads = []
    for b in range(B):
        ps = nodecons_ref[s, b, 0]
        pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
        rd = pltpu.make_async_copy(
            gbuf.at[ps, pl.ds(pr, CS), pl.ds(t * TILE, TILE)],
            gin.at[b], sems.at[b])
        rd.start()
        reads.append(rd)
    for rd in reads:
        rd.wait()

    for g in range(BG):
        g_rows = [gin[g * G + bg] * minv_ref[0, g * G + bg][None, :]
                  for bg in range(G)]
        g_g = jnp.concatenate(g_rows, axis=0)              # [Rg, TILE]
        # no validity masking: dummy positions' cotangents read the zeroed
        # gbuf scratch row, so their rows of g_g are zero and every dummy
        # contribution to dblockP / gbuf vanishes (see _fwd_kernel note)
        contribs, stacks = [], []
        for j in range(maxc):
            rows = j * Rb + g * Rg
            stacked = stage_ref[0, pl.ds(rows, Rg)]        # [Rg, TILE]
            contrib = jnp.dot(blockP_ref[0, j, g], stacked,
                              preferred_element_type=f32,
                              precision=_MXU_PRECISION)
            contribs.append(contrib)
            stacks.append(stacked)
        for i in range(maxc):
            other = g_g
            for j in range(maxc):
                if j != i:
                    other = other * contribs[j]            # [Rg, TILE]
            dbp = jax.lax.dot_general(
                other, stacks[i], (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=_MXU_PRECISION)                  # [Rg, Rg]
            dblockP_ref[0, i, g] = dblockP_ref[0, i, g] + dbp
            gch = jax.lax.dot_general(
                blockP_ref[0, i, g], other, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_MXU_PRECISION)                  # [Rg, TILE]
            gout[pl.ds(i * Rb + g * Rg, Rg)] = gch
    wr = pltpu.make_async_copy(
        gout, gbuf.at[s, :, pl.ds(t * TILE, TILE)], sems.at[0])
    wr.start()
    wr.wait()


def build_wide_backward(topo: Topology, C: int, S: int, P: int, *,
                        B: int = 8, G: int = None,
                        interpret: bool = False, dtype=jnp.float32):
    """Returns fn(stage, minv, blockP, rootw, g) -> (dblockP, drootw)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if G is None:
        G = wide_groups(C, S, B)
    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R = (pn["maxc"], pn["n_steps"], pn["CS"],
                                pn["Rb"], pn["R"])
    Rg = G * CS
    BG = B // G
    n_tiles = P // TILE

    kernel = partial(_bwd_kernel, C, S, B, G, maxc, n_steps, n_tiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # nodecons
        grid=(n_steps, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R, TILE),
                         lambda sr, t, *_: (n_steps - 1 - sr, 0, t)),
            pl.BlockSpec((1, R, TILE), lambda sr, t, *_: (n_steps, 0, t)),
            pl.BlockSpec((1, maxc, BG, Rg, Rg),
                         lambda sr, t, *_: (n_steps - 1 - sr, 0, 0, 0, 0)),
            pl.BlockSpec((1, B, TILE),
                         lambda sr, t, *_: (n_steps - 1 - sr, 0, t)),
            pl.BlockSpec((1, CS), lambda sr, t, *_: (0, 0)),
            pl.BlockSpec((1, TILE), lambda sr, t, *_: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((1, maxc, BG, Rg, Rg),
                         lambda sr, t, *_: (n_steps - 1 - sr, 0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda sr, t, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                    # gbuf
        ],
        scratch_shapes=[
            pltpu.VMEM((B, CS, TILE), dtype),      # gin
            pltpu.VMEM((R, TILE), dtype),          # gout
            pltpu.VMEM((CS, TILE), dtype),         # rbuf
            pltpu.VMEM((CS, TILE), dtype),         # zbuf
            pltpu.SemaphoreType.DMA((B + 2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, maxc, BG, Rg, Rg), dtype),
            jax.ShapeDtypeStruct((1, CS), dtype),
            jax.ShapeDtypeStruct((n_steps + 1, R, P), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    def fn(stage, minv, blockP, rootw, g):
        dblockP, drootw, _ = call(jnp.asarray(pn["nodecons"]),
                                  stage, stage,
                                  blockP, minv, rootw, g.reshape(1, P))
        return dblockP, drootw[0]

    return fn, sched


# --------------------------------------------------------------------------
# custom-VJP wrapper + public API
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _wide_site_log(topo: Topology, C: int, B: int, G: int, interpret: bool,
                   S: int, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_wide_forward(topo, C, S, P, B=B, G=G, interpret=interpret,
                               dtype=tips.dtype)

    def fwd_only(tips, blockP, rootw):
        site, _, _ = fn(tips, blockP, rootw)
        return site

    return jax.custom_batching.sequential_vmap(fwd_only)(tips, blockP, rootw)


def _wide_fwd(topo, C, B, G, interpret, S, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_wide_forward(topo, C, S, P, B=B, G=G, interpret=interpret,
                               dtype=tips.dtype)
    site, stage, minv = jax.custom_batching.sequential_vmap(fn)(
        tips, blockP, rootw)
    return site, (stage, minv, blockP, rootw)


def _wide_bwd(topo, C, B, G, interpret, S, residuals, g):
    stage, minv, blockP, rootw = residuals
    P = stage.shape[-1]
    fn, _ = build_wide_backward(topo, C, S, P, B=B, G=G, interpret=interpret,
                                dtype=stage.dtype)
    dblockP, drootw = jax.custom_batching.sequential_vmap(fn)(
        stage, minv, blockP, rootw, g)
    return (jnp.zeros((topo.T, S, P), stage.dtype), dblockP,
            drootw.reshape(1, -1))


_wide_site_log.defvjp(_wide_fwd, _wide_bwd)


def wide_site_log(tip_partials, pmats, topo: Topology, freqs, props, *,
                  B: int = 8, interpret: bool = False):
    """Per-pattern site log-likelihoods [P] via the wide HBM-staged kernel.

    Differentiable w.r.t. pmats/freqs/props (tips are constants, documented
    with an explicit stop_gradient). States pad to a multiple of 8 with
    zero states — exact (see module docstring)."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    if int(topo.child_count.max()) != 2:
        raise ValueError("pallas-wide requires a binary topology (the "
                         "no-mask dataflow assumes every real node has "
                         "exactly 2 children)")
    if S % 8:
        Sp = -(-S // 8) * 8
        pmats = jnp.pad(pmats, ((0, 0), (0, 0), (0, Sp - S), (0, Sp - S)))
        tip_partials = jnp.pad(tip_partials,
                               ((0, 0), (0, Sp - S), (0, 0)))
        freqs = jnp.pad(freqs, (0, Sp - S))
        S = Sp
    G = wide_groups(C, S, B)
    sched = staged_schedule(topo, B)
    blockP = build_group_pmats(pmats, sched, C, S, B, G)
    rootw = (props[:, None] * freqs[None, :]).reshape(1, C * S)
    tips = jax.lax.stop_gradient(tip_partials)
    return _wide_site_log(topo, C, B, G, interpret, S, tips,
                          blockP.astype(tips.dtype),
                          rootw.astype(tips.dtype))


def wide_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                             props, weights, *, rescale: bool = True,
                             B: int = 8, interpret: bool = False):
    """(logL, site_log) via the wide kernel. ``rescale`` accepted for
    engine-API compatibility; the kernel always rescales (exact)."""
    site_log = wide_site_log(tip_partials, pmats, topo, freqs, props,
                             B=B, interpret=interpret)
    return jnp.sum(weights * site_log), site_log


def vmem_estimate_wide(n_cat: int, n_states: int, *, B: int = 8,
                       maxc: int = 2, n_tiles: int = 64) -> int:
    """Bytes of VMEM the wide kernels need — O(R * TILE), tree-depth
    independent (the stage buffer lives in HBM)."""
    S = -(-n_states // 8) * 8
    CS = n_cat * S
    G = wide_groups(n_cat, S, B)
    Rg = G * CS
    BG = B // G
    Rb = B * CS
    R = maxc * Rb
    buffers = (R * TILE                      # in_buf / gout
               + B * CS * TILE               # obuf / gin
               + 2 * CS * TILE + TILE        # rbuf, zbuf, sbuf
               + n_tiles * TILE)             # scal_acc / inv_row
    blockP = 2 * maxc * BG * Rg * Rg         # double-buffered stream
    dblockP = 2 * maxc * BG * Rg * Rg        # backward accumulator block
    return (buffers + blockP + dblockP + 2 * R * TILE) * 4
