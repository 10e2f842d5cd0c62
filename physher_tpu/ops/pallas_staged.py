"""Staged block-diagonal Pallas pruning kernel (TPU).

Third-generation engine for the Felsenstein pruning hot loop (reference:
src/phyc/treelikelihood4.c update_partials / treelikelihood.c:1454-1735).
Design deltas vs ops/pallas_pruning_loop.py (the loop kernel):

- **Batched MXU steps**: each step computes B internal nodes as ONE
  [Rb, Rb] @ [Rb, TILE] dot per child index, where Rb = B*C*S and the left
  matrix is block-diagonal with the children's per-category P matrices.
  The loop kernel issued maxc*C tiny [S,S]@[S,TILE] dots per node; at
  S=4 the MXU is issue-rate-bound, so batching nodes+categories into one
  dot is ~2x end-to-end (measured on v5e).
- **Staged dataflow**: a node's output is written directly into the input
  row-block of its consumer's step ("staging"), so every step reads one
  contiguous [R, TILE] slab — no gather.
- **2-D grid (tiles, steps)**: the step dimension is a grid axis, so the
  per-step block-diagonal P matrices stream HBM->VMEM with automatic
  double buffering instead of keeping all steps resident.
- **Remat-free backward**: the VJP forward writes the stage buffer (the
  rescaled partials of every node, already laid out per consumer slot) to
  HBM; the backward reads it back instead of recomputing the forward
  sweep in VMEM. The spill costs 2x[~n_steps*R*P*4] bytes of HBM traffic
  (~0.8 ms for the 128-taxa benchmark) vs ~1.6 ms of recompute.

Gradient math is the reference's O(N) upper-partials sweep
(treelikelihood.c:2129-3100) expressed as cotangents of the staged values;
the custom VJP is defined on (tips, blockP, rootw) so the (pmats ->
blockP, freqs/props -> rootw) maps stay ordinary differentiable JAX and
d pmats / d freqs / d props fall out of autodiff transposition.

Rescaling divides each node's partials by their per-pattern max
(exact in the final log; the backward treats the max as locally constant,
as the reference does implicitly via its scaled coordinates).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology

TILE = 256

# Mosaic lowers f32 jnp.dot at DEFAULT precision to a single bf16 MXU pass
# (measured 1.5e-3 relative error; ~54 logP units on the fluA time tree —
# the true source of the round-3 "vmap miscompute"). HIGHEST = 6-pass
# bf16 expansion, true-f32 accurate (2.4e-7), near-identical latency on
# the bandwidth-bound pruning shapes.
_MXU_PRECISION = jax.lax.Precision.HIGHEST


def staged_schedule(topo: Topology, B: int):
    """Pack internal nodes into steps of B (level-scheduled: nodes of one
    level are mutually independent and all their children live in strictly
    earlier steps or are tips) and assign every node its consumer slot.

    Returns numpy arrays:
      n_steps
      node_step[k], node_pos[k] : step and position (0..B-1) of internal k
      cons_step[n], cons_slot[n]: consumer step/slot of node id n (root ->
                                  virtual step n_steps, slot 0)
      child_id[s, B*maxc]       : node id feeding each slot (-1 = none)
    """
    I, T, maxc = topo.I, topo.T, int(topo.child_count.max())
    node_step = np.zeros(I, dtype=np.int64)
    node_pos = np.zeros(I, dtype=np.int64)
    cur = 0
    for ranks in topo.levels:
        for i, k in enumerate(ranks):
            node_step[k] = cur + i // B
            node_pos[k] = i % B
        cur += (len(ranks) + B - 1) // B
    n_steps = cur
    cons_step = np.full(topo.N, n_steps, dtype=np.int32)
    cons_slot = np.zeros(topo.N, dtype=np.int32)
    child_id = np.full((n_steps, B * maxc), -1, dtype=np.int32)
    for k in range(I):
        s, b = node_step[k], node_pos[k]
        for j in range(int(topo.child_count[k])):
            ch = int(topo.children[k, j])
            slot = j * B + b
            cons_step[ch] = s
            cons_slot[ch] = slot
            child_id[s, slot] = ch
    return dict(n_steps=n_steps, node_step=node_step.astype(np.int32),
                node_pos=node_pos.astype(np.int32),
                cons_step=cons_step.astype(np.int32),
                cons_slot=cons_slot.astype(np.int32), child_id=child_id,
                maxc=maxc)


def build_block_pmats(pmats, sched, C, S, B, dtype=None):
    """[n_steps, maxc, Rb, Rb] block-diagonal step matrices from
    pmats [N, C, S, S].

    Built scatter-free: gather the children's P matrices, then place each
    [S, S] block on the diagonal with a static one-hot placement tensor via
    einsum — XLA lowers both to dense MXU work, and the VJP transposes to
    einsums (a scatter here would transpose to a serial scatter-add on the
    gradient hot path)."""
    maxc = sched["maxc"]
    n_steps = sched["n_steps"]
    CS = C * S
    Rb = B * CS
    dt = dtype or pmats.dtype
    child = sched["child_id"].reshape(n_steps, maxc, B)   # slot = j*B + b
    csafe = np.maximum(child, 0)
    pmg = pmats[csafe]                                    # [s, m, B, C, S, S]
    pmg = pmg * jnp.asarray(child >= 0, pmg.dtype)[..., None, None, None]
    # row index b*CS + c*S + i is exactly the row-major flatten of (b, c, i),
    # so only the COLUMN placement needs the per-block shift: pad block g's
    # columns from S to Rb at offset g*S, then reshape. Layout ops only —
    # the VJP is slices, not a scatter-add.
    G = B * C
    pmg = pmg.reshape(n_steps, maxc, G, S, S).astype(dt)
    cols = [jnp.pad(pmg[:, :, g], ((0, 0), (0, 0), (0, 0),
                                   (g * S, Rb - (g + 1) * S)))
            for g in range(G)]
    return jnp.stack(cols, axis=2).reshape(n_steps, maxc, Rb, Rb)


def _plan(topo: Topology, C: int, S: int, B: int):
    sched = staged_schedule(topo, B)
    maxc, n_steps = sched["maxc"], sched["n_steps"]
    CS = C * S
    Rb = B * CS
    R = maxc * Rb
    T = topo.T

    tipcons = np.stack([sched["cons_step"][:T],
                        sched["cons_slot"][:T] * CS], axis=1).astype(np.int32)
    # default consumer = scratch slot (virtual step n_steps, just after the
    # root rows) so unfilled node positions never clobber live data
    nodecons = np.full((n_steps, B, 2), (n_steps, CS), np.int32)
    for k in range(topo.I):
        s, b = sched["node_step"][k], sched["node_pos"][k]
        n = topo.T + k
        nodecons[s, b, 0] = sched["cons_step"][n]
        nodecons[s, b, 1] = sched["cons_slot"][n] * CS
    validf = np.zeros((n_steps, R), np.float32)
    for s in range(n_steps):
        for sl in range(B * maxc):
            if sched["child_id"][s, sl] >= 0:
                validf[s, sl * CS:(sl + 1) * CS] = 1.0
    # rows never written by any producer (dummy child slots): must be zeroed
    # once per tile — uninitialized VMEM garbage (possibly NaN) times the
    # zero block in the dot would poison the masked lanes
    zrows = [(s, sl * CS) for s in range(n_steps)
             for sl in range(B * maxc) if sched["child_id"][s, sl] < 0]
    zrows = np.asarray(zrows if zrows else [(0, 0)], np.int32)
    return sched, dict(maxc=maxc, n_steps=n_steps, CS=CS, Rb=Rb, R=R, T=T,
                       tipcons=tipcons, nodecons=nodecons, validf=validf,
                       zrows=zrows, n_zero=len(zrows))


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(C, S, B, maxc, n_steps, T, n_zero, spill,
                tipcons_ref, nodecons_ref, zrows_ref,
                valid_ref, tips_ref, blockP_ref, rootw_ref,
                *refs):
    from jax.experimental import pallas as pl

    if spill:
        site_log_ref, stage, minv_ref, scal_acc = refs
    else:
        site_log_ref, stage, scal_acc = refs
        minv_ref = None
    f32 = tips_ref.dtype
    CS = C * S
    Rb = B * CS
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
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

    res = None
    for j in range(maxc):
        stacked = stage[s, pl.ds(j * Rb, Rb)]              # [Rb, TILE]
        contrib = jnp.dot(blockP_ref[0, j], stacked,
                          preferred_element_type=f32,
                          precision=_MXU_PRECISION)
        v = valid_ref[0, 0][:, None][j * Rb:(j + 1) * Rb]  # [Rb, 1]
        contrib = contrib * v + (1.0 - v)
        res = contrib if res is None else res * contrib    # [Rb, TILE]
    logm_sum = None
    for b in range(B):
        rb = res[b * CS:(b + 1) * CS]
        m = jnp.max(rb, axis=0, keepdims=True)             # [1, TILE]
        m = jnp.maximum(m, jnp.finfo(f32).tiny)
        rb = rb / m
        lm = jnp.log(m)
        logm_sum = lm if logm_sum is None else logm_sum + lm
        if minv_ref is not None:
            minv_ref[0, b] = (1.0 / m)[0]
        ps = nodecons_ref[s, b, 0]
        pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
        stage[ps, pl.ds(pr, CS)] = rb
    scal_acc[:, :] = scal_acc[:, :] + logm_sum

    @pl.when(s == n_steps - 1)
    def _root():
        rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, TILE]
        site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
        site = jnp.maximum(site, jnp.finfo(f32).tiny)
        site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_staged_forward(topo: Topology, C: int, S: int, P: int, *,
                         B: int = 8, spill: bool = False,
                         interpret: bool = False, dtype=jnp.float32):
    """Returns fn(tips [T,S,P], blockP [n_steps,maxc,Rb,Rb], rootw [1,CS])
    -> site_log [P] (spill=False) or (site_log, stage, minv) (spill=True).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R, T = (pn["maxc"], pn["n_steps"], pn["CS"],
                                   pn["Rb"], pn["R"], pn["T"])
    n_tiles = P // TILE

    kernel = partial(_fwd_kernel, C, S, B, maxc, n_steps, T, pn["n_zero"],
                     spill)

    out_shape = [jax.ShapeDtypeStruct((1, P), dtype)]
    out_specs = [pl.BlockSpec((1, TILE), lambda t, s, *_: (0, t))]
    scratch = [pltpu.VMEM((1, TILE), dtype)]
    if spill:
        # the stage buffer doubles as an output (written in place, flushed
        # once per tile) so the backward can skip the forward recompute
        out_shape.append(
            jax.ShapeDtypeStruct((n_steps + 1, R, P), dtype))
        out_specs.append(
            pl.BlockSpec((n_steps + 1, R, TILE), lambda t, s, *_: (0, 0, t)))
        out_shape.append(jax.ShapeDtypeStruct((n_steps, B, P), dtype))
        out_specs.append(pl.BlockSpec((1, B, TILE),
                                      lambda t, s, *_: (s, 0, t)))
    else:
        scratch.insert(0, pltpu.VMEM((n_steps + 1, R, TILE), dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # tipcons, nodecons, zrows
        grid=(n_tiles, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda t, s, *_: (s, 0, 0)),
            pl.BlockSpec((T, S, TILE), lambda t, s, *_: (0, 0, t)),
            pl.BlockSpec((1, maxc, Rb, Rb), lambda t, s, *_: (s, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, s, *_: (0, 0)),
        ],
        out_specs=out_specs if spill else out_specs[0],
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if spill else out_shape[0],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    def fn(tips, blockP, rootw):
        # constants are materialized INSIDE fn: fn is re-traced by the
        # sequential_vmap batching rule, and closure jnp constants created
        # in an enclosing jit trace leak as foreign tracers there
        out = call(jnp.asarray(pn["tipcons"]), jnp.asarray(pn["nodecons"]),
                   jnp.asarray(pn["zrows"]),
                   jnp.asarray(pn["validf"][:, None, :], dtype),
                   tips, blockP, rootw)
        if spill:
            site, stage, minv = out
            return site[0], stage, minv
        return out[0]

    return fn, sched


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(C, S, B, maxc, n_steps, rescale_unused,
                nodecons_ref, valid_ref, stage_ref, root_stage_ref,
                blockP_ref, minv_ref, rootw_ref, g_ref,
                dblockP_ref, drootw_ref, gbuf, inv_row):
    from jax.experimental import pallas as pl

    f32 = stage_ref.dtype
    CS = C * S
    Rb = B * CS
    sr = pl.program_id(1)                 # 0 .. n_steps-1 (reversed)
    s = n_steps - 1 - sr

    @pl.when((pl.program_id(0) == 0) & (sr == 0))
    def _init_out():
        dblockP_ref[...] = jnp.zeros_like(dblockP_ref[...])
        drootw_ref[...] = jnp.zeros_like(drootw_ref[...])

    @pl.when(sr == 0)
    def _root():
        gbuf[...] = jnp.zeros_like(gbuf[...])
        rp = root_stage_ref[0, pl.ds(0, CS)]               # [CS, TILE]
        site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
        site = jnp.maximum(site, jnp.finfo(f32).tiny)
        inv = g_ref[0, :] / site                           # [TILE]
        inv_row[0, :] = inv
        gbuf[n_steps, pl.ds(0, CS)] = rootw_ref[0][:, None] * inv[None, :]
        drootw_ref[0, :] = drootw_ref[0, :] + jnp.sum(
            rp * inv[None, :], axis=1)

    # gather this step's node cotangents in raw (pre-rescale) coordinates
    g_raw_rows = []
    for b in range(B):
        ps = nodecons_ref[s, b, 0]
        pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
        gn = gbuf[ps, pl.ds(pr, CS)]                       # [CS, TILE]
        g_raw_rows.append(gn * minv_ref[0, b][None, :])
    g_raw = jnp.concatenate(g_raw_rows, axis=0)            # [Rb, TILE]

    contribs, stacks, vs = [], [], []
    for j in range(maxc):
        stacked = stage_ref[0, pl.ds(j * Rb, Rb)]          # [Rb, TILE]
        contrib = jnp.dot(blockP_ref[0, j], stacked,
                          preferred_element_type=f32,
                          precision=_MXU_PRECISION)
        v = valid_ref[0, 0][:, None][j * Rb:(j + 1) * Rb]
        contribs.append(contrib * v + (1.0 - v))
        stacks.append(stacked)
        vs.append(v)

    for i in range(maxc):
        other = g_raw * vs[i]
        for j in range(maxc):
            if j != i:
                other = other * contribs[j]                # [Rb, TILE]
        dbp = jax.lax.dot_general(
            other, stacks[i], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_MXU_PRECISION)                    # [Rb, Rb]
        dblockP_ref[s, i] = dblockP_ref[s, i] + dbp
        gch = jax.lax.dot_general(
            blockP_ref[0, i], other, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_MXU_PRECISION)                    # [Rb, TILE]
        gbuf[s, pl.ds(i * Rb, Rb)] = gch


def build_staged_backward(topo: Topology, C: int, S: int, P: int, *,
                          B: int = 8, interpret: bool = False,
                          dtype=jnp.float32):
    """Returns fn(stage, minv, blockP, rootw, g) -> (dblockP, drootw)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched, pn = _plan(topo, C, S, B)
    maxc, n_steps, CS, Rb, R = (pn["maxc"], pn["n_steps"], pn["CS"],
                                pn["Rb"], pn["R"])
    n_tiles = P // TILE

    kernel = partial(_bwd_kernel, C, S, B, maxc, n_steps, False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # nodecons
        grid=(n_tiles, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, R),
                         lambda t, sr, *_: (n_steps - 1 - sr, 0, 0)),
            pl.BlockSpec((1, R, TILE),
                         lambda t, sr, *_: (n_steps - 1 - sr, 0, t)),
            pl.BlockSpec((1, R, TILE), lambda t, sr, *_: (n_steps, 0, t)),
            pl.BlockSpec((1, maxc, Rb, Rb),
                         lambda t, sr, *_: (n_steps - 1 - sr, 0, 0, 0)),
            pl.BlockSpec((1, B, TILE),
                         lambda t, sr, *_: (n_steps - 1 - sr, 0, t)),
            pl.BlockSpec((1, CS), lambda t, sr, *_: (0, 0)),
            pl.BlockSpec((1, TILE), lambda t, sr, *_: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((n_steps, maxc, Rb, Rb),
                         lambda t, sr, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda t, sr, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, TILE), dtype),
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
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    def fn(stage, minv, blockP, rootw, g):
        # constants inside fn: see build_staged_forward
        dblockP, drootw = call(jnp.asarray(pn["nodecons"]),
                               jnp.asarray(pn["validf"][:, None, :], dtype),
                               stage, stage, blockP,
                               minv, rootw, g.reshape(1, P))
        return dblockP, drootw[0]

    return fn, sched


# --------------------------------------------------------------------------
# custom-VJP wrapper + public API
# --------------------------------------------------------------------------


# the raw pallas calls are wrapped in sequential_vmap: vmap of a
# scalar-prefetch pallas_call silently miscomputes on TPU, so any batching
# that reaches this kernel (the fused engine handles the common batched
# shapes natively) lowers to a correct per-element loop instead
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _staged_site_log(topo: Topology, C: int, B: int, interpret: bool,
                     S: int, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_staged_forward(topo, C, S, P, B=B, interpret=interpret,
                                 dtype=tips.dtype)
    return jax.custom_batching.sequential_vmap(fn)(tips, blockP, rootw)


def _staged_fwd(topo, C, B, interpret, S, tips, blockP, rootw):
    P = tips.shape[-1]
    fn, _ = build_staged_forward(topo, C, S, P, B=B, spill=True,
                                 interpret=interpret, dtype=tips.dtype)
    site, stage, minv = jax.custom_batching.sequential_vmap(fn)(
        tips, blockP, rootw)
    return site, (stage, minv, blockP, rootw)


def _staged_bwd(topo, C, B, interpret, S, residuals, g):
    stage, minv, blockP, rootw = residuals
    P = stage.shape[-1]
    fn, _ = build_staged_backward(topo, C, S, P, B=B, interpret=interpret,
                                  dtype=stage.dtype)
    dblockP, drootw = jax.custom_batching.sequential_vmap(fn)(
        stage, minv, blockP, rootw, g)
    dtips = None  # tips are stop_gradient'ed by the caller
    return (jnp.zeros((topo.T, S, P), stage.dtype), dblockP,
            drootw.reshape(1, -1))


_staged_site_log.defvjp(_staged_fwd, _staged_bwd)


def staged_site_log(tip_partials, pmats, topo: Topology, freqs, props, *,
                    B: int = 8, interpret: bool = False):
    """Per-pattern site log-likelihoods [P] via the staged kernel.

    Differentiable w.r.t. pmats/freqs/props: the kernel VJP produces the
    blockP and root-weight cotangents; the (pmats -> blockP) scatter and
    (props x freqs -> rootw) outer product transpose back via autodiff.
    Tip-partial cotangents are NOT produced (tips are constants in every
    framework use; an explicit stop_gradient documents this).
    """
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    # stage rows are CS-tall at offsets that are multiples of CS; Mosaic
    # vector stores need 8-sublane alignment, so pad the category axis with
    # zero-weight copies until C*S is a multiple of 8 (e.g. JC69 C=1, S=4).
    # Exact: props=0 kills the padded category at the root and transposes to
    # zero cotangents.
    if (C * S) % 8:
        C2 = C
        while (C2 * S) % 8:
            C2 += 1
        reps = C2 - C
        pmats = jnp.concatenate(
            [pmats, jnp.repeat(pmats[:, -1:], reps, axis=1)], axis=1)
        props = jnp.concatenate(
            [props, jnp.zeros(reps, props.dtype)])
        C = C2
    sched = staged_schedule(topo, B)
    blockP = build_block_pmats(pmats, sched, C, S, B)
    rootw = (props[:, None] * freqs[None, :]).reshape(1, C * S)
    tips = jax.lax.stop_gradient(tip_partials)
    return _staged_site_log(topo, C, B, interpret, S, tips,
                            blockP.astype(tips.dtype),
                            rootw.astype(tips.dtype))


def staged_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                               props, weights, *, rescale: bool = True,
                               B: int = 8, interpret: bool = False):
    """(logL, site_log) via the staged kernel. ``rescale`` is accepted for
    engine-API compatibility; the kernel always rescales (exact)."""
    site_log = staged_site_log(tip_partials, pmats, topo, freqs, props,
                               B=B, interpret=interpret)
    return jnp.sum(weights * site_log), site_log


def staged_n_steps(topo: Topology, B: int = 8) -> int:
    """Exact step count of staged_schedule: levels pack independently, so
    ladder/caterpillar trees (1-2 nodes per level) cost ~one step per level,
    not ceil(I/B) — the VMEM gate must use this, not a node-count estimate."""
    return sum(-(-len(r) // B) for r in topo.levels)


def vmem_estimate_staged(n_nodes: int, n_cat: int, n_states: int,
                         B: int = 8, maxc: int = 2,
                         backward: bool = True, n_steps: int = None) -> int:
    """Bytes of VMEM the staged kernels need per pattern tile (f32).

    Pass ``n_steps=staged_n_steps(topo, B)`` for the exact stage-buffer
    size; the node-count fallback underestimates ladder topologies ~8x.
    """
    CS = n_cat * n_states
    Rb = B * CS
    R = maxc * Rb
    if n_steps is None:
        I = (n_nodes - 1) // 2 if maxc == 2 else n_nodes
        n_steps = -(-max(I, 1) // B) + 8  # level-packing slack
    stage = (n_steps + 1) * R * TILE * 4
    blockP = 2 * maxc * Rb * Rb * 4          # double-buffered stream
    if not backward:
        return stage + blockP + TILE * 4
    dblockP = n_steps * maxc * Rb * Rb * 4   # resident output accumulator
    stream = 3 * R * TILE * 4                # stage slab + root slab
    return stage + blockP + dblockP + stream + (B + 2) * TILE * 4
