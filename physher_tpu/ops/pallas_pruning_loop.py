"""Loop-based Pallas pruning kernel: O(1)-size program, any tree size.

Variant of ops/pallas_pruning.py (same math, same VMEM-resident design)
whose postorder sweep is a ``fori_loop`` over node *blocks* with the
topology delivered as scalar-prefetch index arrays, instead of a fully
unrolled static schedule. Compile time is O(block_size) rather than O(N)
— the unrolled kernel costs minutes of Mosaic compile for ~100-node trees
(measured 302 s for 31 nodes on v5e); this one compiles in seconds and
reuses one program for every iteration.

Reference: the same C hot path (src/phyc/treelikelihood4.c update_partials,
treelikelihood.c:1454-1735). Gradients: ``loop_site_log`` carries a custom
VJP whose backward pass is a second loop kernel that REMATERIALIZES the
forward sweep in VMEM and then runs the mirrored preorder (upper-partials)
sweep — the reference's O(N) analytic gradient (treelikelihood.c:2129-3100)
with zero HBM residual traffic: nothing but the inputs and the [N,C,S,S]
P-matrix cotangents ever leaves the chip's VMEM. Recomputing the forward
costs ~half the backward FLOPs but saves writing+reading the [N,C,S,P]
partials tensor through HBM, which is the actual bottleneck.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology

TILE = 128

# Mosaic lowers f32 jnp.dot at DEFAULT precision to a single bf16 MXU pass
# (measured 1.5e-3 relative error; ~54 logP units on the fluA time tree —
# the true source of the round-3 "vmap miscompute"). HIGHEST = 6-pass
# bf16 expansion, true-f32 accurate (2.4e-7), near-identical latency on
# the bandwidth-bound pruning shapes.
_MXU_PRECISION = jax.lax.Precision.HIGHEST


def _schedule(topo: Topology, block: int):
    """Flat postorder schedule padded to blocks.

    Returns (nodes [B*block], children [B*block, maxc]) int32, with -1
    padding; dummy entries use node id N (an extra scratch row)."""
    nodes, childs = [], []
    maxc = int(topo.child_count.max())
    for k in range(topo.I):
        nodes.append(topo.T + k)
        ch = list(topo.children[k, : topo.child_count[k]])
        childs.append(ch + [-1] * (maxc - len(ch)))
    while len(nodes) % block:
        nodes.append(topo.N)            # dummy slot
        childs.append([-1] * maxc)
    return (np.asarray(nodes, dtype=np.int32),
            np.asarray(childs, dtype=np.int32))


def _kernel(C, S, block, maxc, rescale, n_steps,
            nodes_ref, childs_ref, root_ref, tips_ref, pmats_ref,
            freqs_ref, props_ref, site_log_ref, buf, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    T = tips_ref.shape[0]

    # tips: broadcast across categories into the working buffer
    def init_tip(t, _):
        tp = tips_ref[pl.ds(t, 1)]                     # [1, S, TILE]
        buf[pl.ds(t, 1)] = jnp.broadcast_to(tp[:, None], (1, C, S, TILE))
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), init_tip, jnp.int32(0))
    scal_acc[0, :] = jnp.zeros((TILE,), f32)

    def step(b, _):
        for j in range(block):
            idx = b * block + j
            node = nodes_ref[idx]
            res = jnp.ones((C, S, TILE), f32)
            for ci in range(maxc):
                child = childs_ref[idx, ci]
                csafe = jnp.maximum(child, 0)
                pm = pmats_ref[pl.ds(csafe, 1)][0]     # [C, S, S]
                cp = buf[pl.ds(csafe, 1)][0]           # [C, S, TILE]
                contrib = jnp.stack([
                    jnp.dot(pm[c], cp[c], preferred_element_type=f32,
                          precision=_MXU_PRECISION)
                    for c in range(C)
                ])
                valid = (child >= 0).astype(f32)
                contrib = contrib * valid + (1.0 - valid)
                res = res * contrib
            if rescale:
                # dummy slots have all-ones res => m == 1, log m == 0
                m = jnp.max(res, axis=(0, 1))
                m = jnp.maximum(m, jnp.finfo(f32).tiny)
                res = res / m[None, None, :]
                scal_acc[0, :] = scal_acc[0, :] + jnp.log(m)
            buf[pl.ds(node, 1)] = res[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, jnp.int32(0))

    root = root_ref[0]
    rp = buf[pl.ds(root, 1)][0]                        # [C, S, TILE]
    site = None
    for c in range(C):
        per_cat = jnp.dot(freqs_ref[:], rp[c],
                          preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
        term = props_ref[0, c] * per_cat
        site = term if site is None else site + term
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_loop_forward(topo: Topology, C: int, S: int, P: int, *,
                       rescale: bool = True, block: int = 4,
                       interpret: bool = False, dtype=jnp.float32):
    """Returns fn(tip_partials [T,S,P], pmats [N,C,S,S], freqs, props)
    -> site_log [P]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, T = topo.N, topo.T
    nodes, childs = _schedule(topo, block)
    n_steps = len(nodes) // block
    maxc = childs.shape[1]
    n_tiles = P // TILE
    root = np.asarray([topo.N - 1], dtype=np.int32)

    kernel = partial(_kernel, C, S, block, maxc, rescale, n_steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # nodes, childs, root
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, S, TILE), lambda p, *_: (0, 0, p)),
            pl.BlockSpec((N + 1, C, S, S), lambda p, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, S), lambda p, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda p, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda p, *_: (0, p)),
        scratch_shapes=[
            pltpu.VMEM((N + 1, C, S, TILE), dtype),
            pltpu.VMEM((1, TILE), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, P), dtype),
        interpret=interpret,
    )

    def fn(tip_partials, pmats, freqs, props):
        # scalar-prefetch constants materialized INSIDE fn: fn is re-traced
        # by the sequential_vmap batching rule, and closure jnp constants
        # created in an enclosing jit trace leak as foreign tracers there
        # one extra pmats row for the dummy slot
        pmats_pad = jnp.concatenate(
            [pmats, jnp.zeros((1,) + pmats.shape[1:], pmats.dtype)], axis=0)
        out = call(jnp.asarray(nodes), jnp.asarray(childs),
                   jnp.asarray(root), tip_partials, pmats_pad,
                   freqs.reshape(1, S), props.reshape(1, C))
        return out[0]

    return fn


def _backward_kernel(C, S, block, maxc, rescale, n_steps, T,
                     nodes_ref, childs_ref, root_ref, tips_ref, pmats_ref,
                     g_ref, freqs_ref, props_ref,
                     dpmats_ref, dfreqs_ref, dprops_ref,
                     buf, gbuf, minv_buf):
    """Rematerialized forward + mirrored preorder sweep, loop-based.

    Math identical to ops/pallas_pruning.py:_backward_kernel; topology comes
    in as scalar-prefetched (nodes, childs) block schedule with -1 padding
    for missing children and node id N for dummy slots (row N of the VMEM
    buffers is scratch).
    """
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dpmats_ref[...] = jnp.zeros_like(dpmats_ref[...])
        dfreqs_ref[...] = jnp.zeros_like(dfreqs_ref[...])
        dprops_ref[...] = jnp.zeros_like(dprops_ref[...])

    # ---- forward recompute (same rescaling decisions as the forward) ----
    def init_tip(t, _):
        tp = tips_ref[pl.ds(t, 1)]                     # [1, S, TILE]
        buf[pl.ds(t, 1)] = jnp.broadcast_to(tp[:, None], (1, C, S, TILE))
        minv_buf[pl.ds(t, 1)] = jnp.ones((1, TILE), f32)
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), init_tip, jnp.int32(0))
    gbuf[...] = jnp.zeros_like(gbuf[...])

    def fstep(b, _):
        for j in range(block):
            idx = b * block + j
            node = nodes_ref[idx]
            res = jnp.ones((C, S, TILE), f32)
            for ci in range(maxc):
                child = childs_ref[idx, ci]
                csafe = jnp.maximum(child, 0)
                pm = pmats_ref[pl.ds(csafe, 1)][0]
                cp = buf[pl.ds(csafe, 1)][0]
                contrib = jnp.stack([
                    jnp.dot(pm[c], cp[c], preferred_element_type=f32,
                          precision=_MXU_PRECISION)
                    for c in range(C)
                ])
                valid = (child >= 0).astype(f32)
                contrib = contrib * valid + (1.0 - valid)
                res = res * contrib
            if rescale:
                m = jnp.max(res, axis=(0, 1))
                m = jnp.maximum(m, jnp.finfo(f32).tiny)
                res = res / m[None, None, :]
                minv_buf[pl.ds(node, 1)] = (1.0 / m)[None]
            else:
                minv_buf[pl.ds(node, 1)] = jnp.ones((1, TILE), f32)
            buf[pl.ds(node, 1)] = res[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), fstep, jnp.int32(0))

    # ---- root cotangent (scaled coordinates) ----
    root = root_ref[0]
    rp = buf[pl.ds(root, 1)][0]                        # [C, S, TILE]
    site = None
    per_cat = []
    for c in range(C):
        pc = jnp.dot(freqs_ref[:], rp[c], preferred_element_type=f32,
                          precision=_MXU_PRECISION)[0]
        per_cat.append(pc)                             # [TILE]
        term = props_ref[0, c] * pc
        site = term if site is None else site + term
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    inv = g_ref[0, :] / site                           # [TILE]

    g_root = jnp.stack([
        props_ref[0, c] * freqs_ref[0][:, None] * inv[None, :]
        for c in range(C)
    ])                                                 # [C, S, TILE]
    gbuf[pl.ds(root, 1)] = g_root[None]

    dfr = None
    for c in range(C):
        t = props_ref[0, c] * jnp.sum(rp[c] * inv[None, :], axis=1)  # [S]
        dfr = t if dfr is None else dfr + t
    dfreqs_ref[0, :] = dfreqs_ref[0, :] + dfr
    dpr = jnp.stack([jnp.sum(per_cat[c] * inv) for c in range(C)])
    dprops_ref[0, :] = dprops_ref[0, :] + dpr

    # ---- reverse sweep ----
    def bstep(r, _):
        b = n_steps - 1 - r
        for jj in range(block):
            idx = b * block + (block - 1 - jj)
            node = nodes_ref[idx]
            minv = minv_buf[pl.ds(node, 1)][0]         # [TILE]
            gn = gbuf[pl.ds(node, 1)][0]               # [C, S, TILE]
            g_raw = gn * minv[None, None, :]
            contribs, pms, cps, valids = [], [], [], []
            for ci in range(maxc):
                child = childs_ref[idx, ci]
                csafe = jnp.maximum(child, 0)
                pm = pmats_ref[pl.ds(csafe, 1)][0]
                cp = buf[pl.ds(csafe, 1)][0]
                contrib = jnp.stack([
                    jnp.dot(pm[c], cp[c], preferred_element_type=f32,
                          precision=_MXU_PRECISION)
                    for c in range(C)
                ])
                valid = (child >= 0).astype(f32)
                contribs.append(contrib * valid + (1.0 - valid))
                pms.append(pm)
                cps.append(cp)
                valids.append(valid)
            for i in range(maxc):
                child = childs_ref[idx, i]
                csafe = jnp.maximum(child, 0)
                other = g_raw * valids[i]
                for j in range(maxc):
                    if j != i:
                        other = other * contribs[j]
                dpm = jnp.stack([
                    jnp.dot(other[c], cps[i][c].T, preferred_element_type=f32,
                          precision=_MXU_PRECISION)
                    for c in range(C)
                ])                                     # [C, S, S]
                cur = dpmats_ref[pl.ds(csafe, 1)]
                dpmats_ref[pl.ds(csafe, 1)] = cur + dpm[None]
                gch = jnp.stack([
                    jnp.dot(pms[i][c].T, other[c], preferred_element_type=f32,
                          precision=_MXU_PRECISION)
                    for c in range(C)
                ])
                gbuf[pl.ds(csafe, 1)] = gch[None]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), bstep, jnp.int32(0))


def build_loop_backward(topo: Topology, C: int, S: int, P: int, *,
                        rescale: bool = True, block: int = 4,
                        interpret: bool = False, dtype=jnp.float32):
    """Returns fn(tips, pmats_pad [N+1,...], g [P], freqs, props) ->
    (dpmats_pad [N+1,C,S,S], dfreqs [S], dprops [C])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, T = topo.N, topo.T
    nodes, childs = _schedule(topo, block)
    n_steps = len(nodes) // block
    maxc = childs.shape[1]
    n_tiles = P // TILE
    root = np.asarray([topo.N - 1], dtype=np.int32)

    kernel = partial(_backward_kernel, C, S, block, maxc, rescale,
                     n_steps, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, S, TILE), lambda p, *_: (0, 0, p)),
            pl.BlockSpec((N + 1, C, S, S), lambda p, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, TILE), lambda p, *_: (0, p)),
            pl.BlockSpec((1, S), lambda p, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda p, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((N + 1, C, S, S), lambda p, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, S), lambda p, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda p, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((N + 1, C, S, TILE), dtype),
            pltpu.VMEM((N + 1, C, S, TILE), dtype),
            pltpu.VMEM((N + 1, TILE), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, C, S, S), dtype),
            jax.ShapeDtypeStruct((1, S), dtype),
            jax.ShapeDtypeStruct((1, C), dtype),
        ],
        interpret=interpret,
    )

    def fn(tip_partials, pmats_pad, g, freqs, props):
        # constants inside fn: see build_loop_forward
        dpm, dfr, dpr = call(jnp.asarray(nodes), jnp.asarray(childs),
                             jnp.asarray(root), tip_partials,
                             pmats_pad, g.reshape(1, P),
                             freqs.reshape(1, S), props.reshape(1, C))
        return dpm, dfr[0], dpr[0]

    return fn


def vmem_estimate_loop(n_nodes: int, n_cat: int, n_states: int,
                       backward: bool = True, n_tips: int = None) -> int:
    """Bytes of VMEM the loop kernels need per pattern tile (f32)."""
    if n_tips is None:
        n_tips = (n_nodes + 1) // 2
    buf = (n_nodes + 1) * n_cat * n_states * TILE * 4
    pm = 2 * (n_nodes + 1) * n_cat * n_states * n_states * 4
    tips = n_tips * n_states * TILE * 4
    minv = (n_nodes + 1) * TILE * 4
    return (2 * buf + minv if backward else buf) + pm + tips


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def loop_site_log(topo: Topology, rescale: bool, block: int, interpret: bool,
                  tip_partials, pmats, freqs, props):
    """Per-pattern site log-likelihoods [P] via the loop kernel, with an
    analytic rematerializing backward kernel as custom VJP."""
    out, _ = _loop_fwd(topo, rescale, block, interpret,
                       tip_partials, pmats, freqs, props)
    return out


# sequential_vmap on the raw pallas calls: vmap of a scalar-prefetch
# pallas_call silently miscomputes on TPU; batching that reaches this
# kernel lowers to a correct per-element loop (the fused engine batches
# natively and covers the hot batched shapes)
def _loop_fwd(topo, rescale, block, interpret, tip_partials, pmats, freqs,
              props):
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    fn = build_loop_forward(topo, C, S, P, rescale=rescale, block=block,
                            interpret=interpret, dtype=tip_partials.dtype)
    site_log = jax.custom_batching.sequential_vmap(fn)(
        tip_partials, pmats, freqs, props)
    return site_log, (tip_partials, pmats, freqs, props)


def _loop_bwd(topo, rescale, block, interpret, residuals, g):
    tip_partials, pmats, freqs, props = residuals
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    bwd = build_loop_backward(topo, C, S, P, rescale=rescale, block=block,
                              interpret=interpret, dtype=tip_partials.dtype)
    pmats_pad = jnp.concatenate(
        [pmats, jnp.zeros((1,) + pmats.shape[1:], pmats.dtype)], axis=0)
    dpm_pad, dfreqs, dprops = jax.custom_batching.sequential_vmap(bwd)(
        tip_partials, pmats_pad, g, freqs, props)
    dtips = jnp.zeros_like(tip_partials)
    return dtips, dpm_pad[: topo.N], dfreqs, dprops


loop_site_log.defvjp(_loop_fwd, _loop_bwd)


def loop_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                             props, weights, *, rescale: bool = True,
                             block: int = 4, interpret: bool = False):
    """(logL, site_log) via the loop kernel, differentiable through the
    analytic backward kernel.

    Note: the backward kernel does NOT propagate cotangents to
    ``tip_partials`` (tips are constants in every framework use); the
    explicit stop_gradient makes that contract visible to direct callers.
    """
    tip_partials = jax.lax.stop_gradient(tip_partials)
    site_log = loop_site_log(topo, rescale, block, interpret,
                             tip_partials, pmats, freqs, props)
    return jnp.sum(weights * site_log), site_log
