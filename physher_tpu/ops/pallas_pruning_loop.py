"""Loop-based Pallas pruning kernel: O(1)-size program, any tree size.

Variant of ops/pallas_pruning.py (same math, same VMEM-resident design)
whose postorder sweep is a ``fori_loop`` over node *blocks* with the
topology delivered as scalar-prefetch index arrays, instead of a fully
unrolled static schedule. Compile time is O(block_size) rather than O(N)
— the unrolled kernel costs minutes of Mosaic compile for ~100-node trees
(measured 302 s for 31 nodes on v5e); this one compiles in seconds and
reuses one program for every iteration.

Reference: the same C hot path (src/phyc/treelikelihood4.c update_partials,
treelikelihood.c:1454-1735); gradient support comes from composing with the
unrolled kernel's custom VJP or plain autodiff via the XLA path — this
module provides the forward likelihood only (its primary consumer is
fixed-topology MCMC/VI inner loops where the same compiled program runs
millions of times).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology

TILE = 128


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
        return 0

    jax.lax.fori_loop(0, T, init_tip, 0)
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
                    jnp.dot(pm[c], cp[c], preferred_element_type=f32)
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
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)

    root = root_ref[0]
    rp = buf[pl.ds(root, 1)][0]                        # [C, S, TILE]
    site = None
    for c in range(C):
        per_cat = jnp.dot(freqs_ref[:], rp[c],
                          preferred_element_type=f32)[0]
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

    nodes_j = jnp.asarray(nodes)
    childs_j = jnp.asarray(childs)
    root_j = jnp.asarray(root)

    def fn(tip_partials, pmats, freqs, props):
        # one extra pmats row for the dummy slot
        pmats_pad = jnp.concatenate(
            [pmats, jnp.zeros((1,) + pmats.shape[1:], pmats.dtype)], axis=0)
        out = call(nodes_j, childs_j, root_j, tip_partials, pmats_pad,
                   freqs.reshape(1, S), props.reshape(1, C))
        return out[0]

    return fn


def loop_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                             props, weights, *, rescale: bool = True,
                             block: int = 4, interpret: bool = False):
    """(logL, site_log) via the loop kernel (forward only)."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    fn = build_loop_forward(topo, C, S, P, rescale=rescale, block=block,
                            interpret=interpret, dtype=tip_partials.dtype)
    site_log = fn(tip_partials, pmats, freqs, props)
    return jnp.sum(weights * site_log), site_log
