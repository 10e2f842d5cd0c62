"""Fused Pallas TPU kernel for the Felsenstein pruning likelihood.

The reference spends ~14.5 kLoC of SIMD C on this hot path (reference:
src/phyc/treelikelihood4.c / 20 / X / Codon update_partials + integrate +
node_log_likelihoods, orchestrated by src/phyc/treelikelihood.c:1454-1735,
with the O(N) analytic gradient machinery at treelikelihood.c:2129-3100).

TPU-native design
-----------------
Site patterns are conditionally independent, so the pattern axis tiles
perfectly: each grid program owns one 128-lane pattern tile and executes the
ENTIRE postorder sweep with every node's partials resident in VMEM — zero
HBM round-trips between levels (the pure-XLA path materializes each level).
The topology is static, so the node loop fully unrolls with constant
indices; per-category P@partials contractions are [S,S]x[S,128] dots on the
MXU/VPU with patterns as the lane dimension.

Rescaling is proactive per internal node: the per-pattern max is factored
into a running log accumulator (replacing the reference's reactive switch at
treelikelihood.c:1497-1520). Because the likelihood is multilinear in the
partials, treating the max as a stop-gradient constant keeps gradients
exact.

The backward pass is the mirrored preorder sweep (the reference's
upper-partials pass, treelikelihood.c:2129) as a second fused kernel: it
recomputes child contributions from the stored forward partials, accumulates
dL/dP per branch across sequential grid steps, and hands cotangents to the
P(t) construction outside, where JAX autodiff chains them to branch lengths,
substitution and clock parameters. Together the two kernels give the exact
analytic gradient in O(N) per pattern tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology

TILE = 128


def _postorder_internal(topo: Topology):
    """Static (node, children_list) schedule, postorder (children first)."""
    out = []
    for k in range(topo.I):
        node = topo.T + k
        ch = [int(c) for c in topo.children[k, : topo.child_count[k]]]
        out.append((node, ch))
    return out


def vmem_estimate(n_nodes: int, n_cat: int, n_states: int,
                  backward: bool = False) -> int:
    """Bytes of VMEM the kernel needs per pattern tile."""
    buf = n_nodes * n_cat * n_states * TILE * 4
    return buf * (3 if backward else 1)


# -- forward -----------------------------------------------------------------

def _forward_kernel(topo, C, S, rescale, tips_ref, pmats_ref, freqs_ref,
                    props_ref, site_log_ref, partials_ref, minv_ref,
                    scal_acc):
    T = topo.T
    f32 = partials_ref.dtype

    # tips: broadcast over categories
    for t in range(T):
        tp = tips_ref[t]                             # [S, TILE]
        for c in range(C):
            partials_ref[t, c] = tp
        minv_ref[t] = jnp.ones((TILE,), f32)

    scal_acc[0, :] = jnp.zeros((TILE,), f32)

    for node, children in _postorder_internal(topo):
        res = None
        for child in children:
            pm = pmats_ref[child]                    # [C, S, S]
            contrib = [
                jnp.dot(pm[c], partials_ref[child, c],
                        preferred_element_type=f32)
                for c in range(C)
            ]
            contrib = jnp.stack(contrib)             # [C, S, TILE]
            res = contrib if res is None else res * contrib
        if rescale:
            m = jnp.max(res, axis=(0, 1))            # [TILE]
            m = jnp.maximum(m, jnp.finfo(f32).tiny)
            minv = 1.0 / m
            res = res * minv[None, None, :]
            scal_acc[0, :] = scal_acc[0, :] + jnp.log(m)
            minv_ref[node] = minv
        else:
            minv_ref[node] = jnp.ones((TILE,), f32)
        for c in range(C):
            partials_ref[node, c] = res[c]

    root = topo.N - 1
    site = None
    for c in range(C):
        # [1, S] @ [S, TILE] (Mosaic needs >=2D operands)
        per_cat = jnp.dot(freqs_ref[:], partials_ref[root, c],
                          preferred_element_type=f32)[0]    # [TILE]
        term = props_ref[0, c] * per_cat
        site = term if site is None else site + term
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def _build_forward(topo: Topology, C: int, S: int, P: int, rescale: bool,
                   dtype, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = topo.N
    n_tiles = P // TILE
    kernel = partial(_forward_kernel, topo, C, S, rescale)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((topo.T, S, TILE), lambda p: (0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C, S, S), lambda p: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C, S, TILE), lambda p: (0, 0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TILE), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, P), dtype),
            jax.ShapeDtypeStruct((N, C, S, P), dtype),
            jax.ShapeDtypeStruct((N, P), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((1, TILE), dtype)],
        interpret=interpret,
    )


# -- backward ----------------------------------------------------------------

def _backward_kernel(topo, C, S, pmats_ref, partials_ref, minv_ref,
                     groot_ref, dpmats_ref, g_scratch):
    from jax.experimental import pallas as pl

    f32 = partials_ref.dtype
    root = topo.N - 1

    @pl.when(pl.program_id(0) == 0)
    def _():
        dpmats_ref[...] = jnp.zeros_like(dpmats_ref[...])

    for c in range(C):
        g_scratch[root, c] = groot_ref[c]

    for node, children in reversed(_postorder_internal(topo)):
        minv = minv_ref[node]                          # [TILE]
        g_raw = [g_scratch[node, c] * minv[None, :] for c in range(C)]
        contribs = []
        for child in children:
            pm = pmats_ref[child]
            contribs.append([
                jnp.dot(pm[c], partials_ref[child, c],
                        preferred_element_type=f32)
                for c in range(C)
            ])
        for i, child in enumerate(children):
            pm = pmats_ref[child]
            for c in range(C):
                other = g_raw[c]
                for j in range(len(children)):
                    if j != i:
                        other = other * contribs[j][c]
                # dL/dP_child[c] += other @ partials_child[c]^T
                dpm = jnp.dot(other, partials_ref[child, c].T,
                              preferred_element_type=f32)   # [S, S]
                dpmats_ref[child, c] += dpm
                # cotangent to the child partials: P^T @ other
                g_scratch[child, c] = jnp.dot(
                    pm[c].T, other, preferred_element_type=f32)


def _build_backward(topo: Topology, C: int, S: int, P: int, dtype,
                    interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = topo.N
    n_tiles = P // TILE
    kernel = partial(_backward_kernel, topo, C, S)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((N, C, S, S), lambda p: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C, S, TILE), lambda p: (0, 0, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TILE), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, S, TILE), lambda p: (0, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C, S, S), lambda p: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, S, S), dtype),
        scratch_shapes=[pltpu.VMEM((N, C, S, TILE), dtype)],
        interpret=interpret,
    )


# -- custom-vjp wrapper ------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def pallas_site_log(topo: Topology, rescale: bool, interpret: bool,
                    tip_partials, pmats, freqs, props):
    """Per-pattern site log-likelihoods [P] via the fused kernel.

    tip_partials [T, S, P] (P a multiple of 128, padded columns must be
    all-ones), pmats [N, C, S, S], freqs [S], props [C].
    """
    out, _ = _fwd(topo, rescale, interpret, tip_partials, pmats, freqs, props)
    return out


def _fwd(topo, rescale, interpret, tip_partials, pmats, freqs, props):
    T, S, P = tip_partials.shape
    N, C = pmats.shape[0], pmats.shape[1]
    dtype = tip_partials.dtype
    call = _build_forward(topo, C, S, P, rescale, dtype, interpret)
    site_log, partials, minv = call(
        tip_partials, pmats, freqs.reshape(1, S), props.reshape(1, C))
    site_log = site_log[0]
    residuals = (pmats, partials, minv, site_log, freqs, props)
    return site_log, residuals


def _bwd(topo, rescale, interpret, residuals, g):
    pmats, partials, minv, site_log, freqs, props = residuals
    N, C, S, P = partials.shape
    dtype = partials.dtype
    root = topo.N - 1
    root_partials = partials[root]                     # [C, S, P]
    # site likelihood in the *scaled* coordinates
    site_scaled = jnp.einsum("c,csp,s->p", props, root_partials, freqs)
    site_scaled = jnp.maximum(site_scaled, jnp.finfo(dtype).tiny)
    inv = g / site_scaled                              # [P]
    g_root = props[:, None, None] * freqs[None, :, None] * inv[None, None, :]
    call = _build_backward(topo, C, S, P, dtype, interpret)
    dpmats = call(pmats, partials, minv, g_root)
    # dfreqs / dprops from the root reduction
    dfreqs = jnp.einsum("c,csp,p->s", props, root_partials, inv)
    dprops = jnp.einsum("csp,s,p->c", root_partials, freqs, inv)
    dtips = jnp.zeros((topo.T, S, P), dtype)
    return dtips, dpmats, dfreqs, dprops


pallas_site_log.defvjp(_fwd, _bwd)


def pallas_tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs,
                               props, weights, *, rescale: bool = True,
                               interpret: bool = False):
    """Drop-in fused-kernel analog of ops.pruning.tree_log_likelihood."""
    site_log = pallas_site_log(topo, rescale, interpret,
                               tip_partials, pmats, freqs, props)
    return jnp.sum(weights * site_log), site_log
