"""Node-height reparameterizations for time trees (pure JAX).

Rebuild of the reference's TreeTransform (reference: src/phyc/treetransform.c).
The math is shared by the reference's RATIO / RATIO_NAIVE / PROPORTION
variants (they differ only in gradient implementation, which JAX autodiff
replaces):

    h(root)     = params[root_rank]
    h(internal) = lower(n) + (h(parent(n)) - lower(n)) * params[rank(n)]

with ``lower(n)`` = max tip height below ``n`` (reference:
src/phyc/treetransform.c:224-266 tree_transform_update_heights /
collect_lowers) and log|Jacobian| = sum over non-root internals of
log(h(parent) - lower) (reference: src/phyc/treetransform.c:214-222).

The SHIFT parameterization ``h = max(child heights) + shift`` is also
provided (reference: src/phyc/treetransform.c:14-31). Parameters are ordered
by internal postorder rank (= the reference's internal class_id,
src/phyc/tree.c:183-199), root last.

Forward transforms are parent-before-child (ratio) or child-before-parent
(shift) sweeps executed as vectorized level updates — tree-depth many scatter
steps instead of the reference's per-node recursion.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .topology import Topology


def compute_lowers(topo: Topology, tip_heights: np.ndarray) -> np.ndarray:
    """Static per-node lower bounds: max descendant tip height [N]."""
    lowers = np.zeros(topo.N)
    lowers[: topo.T] = tip_heights
    for k in range(topo.I):
        cs = topo.children[k, : topo.child_count[k]]
        lowers[topo.T + k] = lowers[cs].max()
    return lowers


def heights_from_ratios(params: jnp.ndarray, topo: Topology,
                        tip_heights, lowers) -> jnp.ndarray:
    """Forward ratio transform: params [I] (root height last) -> heights [N]."""
    dtype = params.dtype
    h = jnp.zeros(topo.N, dtype=dtype)
    h = h.at[: topo.T].set(jnp.asarray(tip_heights, dtype=dtype))
    lowers = jnp.asarray(lowers, dtype=dtype)
    h = h.at[topo.root].set(params[topo.I - 1])
    for ranks in topo.preorder_levels[1:]:
        nodes = topo.T + ranks
        low = lowers[nodes]
        hp = h[topo.parent[nodes]]
        h = h.at[nodes].set(low + (hp - low) * params[ranks])
    return h


def ratios_from_heights(heights: np.ndarray, topo: Topology,
                        lowers: np.ndarray) -> np.ndarray:
    """Inverse transform (host-side): heights [N] -> params [I]
    (reference: src/phyc/treetransform.c:263-266)."""
    params = np.zeros(topo.I)
    params[topo.I - 1] = heights[topo.root]
    for k in range(topo.I - 1):
        node = topo.T + k
        p = topo.parent[node]
        params[k] = (heights[node] - lowers[node]) / (heights[p] - lowers[node])
    return params


def ratio_log_jacobian(heights: jnp.ndarray, topo: Topology,
                       lowers) -> jnp.ndarray:
    """log |det dh/dratios| summed over non-root internal nodes."""
    nodes = topo.T + np.arange(topo.I - 1)
    lowers = jnp.asarray(lowers, dtype=heights.dtype)
    return jnp.sum(jnp.log(heights[topo.parent[nodes]] - lowers[nodes]))


def heights_from_shifts(params: jnp.ndarray, topo: Topology,
                        tip_heights) -> jnp.ndarray:
    """SHIFT parameterization: h = max(child heights) + shift, postorder."""
    dtype = params.dtype
    h = jnp.zeros(topo.N, dtype=dtype)
    h = h.at[: topo.T].set(jnp.asarray(tip_heights, dtype=dtype))
    for ranks in topo.levels:
        nodes = topo.T + ranks
        hmax = None
        for j in range(topo.children.shape[1]):
            ch = topo.children[ranks, j]
            mask = ch >= 0
            vals = jnp.where(
                jnp.asarray(mask), h[np.where(mask, ch, 0)], -jnp.inf
            )
            hmax = vals if hmax is None else jnp.maximum(hmax, vals)
        h = h.at[nodes].set(hmax + params[ranks])
    return h


def shifts_from_heights(heights: np.ndarray, topo: Topology) -> np.ndarray:
    params = np.zeros(topo.I)
    for k in range(topo.I):
        cs = topo.children[k, : topo.child_count[k]]
        params[k] = heights[topo.T + k] - heights[cs].max()
    return params


def branch_durations(heights: jnp.ndarray, topo: Topology) -> jnp.ndarray:
    """Per-node time-duration of the branch above each node: [N] with 0 at
    the root. d(n) = h(parent(n)) - h(n)."""
    parent = np.where(topo.parent >= 0, topo.parent, topo.root)
    d = heights[parent] - heights
    return d.at[topo.root].set(0.0)
