"""TreeHandle: the config-layer view of a tree model.

Bundles the static topology/branch data with the canonical parameter names
used in the pytree, and exposes pure functions (heights, branch durations,
tree length) so priors and coalescents built from JSON can bind to the same
tree the likelihood uses (the reference shares one Tree object through the
hashtable; reference: src/physher.c:163-205).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..trees.topology import Topology
from ..trees.timetree import TimeTreeData
from ..trees.heights import (
    heights_from_ratios, heights_from_shifts, branch_durations,
)


class TreeHandle:
    def __init__(self, topo: Topology, distances, td: TimeTreeData | None,
                 prefix: str = "tree."):
        self.topo = topo
        self.distances = distances
        self.td = td
        self.prefix = prefix
        # height reparameterization (reference: treetransform.h:17-22);
        # build_tree overrides from the JSON "transform" key
        self.transform = "ratio"

    @property
    def is_time_tree(self):
        return self.td is not None

    def key(self, k):
        return f"{self.prefix}{k}"

    def heights(self, params) -> jnp.ndarray:
        td = self.td
        if self.transform == "shift":
            return heights_from_shifts(params[self.key("shifts")], self.topo,
                                       td.tip_heights)
        ratios = jnp.concatenate([
            jnp.atleast_1d(params[self.key("ratios")]),
            jnp.atleast_1d(params[self.key("root_height")]),
        ])
        return heights_from_ratios(ratios, self.topo, td.tip_heights,
                                   td.lowers)

    def durations(self, params) -> jnp.ndarray:
        return branch_durations(self.heights(params), self.topo)

    def tree_length(self, params) -> jnp.ndarray:
        """Total time length (sum of branch durations) — the CTMC-scale
        prior's T (reference: src/phyc/ctmcscale.c:21-27)."""
        if self.is_time_tree:
            return jnp.sum(self.durations(params))
        d = params[self.key("distances")]
        return jnp.sum(d)
