"""Fitch parsimony as vectorized bitset operations.

Rebuild of the reference's parsimony engine (reference:
src/phyc/parsimony.c:28-952: Fitch sets with SSE-able int scores, used
standalone and to pre-screen SPR moves). State sets are uint8/bool masks
``[nodes, patterns, states]``; the postorder runs on the same level schedule
as the likelihood engine. Scores are weighted pattern counts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..trees.topology import Topology
from ..data.sitepattern import SitePattern


def tip_state_sets(sp: SitePattern, topo: Topology) -> np.ndarray:
    """[T, P, S] boolean state sets from the datatype ambiguity table."""
    order = [sp.taxa.index(t) for t in topo.taxa]
    table = sp.datatype.partials_table > 0  # [codes, S]
    return table[sp.codes][order]  # [T, P, S]


def fitch_score(tip_sets, topo: Topology, weights) -> jnp.ndarray:
    """Weighted Fitch parsimony score (jittable).

    tip_sets: bool[T, P, S]; returns scalar score.
    """
    T, P, S = tip_sets.shape
    sets = jnp.zeros((topo.N, P, S), dtype=bool)
    sets = sets.at[:T].set(jnp.asarray(tip_sets))
    score = jnp.zeros(P, dtype=jnp.asarray(weights).dtype)
    maxc = topo.children.shape[1]
    for ranks in topo.levels:
        nodes = topo.T + ranks
        inter = None
        union = None
        for j in range(maxc):
            ch = topo.children[ranks, j]
            mask = ch >= 0
            ch_safe = np.where(mask, ch, 0)
            s = sets[ch_safe]
            if not mask.all():
                m = jnp.asarray(mask)[:, None, None]
                s = jnp.where(m, s, True)
            inter = s if inter is None else inter & s
            union = s if union is None else union | s
        empty = ~inter.any(-1)  # [n, P]
        res = jnp.where(empty[..., None], union, inter)
        score = score + empty.sum(0) * 1.0
        sets = sets.at[nodes].set(res)
    return jnp.sum(score * weights)


class Parsimony:
    """Parsimony 'model' over a fixed topology (config type "parsimony",
    reference: src/physher.c:190 MODEL_PARSIMONY)."""

    def __init__(self, sp: SitePattern, topo: Topology):
        self.sp = sp
        self.topo = topo
        self.tip_sets = tip_state_sets(sp, topo)
        self.weights = sp.weights

    def param_specs(self):
        return []

    def param_space(self):
        from ..models.parameters import ParamSpace

        return ParamSpace([])

    def score(self, topo: Topology | None = None) -> float:
        topo = topo or self.topo
        if topo is not self.topo:
            order = [self.topo.taxa.index(t) for t in topo.taxa]
            tips = self.tip_sets[order]
        else:
            tips = self.tip_sets
        return float(fitch_score(jnp.asarray(tips), topo,
                                 jnp.asarray(self.weights)))

    def log_prob(self, params=None):
        """Negated score so 'maximize logP' minimizes parsimony."""
        return -fitch_score(jnp.asarray(self.tip_sets), self.topo,
                            jnp.asarray(self.weights))

    __call__ = log_prob
