"""Likelihood-based analyses: ancestral reconstruction, per-site category
posteriors, CAT assignment, sequence simulation.

Rebuilds (reference cites): marginal ASR src/phyc/asr.c:104 (action "asr"),
per-site rate-category posteriors src/phyc/ppsites.c (action "ppsite"),
FastTree-style CAT assignment src/phyc/cat.c:17 (action "cat"), and the
"simultron" sequence simulator src/phyc/physim.c:40.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.treelikelihood import TreeLikelihood
from ..ops.pruning import pruning_partials
from ..ops.upper import upper_partials, node_marginals, site_category_posteriors
from ..trees.topology import Topology


def _engine_state(tlk: TreeLikelihood, params):
    bl = tlk.branch_lengths(params)
    rates, props = tlk.site_model.rates_props(params)
    blc = bl[:, None] * rates[None, :]
    pmats = tlk.subst.p_t(params, blc).astype(tlk.dtype)
    freqs = tlk.subst.frequencies(params).astype(tlk.dtype)
    lower, _ = pruning_partials(tlk.tip_partials, pmats, tlk.topo)
    return pmats, freqs, props.astype(tlk.dtype), lower


def ancestral_states(tlk: TreeLikelihood, params):
    """Marginal ancestral state posteriors and MAP states.

    Returns (posteriors [N, S, Pp], map_states [I, P]) over unique patterns.
    """
    pmats, freqs, props, lower = _engine_state(tlk, params)
    upper = upper_partials(lower, pmats, tlk.topo, freqs)
    post = node_marginals(lower, upper, props)
    P = tlk.sp.pattern_count
    post = post[:, :, :P]
    map_states = jnp.argmax(post[tlk.topo.T:], axis=1)
    return np.asarray(post), np.asarray(map_states)


def ancestral_sequences(tlk: TreeLikelihood, params) -> dict:
    """MAP ancestral sequence strings per internal node (expanded to sites)."""
    _, map_states = ancestral_states(tlk, params)
    dt = tlk.sp.datatype
    out = {}
    for k in range(tlk.topo.I):
        states = map_states[k][tlk.sp.indexes]
        out[f"node{tlk.topo.T + k}"] = "".join(
            dt.symbol(int(s)) for s in states)
    return out


def site_rate_posteriors(tlk: TreeLikelihood, params) -> np.ndarray:
    """P(category | site) over unique patterns: [C, P]
    (reference: src/phyc/ppsites.c)."""
    pmats, freqs, props, lower = _engine_state(tlk, params)
    post = site_category_posteriors(lower[tlk.topo.root], freqs, props)
    return np.asarray(post[:, : tlk.sp.pattern_count])


def cat_assignment(tlk: TreeLikelihood, params) -> np.ndarray:
    """Per-site MAP rate category (reference: src/phyc/cat.c)."""
    post = site_rate_posteriors(tlk, params)
    return np.asarray(post.argmax(0))[tlk.sp.indexes]


def simulate_alignment(key, topo: Topology, subst, site_model, params,
                       branch_lengths, n_sites: int, datatype=None) -> dict:
    """Simulate sequences down the tree (reference: src/phyc/physim.c
    Sequence_simulate; JSON action "simultron" physher.c:289-292)."""
    rates, props = site_model.rates_props(params)
    freqs = subst.frequencies(params)
    S = subst.state_count
    C = rates.shape[0]
    key, k1, k2 = jax.random.split(key, 3)
    cats = jax.random.choice(k1, C, (n_sites,), p=props)
    root_states = jax.random.choice(k2, S, (n_sites,), p=freqs)

    bl = jnp.asarray(branch_lengths)
    blc = bl[:, None] * rates[None, :]
    pmats = subst.p_t(params, blc)  # [N, C, S, S]

    states = np.zeros((topo.N, n_sites), dtype=np.int32)
    states[topo.root] = np.asarray(root_states)
    cats_np = np.asarray(cats)
    key_np = key
    # preorder: parents before children
    for ranks in topo.preorder_levels:
        for k in ranks:
            node = topo.T + k
            for j in range(topo.child_count[k]):
                c = int(topo.children[k, j])
                key_np, sub = jax.random.split(key_np)
                probs = np.asarray(pmats[c])[cats_np, states[node], :]
                u = np.asarray(jax.random.uniform(sub, (n_sites,)))
                cdf = probs.cumsum(-1)
                states[c] = (u[:, None] > cdf).sum(-1)
    dt = datatype or getattr(subst, "datatype", None)
    out = {}
    from ..data.datatype import get_datatype

    if dt is None:
        dt = get_datatype("nucleotide" if S == 4 else
                          ("aa" if S == 20 else "codon"))
    elif isinstance(dt, str):
        dt = get_datatype(dt)
    for t in range(topo.T):
        out[topo.taxa[t]] = "".join(dt.symbol(int(s)) for s in states[t])
    return out
