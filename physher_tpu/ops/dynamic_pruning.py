"""Pruning with the topology as runtime data (for batched tree search).

The main engine (ops/pruning.py) closes over a static topology — optimal for
fixed-tree inference but requiring a recompile per topology. Tree search
(NNI/SPR) scores MANY alternative topologies; here the children arrays are
jnp inputs and the postorder is a ``lax.scan`` over internal ranks, so ONE
compiled evaluator scores a whole batch of candidate topologies via ``vmap``
(the TPU answer to the reference's OpenMP-parallel move evaluation over
cloned likelihood objects, reference: src/phyc/nniopt.c:160-380,
spropt.c:1128-1380; the "fixed maximal schedule" strategy flagged in
SURVEY.md §7 hard parts).

Candidate children arrays must satisfy the postorder invariant (child rank <
parent rank) — the search layer renumbers candidates accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tree_loglik_dynamic(tip_partials, pmats, children, freqs, props,
                        weights, *, rescale: bool = False):
    """Likelihood with runtime topology.

    tip_partials: [T, S, P]; pmats: [N, C, S, S]; children: int32[I, 2]
    (binary; node ids, children before parents); returns (logL, site_log).
    """
    T, S, P = tip_partials.shape
    N, C = pmats.shape[0], pmats.shape[1]
    I = N - T
    dtype = tip_partials.dtype
    buf = jnp.zeros((N, C, S, P), dtype=dtype)
    buf = buf.at[:T].set(tip_partials[:, None, :, :])
    scal = jnp.zeros((N, P), dtype=dtype)

    def body(carry, k):
        buf, scal = carry
        l = children[k, 0]
        r = children[k, 1]
        pl = buf[l]
        pr = buf[r]
        ml = pmats[l]
        mr = pmats[r]
        res = jnp.einsum("cij,cjp->cip", ml, pl) * jnp.einsum(
            "cij,cjp->cip", mr, pr)
        if rescale:
            m = jnp.maximum(jnp.max(res, axis=(0, 1)),
                            jnp.finfo(dtype).tiny)
            res = res / m[None, None, :]
            s = scal[l] + scal[r] + jnp.log(m)
            scal = scal.at[T + k].set(s)
        buf = buf.at[T + k].set(res)
        return (buf, scal), None

    (buf, scal), _ = jax.lax.scan(body, (buf, scal), jnp.arange(I))
    root = N - 1
    site_l = jnp.einsum("s,csp->cp", freqs, buf[root])
    site_lik = jnp.einsum("c,cp->p", props, site_l)
    site_log = jnp.log(site_lik)
    if rescale:
        site_log = site_log + scal[root]
    return jnp.sum(weights * site_log), site_log


def batched_tree_loglik(tip_partials, pmats_batch, children_batch, freqs,
                        props, weights, *, rescale: bool = False):
    """vmap over candidate topologies: pmats [B, N, C, S, S],
    children [B, I, 2] -> logLs [B]."""
    fn = lambda pm, ch: tree_loglik_dynamic(  # noqa: E731
        tip_partials, pm, ch, freqs, props, weights, rescale=rescale)[0]
    return jax.vmap(fn)(pmats_batch, children_batch)


def fitch_score_dynamic(tip_sets, children, weights):
    """Parsimony with runtime topology (for SPR prescreening, reference:
    src/phyc/spropt.c parsimony prescreen)."""
    T, P, S = tip_sets.shape
    I = children.shape[0]
    N = T + I
    sets = jnp.zeros((N, P, S), dtype=bool)
    sets = sets.at[:T].set(tip_sets)

    def body(carry, k):
        sets, score = carry
        l = children[k, 0]
        r = children[k, 1]
        sl = sets[l]
        sr = sets[r]
        inter = sl & sr
        union = sl | sr
        empty = ~inter.any(-1)
        res = jnp.where(empty[..., None], union, inter)
        sets = sets.at[T + k].set(res)
        return (sets, score + empty @ weights), None

    (sets, score), _ = jax.lax.scan(
        body, (sets, jnp.zeros((), dtype=weights.dtype)), jnp.arange(I))
    return score


def batched_fitch(tip_sets, children_batch, weights):
    return jax.vmap(lambda ch: fitch_score_dynamic(tip_sets, ch, weights))(
        children_batch)
