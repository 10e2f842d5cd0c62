"""Felsenstein pruning as level-batched tensor contractions (pure JAX).

This replaces the reference's ~14.5 kLoC of state-count-specialized SIMD
kernels (reference: src/phyc/treelikelihood4.c, treelikelihood20.c,
treelikelihoodX.c, treelikelihoodCodon.c and the orchestrator
src/phyc/treelikelihood.c:1454-1735) with one shape-polymorphic engine:

- partials are a single buffer ``[N, C, S, P]`` (node, rate category, state,
  pattern) with the pattern axis padded to a lane multiple and shardable
  data-parallel across devices,
- the postorder is executed as ``len(levels)`` batched steps; every node in a
  level computes ``prod_children P_child @ partial_child`` as one einsum that
  XLA maps onto the MXU (contraction over states, batch over node x category,
  patterns as the lane dimension),
- numerical rescaling is proactive per level (instead of the reference's
  reactive switch at treelikelihood.c:1497-1520): per-node per-pattern max
  factored out into a log accumulator, exact in the final log-likelihood.

Everything is autodiff-compatible; gradients w.r.t. the P-matrices flow to
branch lengths / substitution / clock parameters outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology


def pruning_partials(tip_partials: jnp.ndarray, pmats: jnp.ndarray,
                     topo: Topology, *, rescale: bool = False):
    """Run the postorder sweep.

    Parameters
    ----------
    tip_partials : [T, S, P]
    pmats        : [N, C, S, S] transition matrices of the branch above each
                   node (root entry unused).
    Returns
    -------
    partials [N, C, S, P], log_scalers [N, P] (zeros when rescale=False)
    """
    T, S, P = tip_partials.shape
    N, C = pmats.shape[0], pmats.shape[1]
    dtype = tip_partials.dtype
    buf = jnp.zeros((N, C, S, P), dtype=dtype)
    buf = buf.at[:T].set(tip_partials[:, None, :, :])
    scal = jnp.zeros((N, P), dtype=dtype)

    maxc = topo.children.shape[1]
    for ranks in topo.levels:
        nodes = topo.T + ranks
        res = None
        sc = None
        for j in range(maxc):
            ch = topo.children[ranks, j]  # numpy, static
            mask = ch >= 0
            ch_safe = np.where(mask, ch, 0)
            pm = pmats[ch_safe]  # [n, C, S, S]
            cp = buf[ch_safe]    # [n, C, S, P]
            contrib = jnp.einsum("ncij,ncjp->ncip", pm, cp,
                                 precision="high")
            if not mask.all():
                m = jnp.asarray(mask, dtype=dtype)[:, None, None, None]
                contrib = contrib * m + (1.0 - m)
            res = contrib if res is None else res * contrib
            if rescale:
                s = jnp.where(jnp.asarray(mask)[:, None], scal[ch_safe], 0.0)
                sc = s if sc is None else sc + s
        if rescale:
            m = jnp.max(res, axis=(1, 2))  # [n, P]
            m = jnp.maximum(m, jnp.finfo(dtype).tiny)
            res = res / m[:, None, None, :]
            scal = scal.at[nodes].set(sc + jnp.log(m))
        buf = buf.at[nodes].set(res)
    return buf, scal


def root_log_likelihood(root_partials: jnp.ndarray, freqs: jnp.ndarray,
                        props: jnp.ndarray, weights: jnp.ndarray,
                        log_scalers: jnp.ndarray | None = None):
    """Integrate over states and rate categories at the root and reduce.

    root_partials: [C, S, P]; returns (total logL, per-pattern site log-liks).
    The weighted sum is the data-parallel reduction point (psum across a
    sharded pattern axis; reference: src/phyc/treelikelihood.c:1483-1486).
    """
    site_l = jnp.einsum("s,csp->cp", freqs, root_partials,
                        precision="high")
    site_lik = jnp.einsum("c,cp->p", props, site_l, precision="high")
    site_log = jnp.log(site_lik)
    if log_scalers is not None:
        site_log = site_log + log_scalers
    return jnp.sum(weights * site_log), site_log


def _level_schedule(topo: Topology):
    """Per-level gather plan for the level-array engine, cached on the
    topology.

    For level ``d`` and child slot ``j``, children are grouped by SOURCE
    (-1 = tips, else an earlier level index), each group carrying
    (positions-in-level, positions-in-source). This lets the postorder run
    on small per-level arrays instead of one [N, C, S, P] buffer whose
    functional updates copy the whole buffer per level once a chain batch
    dimension is vmapped in (measured 83 ms of a 91 ms fluA logP eval at
    4096 chains)."""
    if getattr(topo, "_level_sched", None) is not None:
        return topo._level_sched
    lev_of = {}
    pos_of = {}
    for d, ranks in enumerate(topo.levels):
        for i, k in enumerate(ranks):
            lev_of[k] = d
            pos_of[k] = i
    maxc = topo.children.shape[1]
    plan = []
    for d, ranks in enumerate(topo.levels):
        slots = []
        for j in range(maxc):
            groups: dict = {}
            for i, k in enumerate(ranks):
                ch = int(topo.children[k, j]) if j < topo.children.shape[1] \
                    else -1
                if j >= int(topo.child_count[k]):
                    ch = -1
                if ch < 0:
                    src, sp = None, None
                elif ch < topo.T:
                    src, sp = -1, ch
                else:
                    src, sp = lev_of[ch - topo.T], pos_of[ch - topo.T]
                if src is None:
                    groups.setdefault("pad", []).append(i)
                else:
                    groups.setdefault(src, ([], []))
                    if isinstance(groups[src], tuple):
                        groups[src][0].append(i)
                        groups[src][1].append(sp)
            slots.append({k: (np.asarray(v[0]), np.asarray(v[1]))
                          if isinstance(v, tuple) else np.asarray(v)
                          for k, v in groups.items()})
        plan.append((np.asarray(ranks), slots))
    root_level = lev_of[topo.root - topo.T]
    root_pos = pos_of[topo.root - topo.T]
    topo._level_sched = (plan, root_level, root_pos)
    return topo._level_sched


def pruning_root_levels(tip_partials, pmats, topo: Topology, *,
                        rescale: bool = False):
    """Level-array postorder: returns (root_partials [C,S,P],
    root_log_scalers [P] | None).

    Same math as :func:`pruning_partials`; partials live in per-level
    arrays [n_level, C, S, P] gathered slot-wise from earlier levels, so
    nothing ever rewrites an O(N) buffer — the vmap/chain-batched form
    streams each partial through HBM ~twice instead of copying the full
    buffer per level."""
    T, S, P = tip_partials.shape
    C = pmats.shape[1]
    dtype = tip_partials.dtype
    plan, root_level, root_pos = _level_schedule(topo)
    tips_c = jnp.broadcast_to(tip_partials[:, None], (T, C, S, P))
    level_parts: list = []
    level_scal: list = []
    for d, (ranks, slots) in enumerate(plan):
        n = len(ranks)
        res = None
        sc = jnp.zeros((n, P), dtype) if rescale else None
        for j, groups in enumerate(slots):
            real = [(src, grp) for src, grp in groups.items()
                    if src != "pad"]
            if not real:  # every node lacks this child slot
                continue
            if len(real) == 1 and len(real[0][1][0]) == n and (
                    real[0][1][0] == np.arange(n)).all():
                # single full in-order group: plain gather, no placement
                src, (tgt, sp) = real[0]
                src_arr = tips_c if src == -1 else level_parts[src]
                cp = src_arr[sp]
                if rescale and src != -1:
                    sc = sc + level_scal[src][sp]
            else:
                cp = jnp.zeros((n, C, S, P), dtype)
                for src, (tgt, sp) in real:
                    src_arr = tips_c if src == -1 else level_parts[src]
                    cp = cp.at[tgt].set(src_arr[sp])
                    if rescale and src != -1:
                        sc = sc.at[tgt].add(level_scal[src][sp])
            ch_col = topo.children[ranks, j]
            has = ch_col >= 0
            pm_idx = np.where(has, np.maximum(ch_col, 0), 0)
            pm = pmats[pm_idx]
            contrib = jnp.einsum("ncij,ncjp->ncip", pm, cp,
                                 precision="high")
            if not has.all():
                m = jnp.asarray(has, dtype)[:, None, None, None]
                contrib = contrib * m + (1.0 - m)
            res = contrib if res is None else res * contrib
        if rescale:
            m = jnp.max(res, axis=(1, 2))
            m = jnp.maximum(m, jnp.finfo(dtype).tiny)
            res = res / m[:, None, None, :]
            sc = sc + jnp.log(m)
        level_parts.append(res)
        level_scal.append(sc)
    return (level_parts[root_level][root_pos],
            level_scal[root_level][root_pos] if rescale else None)


def tree_log_likelihood(tip_partials, pmats, topo: Topology, freqs, props,
                        weights, *, rescale: bool = False):
    """Full pruning likelihood: returns (logL, site_log_likelihoods)."""
    root, scal = pruning_root_levels(tip_partials, pmats, topo,
                                     rescale=rescale)
    return root_log_likelihood(root, freqs, props, weights, scal)


def pad_patterns(n: int, multiple: int = 128) -> int:
    """Pattern-axis padding target (lane alignment / shard divisibility)."""
    return int(-(-n // multiple) * multiple)
