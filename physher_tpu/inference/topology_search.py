"""Tree topology search: NNI and SPR with batched candidate scoring.

Rebuild of the reference's topology optimizers (reference:
src/phyc/topologyopt.c:26-44 TopologyOptimizer, nniopt.c:160-380 NNI rounds,
spropt.c:1128-1380 radius-limited SPR with parsimony prescreen,
treesearch.h:37-39 move primitives). The reference parallelizes move scoring
with OpenMP over cloned likelihood objects; here every candidate topology is
a row of a vmapped evaluation over the dynamic-topology engine — one
compiled kernel scores the whole neighborhood at once.

Moves are generated host-side on nested tree structures (branch lengths ride
with their subtrees); candidates are renumbered to canonical postorder by
``Topology.from_nested``.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.topology import Topology
from ..ops.dynamic_pruning import batched_tree_loglik, batched_fitch
from . import ml


def to_nested(topo: Topology, distances):
    """Topology + branch lengths -> nested dict tree (inverse of
    Topology.from_nested)."""

    def build(node):
        if node < topo.T:
            ch = []
        else:
            k = node - topo.T
            ch = [build(int(topo.children[k, j]))
                  for j in range(topo.child_count[k])]
        d = None
        if node != topo.root and distances is not None:
            d = float(distances[node])
            if np.isnan(d):
                d = None
        return {"name": topo.taxa[node] if node < topo.T else None,
                "length": d, "children": ch}

    return build(topo.root)


def nni_neighbors(nested):
    """All NNI rearrangements (2 per internal non-root edge).

    For edge (v, parent): swap v's sibling with each child of v. Branch
    lengths stay attached to their subtrees; the central edge keeps its
    length.
    """
    out = []
    root = copy.deepcopy(nested)

    # index nodes by path so we can mutate copies
    def paths(node, path=()):
        yield path, node
        for i, c in enumerate(node["children"]):
            yield from paths(c, path + (i,))

    def get(tree, path):
        n = tree
        for i in path:
            n = n["children"][i]
        return n

    for path, node in paths(root):
        if not node["children"] or path == ():
            continue
        # v = node (internal, non-root); parent at path[:-1]
        parent_path = path[:-1]
        vi = path[-1]
        for ci in range(len(node["children"])):
            cand = copy.deepcopy(root)
            parent = get(cand, parent_path)
            v = parent["children"][vi]
            # sibling index (binary assumption: the other child)
            si = 1 - vi if len(parent["children"]) == 2 else None
            if si is None:
                continue
            sib = parent["children"][si]
            child = v["children"][ci]
            # swap sibling <-> child
            parent["children"][si] = child
            v["children"][ci] = sib
            out.append(cand)
    return out


def spr_candidates(nested, max_radius: int | None = None):
    """SPR rearrangements: prune each subtree, regraft on edges within
    ``max_radius`` hops of the pruning point (reference: spropt.c)."""
    out = []
    root = copy.deepcopy(nested)

    def paths(node, path=()):
        yield path, node
        for i, c in enumerate(node["children"]):
            yield from paths(c, path + (i,))

    def get(tree, path):
        n = tree
        for i in path:
            n = n["children"][i]
        return n

    all_paths = [p for p, n in paths(root)]
    for prune_path in all_paths:
        if prune_path == ():
            continue
        parent_path = prune_path[:-1]
        for target_path in all_paths:
            if target_path == () or target_path == prune_path:
                continue
            # target must not be inside the pruned subtree nor its parent edge
            if target_path[: len(prune_path)] == prune_path:
                continue
            if target_path == parent_path:
                continue
            if max_radius is not None:
                # topological distance between edge midpoints (path metric)
                common = 0
                for a, b in zip(prune_path, target_path):
                    if a != b:
                        break
                    common += 1
                dist = (len(prune_path) - common) + (len(target_path) - common)
                if dist > max_radius:
                    continue
            cand = copy.deepcopy(root)
            pruned = get(cand, prune_path)
            pparent = get(cand, parent_path)
            sibs = [c for i, c in enumerate(pparent["children"])
                    if i != prune_path[-1]]
            if len(sibs) != 1:
                continue  # binary only
            sib = sibs[0]
            # collapse parent: sibling absorbs the parent's branch
            if pparent is cand:
                # parent is root: sibling becomes the new root
                sib = copy.deepcopy(sib)
                new_root = sib
                if not new_root["children"]:
                    continue
                cand = new_root
                cand["length"] = None
            else:
                gp = get(cand, parent_path[:-1])
                l1 = pparent.get("length") or 0.0
                l2 = sib.get("length") or 0.0
                sib["length"] = l1 + l2
                gp["children"][parent_path[-1]] = sib
            # locate target in the modified tree by identity-walk: recompute
            # paths in cand (structure changed above prune point only if
            # target shares prefix; we skipped those cases)
            try:
                tgt_parent = get(cand, target_path[:-1])
                tgt = tgt_parent["children"][target_path[-1]]
            except (IndexError, KeyError):
                continue
            half = (tgt.get("length") or 0.0) / 2.0
            tgt2 = copy.deepcopy(tgt)
            tgt2["length"] = half
            new_node = {"name": None, "length": half,
                        "children": [tgt2, copy.deepcopy(pruned)]}
            tgt_parent["children"][target_path[-1]] = new_node
            out.append(cand)
    return out


@dataclass
class SearchResult:
    topology: Topology
    distances: np.ndarray
    logp: float
    rounds: int
    moves_accepted: int
    history: list = field(default_factory=list)


class TopologySearch:
    """NNI/SPR hill climbing over topologies for a tree likelihood.

    ``tlk_factory(topo, distances)`` builds a TreeLikelihood for a topology
    (same data/model); used for the final/periodic branch-length
    re-optimization. Candidate scoring runs through the dynamic engine at
    current branch lengths.
    """

    def __init__(self, tlk_factory, *, algorithm: str = "nni",
                 spr_radius: int = 6, prescreen_parsimony: bool = True,
                 max_rounds: int = 50, tol: float = 1e-3,
                 bl_opt_steps: int = 200):
        self.factory = tlk_factory
        self.algorithm = algorithm
        self.spr_radius = spr_radius
        self.prescreen = prescreen_parsimony
        self.max_rounds = max_rounds
        self.tol = tol
        self.bl_opt_steps = bl_opt_steps
        self._dyn_opt = None
        self._scorers = {}

    def _make_dynamic_bl_optimizer(self, tlk, params):
        """One compiled branch-length optimizer with topology as DATA.

        Adam on log branch lengths through the dynamic engine — candidate
        topologies re-optimize without recompilation (the static engine
        would retrace per topology)."""
        import optax

        rates, props = tlk.site_model.rates_props(params)
        freqs = tlk.subst.frequencies(params)
        tp = jnp.asarray(tlk.tip_partials)
        w = tlk.weights
        subst = tlk.subst
        steps = self.bl_opt_steps

        def loglik(log_bl, children, perm):
            bl = jnp.exp(log_bl)
            blc = bl[:, None] * rates[None, :]
            pmats = subst.p_t(params, blc).astype(tlk.dtype)
            from ..ops.dynamic_pruning import tree_loglik_dynamic

            return tree_loglik_dynamic(
                tp[perm], pmats, children, freqs.astype(tlk.dtype),
                props.astype(tlk.dtype), w, rescale=tlk.rescale)[0]

        opt = optax.adam(0.05)

        @jax.jit
        def optimize_bl(children, perm, bl0):
            log_bl = jnp.log(jnp.clip(jnp.asarray(bl0), 1e-6, None))

            def step(carry, _):
                lb, state = carry
                val, g = jax.value_and_grad(
                    lambda z: -loglik(z, children, perm))(lb)
                updates, state = opt.update(g, state, lb)
                lb = optax.apply_updates(lb, updates)
                return (lb, state), val

            (log_bl, _), vals = jax.lax.scan(
                step, (log_bl, opt.init(log_bl)), None, length=steps)
            final = loglik(log_bl, children, perm)
            return jnp.exp(log_bl), final

        return optimize_bl

    def _score_candidates(self, tlk, params, candidates):
        """Batched log-likelihoods of candidate (topo, dist) pairs."""
        B = len(candidates)
        N = tlk.topo.N
        children = np.zeros((B, tlk.topo.I, 2), dtype=np.int32)
        bls = np.zeros((B, N))
        for b, (topo_c, dist_c) in enumerate(candidates):
            children[b] = topo_c.children[:, :2]
            # permute tip rows to the base tip order via taxa names
            bls[b] = np.nan_to_num(dist_c, nan=0.0)
        rates, props = tlk.site_model.rates_props(params)
        freqs = tlk.subst.frequencies(params)
        # per-candidate tip partials permutation
        base_names = {t: i for i, t in enumerate(tlk.topo.taxa)}
        perms = np.zeros((B, tlk.topo.T), dtype=np.int32)
        for b, (topo_c, _) in enumerate(candidates):
            perms[b] = [base_names[t] for t in topo_c.taxa]

        blc = jnp.asarray(bls)[:, :, None] * rates[None, None, :]
        pmats = tlk.subst.p_t(params, blc).astype(tlk.dtype)  # [B,N,C,S,S]

        tp = jnp.asarray(tlk.tip_partials)  # [T, S, P] in base order

        if "score" not in self._scorers:
            @jax.jit
            def score(pmats, children, perms):
                def one(pm, ch, perm):
                    from ..ops.dynamic_pruning import tree_loglik_dynamic

                    return tree_loglik_dynamic(
                        tp[perm], pm, ch, freqs.astype(tlk.dtype),
                        props.astype(tlk.dtype), tlk.weights,
                        rescale=tlk.rescale)[0]

                return jax.vmap(one)(pmats, children, perms)

            self._scorers["score"] = score
        return np.asarray(self._scorers["score"](
            pmats, jnp.asarray(children), jnp.asarray(perms)))

    def _reoptimize(self, topo, dist):
        """Full static-engine optimization (start and final polish)."""
        dist = self._reopen(dist)
        tlk = self.factory(topo, dist)
        space = tlk.param_space()
        res = ml.optimize(tlk.log_likelihood, space, space.init_params(),
                          method="lbfgs", max_iter=200)
        d = np.asarray(res.params["tree.distances"])
        return tlk, res.params, float(res.logp), np.concatenate([d, [np.nan]])

    @staticmethod
    def _reopen(dist):
        # reopen collapsed edges: bl -> 0 kills the log-space gradient
        # (d logL / d log bl = bl * d logL / d bl), so a candidate whose
        # rearranged edge starts near zero could never move off it
        dist = np.asarray(dist, dtype=np.float64).copy()
        dist[np.isnan(dist)] = 0.05
        dist[dist < 2e-3] = 2e-2
        return dist

    def _reoptimize_dynamic(self, tlk_base, topo_c, dist_c):
        """Branch-length re-optimization of a candidate without recompiling."""
        base_names = {t: i for i, t in enumerate(tlk_base.topo.taxa)}
        perm = np.array([base_names[t] for t in topo_c.taxa], dtype=np.int32)
        bl0 = self._reopen(dist_c)
        bl_opt, logp = self._dyn_opt(
            jnp.asarray(topo_c.children[:, :2]), jnp.asarray(perm),
            jnp.asarray(bl0))
        d = np.array(bl_opt, dtype=np.float64)
        d[-1] = np.nan
        return float(logp), d

    def run(self, topo: Topology, distances) -> SearchResult:
        tlk, params, best, dist = self._reoptimize(topo, distances)
        self._dyn_opt = self._make_dynamic_bl_optimizer(tlk, params)
        # rebase 'best' onto the dynamic optimizer's scale so comparisons are
        # apples-to-apples (same objective, Adam-optimized branch lengths)
        best_dyn, dist_dyn = self._reoptimize_dynamic(tlk, tlk.topo, dist)
        if best_dyn > best:
            best, dist = best_dyn, dist_dyn
        history = [best]
        accepted = 0
        rounds = 0
        for rounds in range(1, self.max_rounds + 1):
            nested = to_nested(topo, dist)
            if self.algorithm == "nni":
                cand_nested = nni_neighbors(nested)
            else:
                cand_nested = spr_candidates(nested, self.spr_radius)
            candidates = [Topology.from_nested(c) for c in cand_nested]
            if not candidates:
                break
            if (self.algorithm == "spr" and self.prescreen
                    and len(candidates) > 64):
                from ..likelihood.parsimony import tip_state_sets

                tips = tip_state_sets(tlk.sp, tlk.topo)
                base_names = {t: i for i, t in enumerate(tlk.topo.taxa)}
                B = len(candidates)
                ch = np.stack([c[0].children[:, :2] for c in candidates])
                # permute tip sets per candidate
                from ..ops.dynamic_pruning import fitch_score_dynamic

                scores = []
                CH = 64
                w = jnp.asarray(tlk.sp.weights)
                batched = jax.jit(jax.vmap(
                    lambda t, c: fitch_score_dynamic(t, c, w)))
                for s0 in range(0, B, CH):
                    chunk = candidates[s0: s0 + CH]
                    tps = np.stack([
                        tips[[base_names[t] for t in c[0].taxa]]
                        for c in chunk])
                    chs = np.stack([c[0].children[:, :2] for c in chunk])
                    scores.append(np.asarray(batched(jnp.asarray(tps),
                                                     jnp.asarray(chs))))
                pars = np.concatenate(scores)
                keep = np.argsort(pars)[: max(32, len(candidates) // 4)]
                candidates = [candidates[i] for i in keep]
            scores = self._score_candidates(tlk, params, candidates)
            order = np.argsort(scores)[::-1]
            improved = False
            # candidates tied with the best score (zero-length edges make NNI
            # neighborhoods score identically at shared branch lengths) all
            # deserve a branch-length re-optimization
            n_try = max(3, int(np.sum(scores >= scores.max() - 1e-6)))
            for bi in order[: min(n_try, 16)]:
                topo_c, dist_c = candidates[bi]
                if scores[bi] < best - 50.0:
                    break
                logp_c, dist_opt = self._reoptimize_dynamic(
                    tlk, topo_c, dist_c)
                if logp_c > best + self.tol:
                    topo, dist, best = topo_c, dist_opt, logp_c
                    improved = True
                    accepted += 1
                    break
            history.append(best)
            if not improved:
                break
        # final polish with the full optimizer on the winning topology
        tlk, params, final_lnl, dist = self._reoptimize(topo, dist)
        best = max(best, final_lnl)
        history.append(best)
        return SearchResult(topo, dist, best, rounds, accepted, history)
