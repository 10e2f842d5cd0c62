"""Multiple tree likelihoods per config + height-transform selection.

Reference parity: partitioned analyses share one config via several
treelikelihood objects (src/phyc/sitepattern.h:79 SitePattern_split);
height reparameterizations are selected by the tree node's "transform" key
(src/phyc/tree.c:1204-1252; treetransform.h:17-22 RATIO / SHIFT /
PROPORTION).
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tlk_node(tid, tree_id, sp_id, sm_id, aln_id):
    return {
        "id": tid, "type": "treelikelihood",
        "sitepattern": {
            "id": sp_id, "type": "sitepattern", "datatype": "nucleotide",
            "alignment": {"id": aln_id, "type": "alignment",
                          "file": os.path.join(DATA, "tiny.fa")}},
        "sitemodel": {
            "id": sm_id, "type": "sitemodel",
            "substitutionmodel": {
                "id": f"{sm_id}.subst", "type": "substitutionmodel",
                "model": "jc69", "datatype": "nucleotide"}},
        "tree": {"id": tree_id, "type": "tree",
                 "init": {"algorithm": "nj", "sitepattern": f"&{sp_id}"}},
    }


class TestMultipleTrees:
    def test_two_treelikelihoods_in_one_compound(self):
        from physher_tpu.config.builder import build_config
        from physher_tpu.config.actions import Runner

        cfg = {
            "joint": {
                "id": "joint", "type": "compound",
                "distributions": [
                    _tlk_node("tlk1", "tree1", "sp1", "sm1", "aln1"),
                    _tlk_node("tlk2", "tree2", "sp2", "sm2", "aln2"),
                ],
            },
            "physher": [],
        }
        ctx, actions = build_config(cfg, base_dir=DATA)
        joint = ctx.objects["joint"]
        tlk1, tlk2 = ctx.objects["tlk1"], ctx.objects["tlk2"]
        # distinct, id-derived parameter prefixes
        assert tlk1.prefix == "tree1." and tlk2.prefix == "tree2."
        space = joint.param_space()
        assert "tree1.distances" in space.names
        assert "tree2.distances" in space.names
        params = space.init_params()
        total = float(joint.log_prob(params))
        l1 = float(tlk1.log_likelihood(params))
        l2 = float(tlk2.log_likelihood(params))
        assert np.isclose(total, l1 + l2, rtol=1e-12)
        # same data + same model => identical per-part likelihoods
        assert np.isclose(l1, l2, rtol=1e-12)

    def test_two_trees_optimize_through_runner(self):
        from physher_tpu.config.builder import build_config
        from physher_tpu.config.actions import Runner

        cfg = {
            "joint": {
                "id": "joint", "type": "compound",
                "distributions": [
                    _tlk_node("tlk1", "tree1", "sp1", "sm1", "aln1"),
                    _tlk_node("tlk2", "tree2", "sp2", "sm2", "aln2"),
                ],
            },
            "physher": [
                {"id": "opt", "type": "optimizer", "algorithm": "sg",
                 "max": 40, "model": "&joint"},
            ],
        }
        ctx, actions = build_config(cfg, base_dir=DATA)
        r = Runner(ctx, seed=0)
        res = r.run(actions)["opt"]
        assert np.isfinite(res.logp)


class TestHeightTransforms:
    def _make(self, transform):
        from physher_tpu.models.clock import StrictClock
        from physher_tpu.models.substitution import JC69
        from physher_tpu.models.treelikelihood import TreeLikelihood
        from physher_tpu.trees.timetree import TimeTreeData
        from physher_tpu.utils.synthetic import (
            balanced_topology, random_sitepattern,
        )

        topo = balanced_topology(8)
        sp = random_sitepattern(8, 64, seed=3)
        heights = np.zeros(topo.N)
        for k in range(topo.I):
            cs = topo.children[k, : topo.child_count[k]]
            heights[topo.T + k] = heights[cs].max() + 0.4
        td = TimeTreeData.from_heights(topo, heights)
        return TreeLikelihood(
            sp, topo, JC69(), clock=StrictClock(topo.N, rate_init=1e-2),
            time_data=td, height_transform=transform), td, topo

    def test_proportion_aliases_ratio(self):
        # reference: new_HeightTreeTransform assigns the same `update` for
        # RATIO/RATIO_NAIVE/PROPORTION — only the gradient algorithm differs
        tlk_r, td, topo = self._make("ratio")
        tlk_p, _, _ = self._make("proportion")
        pr = tlk_r.param_space().init_params()
        pp = tlk_p.param_space().init_params()
        assert set(pr) == set(pp)
        assert np.isclose(float(tlk_r.log_likelihood(pr)),
                          float(tlk_p.log_likelihood(pp)), rtol=1e-12)

    def test_shift_matches_ratio_at_same_heights(self):
        import jax

        tlk_r, td, topo = self._make("ratio")
        tlk_s, _, _ = self._make("shift")
        pr = tlk_r.param_space().init_params()
        ps = tlk_s.param_space().init_params()
        assert "tree.shifts" in ps and "tree.ratios" not in ps
        hr = np.asarray(tlk_r.node_heights(pr))
        hs = np.asarray(tlk_s.node_heights(ps))
        np.testing.assert_allclose(hr, hs, rtol=1e-9)
        assert np.isclose(float(tlk_r.log_likelihood(pr)),
                          float(tlk_s.log_likelihood(ps)), rtol=1e-10)
        # shift transform has unit jacobian (treetransform.c *_zero)
        assert float(tlk_s.log_jacobian(ps)) == 0.0
        # gradient flows through the shift parameterization
        g = jax.grad(tlk_s.log_likelihood)(ps)
        assert np.all(np.isfinite(np.asarray(g["tree.shifts"])))

    def test_shift_transform_through_config(self):
        from physher_tpu.config.builder import build_config

        node = _tlk_node("tlk", "tree", "sp", "sm", "aln")
        node["tree"]["time"] = True
        node["tree"]["transform"] = "shift"
        ctx, _ = build_config({"model": node, "physher": []}, base_dir=DATA)
        tlk = ctx.objects["tlk"]
        assert tlk.height_transform == "shift"
        space = tlk.param_space()
        assert "tree.shifts" in space.names
        p = space.init_params()
        assert np.isfinite(float(tlk.log_likelihood(p)))
