"""Binding API surface (reference: src/phycpp/physher.hpp Interfaces)."""

import json
import os

import numpy as np
import pytest

from physher_tpu import api

DATA = os.path.join(os.path.dirname(__file__), "data")


def _toy_alignment():
    return {"a": "ACGTACGTAC", "b": "ACGTACCTAA",
            "c": "AGGTACGTAT", "d": "ACGAACGTAA"}


NEWICK = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.1):0.05);"


class TestUnrooted:
    def test_jc69_loglik_and_gradient(self):
        tm = api.UnRootedTreeModelInterface(NEWICK)
        tlk = api.TreeLikelihoodInterface(
            _toy_alignment(), tm, api.JC69Interface(),
            api.ConstantSiteModelInterface())
        ll = tlk.LogLikelihood()
        assert np.isfinite(ll) and ll < 0
        tlk.RequestGradient()
        g = tlk.Gradient()
        assert g.size >= tm.topo.N - 1
        # finite-difference check on the first branch length
        eps = 1e-6
        d = tm._values["distances"].copy()
        d2 = d.copy(); d2[0] += eps
        tm.SetParameters(d2)
        up = tlk.LogLikelihood()
        tm.SetParameters(d)
        fd = (up - ll) / eps
        np.testing.assert_allclose(g[0], fd, rtol=1e-3)

    def test_hky_set_parameters_changes_loglik(self):
        tm = api.UnRootedTreeModelInterface(NEWICK)
        sub = api.HKYInterface(kappa=2.0)
        tlk = api.TreeLikelihoodInterface(
            _toy_alignment(), tm, sub, api.ConstantSiteModelInterface())
        l1 = tlk.LogLikelihood()
        sub.SetParameters(np.r_[8.0, 0.25, 0.25, 0.25, 0.25])
        l2 = tlk.LogLikelihood()
        assert l1 != l2

    def test_gtr_gamma(self):
        tm = api.UnRootedTreeModelInterface(NEWICK)
        tlk = api.TreeLikelihoodInterface(
            _toy_alignment(), tm, api.GTRInterface(),
            api.GammaSiteModelInterface(shape=0.5, categories=4))
        assert np.isfinite(tlk.LogLikelihood())
        g = tlk.Gradient()
        assert np.isfinite(g).all()


class TestTimeTree:
    def test_flua_golden(self):
        """Strict-clock time tree through the Interface API reproduces the
        reference golden (test_tree_likelihood.c:29)."""
        from physher_tpu.io.seqio import read_alignment

        cfg = json.load(open(os.path.join(DATA, "jc69-time.json")))
        tm = api.ReparameterizedTimeTreeModelInterface(
            cfg["model"]["tree"]["newick"],
            dates=cfg["model"]["tree"]["dates"])
        aln = read_alignment(os.path.join(DATA, "fluA.fa"))
        clock = api.StrictClockModelInterface(0.001, tm)
        tlk = api.TreeLikelihoodInterface(
            aln, tm, api.JC69Interface(), api.ConstantSiteModelInterface(),
            clock, use_tip_states=True)
        ll = tlk.LogLikelihood()
        np.testing.assert_allclose(ll, -4777.616349713985, atol=1e-7)

    def test_height_transform_jvp(self):
        cfg = json.load(open(os.path.join(DATA, "jc69-time.json")))
        tm = api.ReparameterizedTimeTreeModelInterface(
            cfg["model"]["tree"]["newick"],
            dates=cfg["model"]["tree"]["dates"])
        h = tm.GetNodeHeights()
        assert h.shape == (tm.topo.N,)
        hg = np.random.default_rng(0).normal(size=tm.topo.I)
        rg = tm.GradientTransformJVP(hg)
        assert rg.shape == (tm.topo.I,)
        assert np.isfinite(rg).all()
        jac = tm.GradientTransformJacobian()
        assert np.isfinite(jac).all()


class TestCoalescent:
    def _tm(self):
        return api.TimeTreeModelInterface(
            "((a:1.0,b:1.0):1.0,(c:1.5,d:1.5):0.5);",
            dates={"a": 0, "b": 0, "c": 0, "d": 0})

    def test_constant(self):
        c = api.ConstantCoalescentModelInterface(2.0, self._tm())
        ll = c.LogLikelihood()
        assert np.isfinite(ll)
        g = c.Gradient()
        assert np.isfinite(g).all()

    def test_skyride_and_grid(self):
        tm = self._tm()
        c1 = api.PiecewiseConstantCoalescentInterface([1.0, 2.0, 3.0], tm)
        assert np.isfinite(c1.LogLikelihood())
        c2 = api.PiecewiseConstantCoalescentGridInterface(
            [1.0, 2.0, 3.0], tm, cutoff=1.8)
        assert np.isfinite(c2.LogLikelihood())
        c3 = api.PiecewiseLinearCoalescentGridInterface(
            [1.0, 2.0, 3.0], tm, cutoff=1.8)
        assert np.isfinite(c3.LogLikelihood())

    def test_ctmc_scale(self):
        c = api.CTMCScaleModelInterface([0.001], self._tm())
        assert np.isfinite(c.LogLikelihood())
        assert np.isfinite(c.Gradient()).all()
