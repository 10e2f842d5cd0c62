"""Coalescent golden-value parity (reference: tests/test_coalescent.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.io.treeio import read_newick
from physher_tpu.models.coalescent import (
    ConstantCoalescent, ExponentialCoalescent, PiecewiseLinearCoalescent,
    SkygridCoalescent, SkylineCoalescent, SkyrideCoalescent,
)
from physher_tpu.trees.timetree import TimeTreeData

NEWICK = "(((a:2,b:2):4,c:6):6,d:12);"


@pytest.fixture(scope="module")
def tree():
    topo, dist = read_newick(NEWICK)
    td = TimeTreeData.from_dated_tree(topo, dist, {t: 0 for t in topo.taxa})
    heights = jnp.asarray(td.node_heights0)
    np.testing.assert_allclose(np.asarray(heights)[topo.T:], [2.0, 6.0, 12.0])
    return topo, heights


def test_constant(tree):
    topo, heights = tree
    coal = ConstantCoalescent(topo, theta_init=3.0)
    p = coal.param_space().init_params()
    logP = float(coal.log_prob_from_heights(heights, p))
    np.testing.assert_allclose(logP, -13.2958368660, atol=1e-8)
    p2 = {"coalescent.theta": jnp.asarray(7.0)}
    np.testing.assert_allclose(
        float(coal.log_prob_from_heights(heights, p2)), -10.1234447329,
        atol=1e-8)


def test_skyride(tree):
    topo, heights = tree
    coal = SkyrideCoalescent(topo, thetas_init=np.log([3.0, 10.0, 4.0]),
                             log_space=True)
    p = coal.param_space().init_params()
    logP = float(coal.log_prob_from_heights(heights, p))
    np.testing.assert_allclose(logP, -11.48749174278204, atol=1e-8)
    g = jax.grad(lambda pp: coal.log_prob_from_heights(heights, pp))(p)
    np.testing.assert_allclose(np.asarray(g["coalescent.thetas"]),
                               [3.0, 0.2, 0.5], atol=1e-8)
    gh = jax.grad(lambda h: coal.log_prob_from_heights(h, p))(heights)
    # finite-difference cross-check of height gradients
    eps = 1e-6
    for nid in range(topo.T, topo.N):
        hp = heights.at[nid].add(eps)
        hm = heights.at[nid].add(-eps)
        fd = (float(coal.log_prob_from_heights(hp, p))
              - float(coal.log_prob_from_heights(hm, p))) / (2 * eps)
        np.testing.assert_allclose(float(gh[nid]), fd, rtol=1e-5, atol=1e-7)


def test_skyride_delta_parameterization(tree):
    """Delta skyride: v = (theta0, increments..., zgam, tau) maps to
    log theta_i = log theta_{i-1} + zeta*(zgam/tau)*v_i, zeta=0.015
    (reference: demographicmodels.c:1337-1373)."""
    topo, heights = tree
    theta0, zgam, tau = 3.0, 2.0, 0.5
    incr = np.array([1.5, -0.75])
    v = np.concatenate([[theta0], incr, [zgam, tau]])
    coal = SkyrideCoalescent(topo, thetas_init=v, delta=True)
    p = coal.param_space().init_params()
    logP = float(coal.log_prob_from_heights(heights, p))
    # expand the deltas by hand and score with the plain skyride
    gam = zgam / tau
    log_th = np.log(theta0) + np.concatenate([[0.0],
                                              np.cumsum(0.015 * gam * incr)])
    ref = SkyrideCoalescent(topo, thetas_init=log_th, log_space=True)
    expected = float(ref.log_prob_from_heights(
        heights, ref.param_space().init_params()))
    np.testing.assert_allclose(logP, expected, rtol=1e-12)
    g = jax.grad(lambda pp: coal.log_prob_from_heights(heights, pp))(p)
    assert np.all(np.isfinite(np.asarray(g["coalescent.thetas"])))


def test_skygrid(tree):
    topo, heights = tree
    coal = SkygridCoalescent(topo, grid=5, cutoff=10.0,
                             thetas_init=np.log([3.0, 10.0, 4.0, 2.0, 3.0]),
                             log_space=True)
    p = coal.param_space().init_params()
    logP = float(coal.log_prob_from_heights(heights, p))
    np.testing.assert_allclose(logP, -11.8751856, atol=1e-6)
    g = jax.grad(lambda pp: coal.log_prob_from_heights(heights, pp))(p)
    np.testing.assert_allclose(
        np.asarray(g["coalescent.thetas"]),
        [3.5, 0.75, 0.1250, 1.25, -0.333333], atol=1e-5)


def test_piecewise_linear(tree):
    topo, heights = tree
    coal = PiecewiseLinearCoalescent(
        topo, grid=5, cutoff=10.0, thetas_init=[3.0, 10.0, 4.0, 2.0, 3.0],
        log_space=False)
    p = coal.param_space().init_params()
    logP = float(coal.log_prob_from_heights(heights, p))
    np.testing.assert_allclose(logP, -11.08185677776700117647, atol=1e-8)
    g = jax.grad(lambda pp: coal.log_prob_from_heights(heights, pp))(p)
    np.testing.assert_allclose(
        np.asarray(g["coalescent.thetas"]),
        [0.32063498962941356, 0.11153798261181064, 0.17750252451894566,
         0.33669080273686075, 0.06921832582596682], atol=1e-8)
    gh = jax.grad(lambda h: coal.log_prob_from_heights(h, p))(heights)
    np.testing.assert_allclose(
        np.asarray(gh[topo.T:]),
        [-0.6744186046511627, -0.375, -0.3333333333333333], atol=1e-8)


def test_skyline_grouped(tree):
    """Grouped skyline with group sizes [2, 1] == skyride with shared theta."""
    topo, heights = tree
    coal = SkylineCoalescent(topo, groups=[2, 1],
                             thetas_init=np.log([3.0, 4.0]), log_space=True)
    p = coal.param_space().init_params()
    ref = SkyrideCoalescent(topo, thetas_init=np.log([3.0, 3.0, 4.0]),
                            log_space=True)
    pr = ref.param_space().init_params()
    np.testing.assert_allclose(
        float(coal.log_prob_from_heights(heights, p)),
        float(ref.log_prob_from_heights(heights, pr)), atol=1e-10)


def test_exponential_growth_limits(tree):
    topo, heights = tree
    coal = ExponentialCoalescent(topo, n0_init=3.0, rate_init=0.0)
    p = coal.param_space().init_params()
    const = ConstantCoalescent(topo, theta_init=3.0)
    pc = const.param_space().init_params()
    np.testing.assert_allclose(
        float(coal.log_prob_from_heights(heights, p)),
        float(const.log_prob_from_heights(heights, pc)), atol=1e-8)
    # nonzero growth: autodiff vs FD for n0 and rate
    p["coalescent.rate"] = jnp.asarray(0.1)
    f = lambda pp: coal.log_prob_from_heights(heights, pp)  # noqa: E731
    g = jax.grad(f)(p)
    eps = 1e-6
    for name in ("coalescent.n0", "coalescent.rate"):
        pp = dict(p)
        pp[name] = p[name] + eps
        pm = dict(p)
        pm[name] = p[name] - eps
        fd = (float(f(pp)) - float(f(pm))) / (2 * eps)
        np.testing.assert_allclose(float(g[name]), fd, rtol=1e-6)
