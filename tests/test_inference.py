"""Estimator correctness on analytically tractable targets + a small
phylogenetic ML run (the reference exercises these through configs;
tractable targets pin the math exactly)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from physher_tpu.models.parameters import ParamSpace, ParamSpec
from physher_tpu.models.distributions import normal_logpdf
from physher_tpu.inference import ml, mcmc, vb, marginal


# conjugate normal model: y_i ~ N(theta, s2), theta ~ N(0, t2)
Y = np.array([0.3, 1.2, -0.4, 0.8, 1.9, 0.1, 0.7, 1.1])
S2 = 1.0
T2 = 4.0


def log_like(params):
    return jnp.sum(normal_logpdf(jnp.asarray(Y), params["theta"],
                                 math.sqrt(S2)))


def log_prior(params):
    return jnp.sum(normal_logpdf(params["theta"], 0.0, math.sqrt(T2)))


def log_post(params):
    return log_like(params) + log_prior(params)


def analytic_log_marginal():
    n = len(Y)
    # y ~ N(0, s2 I + t2 11^T)
    cov = S2 * np.eye(n) + T2 * np.ones((n, n))
    return st.multivariate_normal.logpdf(Y, np.zeros(n), cov)


SPACE = ParamSpace([ParamSpec.scalar("theta", 0.0)])
LOGZ = analytic_log_marginal()


def posterior_moments():
    n = len(Y)
    prec = n / S2 + 1 / T2
    mean = (Y.sum() / S2) / prec
    return mean, 1.0 / prec


def test_ml_conjugate():
    res = ml.optimize(log_post, SPACE, SPACE.init_params(), method="lbfgs")
    mean, _ = posterior_moments()
    np.testing.assert_allclose(float(res.params["theta"]), mean, atol=1e-6)


def test_adam_and_meta():
    res = ml.optimize_adam(log_post, SPACE, SPACE.init_params(),
                           learning_rate=0.1, max_iter=2000)
    mean, _ = posterior_moments()
    np.testing.assert_allclose(float(res.params["theta"]), mean, atol=5e-3)


def test_mcmc_posterior_moments():
    sampler = mcmc.MCMC(SPACE, log_post)
    res = sampler.run(jax.random.PRNGKey(0), SPACE.init_params(),
                      n_iter=40000, every=10, burnin=4000, n_chains=4)
    mean, var = posterior_moments()
    thetas = res.samples_u.reshape(-1)
    np.testing.assert_allclose(thetas.mean(), mean, atol=0.05)
    np.testing.assert_allclose(thetas.var(), var, rtol=0.2)
    assert 0.05 < np.nanmean(res.acceptance) < 0.9


def test_vb_meanfield():
    fam = vb.MeanFieldNormalVB(log_post, SPACE, SPACE.init_params())
    res = vb.fit(fam, jax.random.PRNGKey(1), steps=3000, learning_rate=0.05,
                 grad_samples=4, elbo_samples=2000)
    mean, var = posterior_moments()
    np.testing.assert_allclose(float(res.vparams["loc"][0]), mean, atol=0.05)
    np.testing.assert_allclose(
        float(jnp.exp(res.vparams["log_scale"][0])), math.sqrt(var),
        rtol=0.15)
    # for a normal target the optimal ELBO equals log Z
    np.testing.assert_allclose(res.elbo, LOGZ, atol=0.1)


def test_vb_fullrank_and_is():
    fam = vb.FullRankNormalVB(log_post, SPACE, SPACE.init_params())
    res = vb.fit(fam, jax.random.PRNGKey(2), steps=3000, learning_rate=0.05,
                 grad_samples=4, elbo_samples=2000)
    np.testing.assert_allclose(res.elbo, LOGZ, atol=0.1)
    est = marginal.importance_sampling_marginal(
        jax.random.PRNGKey(3), fam, res.vparams, log_post, n_samples=4000)
    np.testing.assert_allclose(est, LOGZ, atol=0.02)


def test_marginal_stepping_and_path():
    val, info = marginal.marginal_likelihood(
        jax.random.PRNGKey(4), SPACE, log_like, log_prior,
        SPACE.init_params(), method="stepping", n_temps=16, n_iter=8000,
        every=5, burnin=1000)
    np.testing.assert_allclose(val, LOGZ, atol=0.15)
    lls = [info["mcmc"].log_likelihood[:, k]
           for k in range(len(info["temperatures"]))]
    ps, _ = marginal.log_path_sampling(lls, info["temperatures"])
    np.testing.assert_allclose(ps, LOGZ, atol=0.3)
    ps2, _ = marginal.log_path_sampling_modified(lls, info["temperatures"])
    np.testing.assert_allclose(ps2, LOGZ, atol=0.3)


def test_harmonic_means():
    # harmonic mean from exact posterior samples
    mean, var = posterior_moments()
    rng = np.random.default_rng(0)
    thetas = rng.normal(mean, math.sqrt(var), 20000)
    lls = np.array([float(log_like({"theta": jnp.asarray(t)}))
                    for t in thetas[:4000]])
    hm = marginal.log_harmonic_mean(lls)
    shm = marginal.log_stabilized_harmonic_mean(lls)
    # harmonic means are biased upward; just sanity-band them
    assert LOGZ - 1.0 < hm < LOGZ + 1.5
    assert LOGZ - 1.0 < shm < LOGZ + 1.5


def test_laplace():
    res = ml.optimize(log_post, SPACE, SPACE.init_params(), method="lbfgs")
    lap = marginal.laplace_marginal(log_post, SPACE, res.params)
    # normal target: Laplace is exact
    np.testing.assert_allclose(lap, LOGZ, atol=1e-5)


def test_bridge():
    sampler = mcmc.MCMC(SPACE, log_post)
    res = sampler.run(jax.random.PRNGKey(5), SPACE.init_params(),
                      n_iter=20000, every=10, burnin=2000)
    su = jnp.asarray(res.samples_u.reshape(-1, 1))

    def log_unnorm(z):
        up = SPACE.unflatten_unconstrained(z)
        return log_post(SPACE.constrain(up)) + SPACE.log_jacobian(up)

    est = marginal.bridge_sampling_marginal(su, log_unnorm, SPACE,
                                            jax.random.PRNGKey(6))
    np.testing.assert_allclose(est, LOGZ, atol=0.05)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.asarray(1.5), "b": jnp.asarray([0.1, 0.2, 0.3])}
    path = str(tmp_path / "ckpt.csv")
    ml.save_checkpoint(path, params)
    restored = ml.load_checkpoint(path, {"a": jnp.asarray(0.0),
                                         "b": jnp.zeros(3)})
    np.testing.assert_allclose(float(restored["a"]), 1.5)
    np.testing.assert_allclose(np.asarray(restored["b"]), [0.1, 0.2, 0.3])


def test_phylo_ml_improves():
    """JC69 on tiny.fa: meta optimization must improve on the NJ start and
    drive the gradient to ~0 (the reference's jc69.json action)."""
    import json
    import os

    from physher_tpu.config.builder import build_config

    cfg = json.load(open(os.path.join(
        os.path.dirname(__file__), "data", "goldens", "jc69nj.json")))
    ctx, _ = build_config(cfg, base_dir=os.path.join(
        os.path.dirname(__file__), "data"))
    tlk = ctx.objects["treelikelihood"]
    space = tlk.param_space()
    p0 = space.init_params()
    start = float(tlk.log_likelihood(p0))
    res = ml.optimize(tlk.log_likelihood, space, p0, method="lbfgs",
                      max_iter=200)
    assert res.logp > start + 0.5
    g = jax.grad(lambda u: -tlk.log_likelihood(space.constrain(u)))(
        space.unconstrain(res.params))
    gnorm = max(float(jnp.max(jnp.abs(v))) for v in g.values())
    assert gnorm < 0.5, f"gradient not near zero: {gnorm}"
