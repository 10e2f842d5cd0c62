"""HMC sampler and adaptive-eta Adam (reference: ophmc.c, gradascent.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from physher_tpu.models.parameters import ParamSpec, ParamSpace
from physher_tpu.inference.mcmc import HMC
from physher_tpu.inference.ml import optimize_adam_adapt


def test_hmc_gaussian_moments():
    spec = ParamSpec.vector("x", np.zeros(3))
    space = ParamSpace([spec])

    mean = jnp.asarray([1.0, -2.0, 0.5])
    sd = jnp.asarray([0.5, 1.0, 2.0])

    def log_prob(p):
        return jnp.sum(-0.5 * ((p["x"] - mean) / sd) ** 2)

    hmc = HMC(space, log_prob, n_leapfrog=8)
    res = hmc.run(jax.random.PRNGKey(0), {"x": jnp.zeros(3)},
                  n_iter=1500, n_chains=8, burnin=300, step_size=0.2)
    draws = res.to_dict_of_arrays()["x"].reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(draws.std(0), np.asarray(sd), rtol=0.2)
    # acceptance after adaptation should be reasonable
    assert res.acceptance[-1] > 0.4


def test_hmc_constrained_space():
    # positive parameter via the space transform: gamma(5, rate 2) target
    spec = ParamSpec.scalar("r", 1.0, lower=0.0)
    space = ParamSpace([spec])

    def log_prob(p):
        return 4.0 * jnp.log(p["r"]) - 2.0 * p["r"]

    hmc = HMC(space, log_prob, n_leapfrog=10)
    res = hmc.run(jax.random.PRNGKey(1), {"r": jnp.asarray(1.0)},
                  n_iter=2000, n_chains=4, burnin=400, step_size=0.2)
    draws = res.to_dict_of_arrays()["r"].ravel()
    assert abs(draws.mean() - 2.5) < 0.2          # mean = a/b = 5/2
    assert abs(draws.var() - 1.25) < 0.4          # var = a/b^2


def test_adam_adapt_picks_working_eta():
    spec = ParamSpec.vector("x", np.full(4, 5.0))
    space = ParamSpace([spec])

    def log_prob(p):
        return -jnp.sum((p["x"] - 2.0) ** 2)

    res = optimize_adam_adapt(log_prob, space, {"x": jnp.full(4, 5.0)},
                              etas=(5.0, 0.5, 0.005), trial_iter=50,
                              max_iter=2000, patience=200)
    np.testing.assert_allclose(np.asarray(res.params["x"]), 2.0, atol=1e-2)
    assert res.logp > -1e-3
