"""Config builder for variational models.

Interprets the reference's variational JSON (reference: src/phyc/vb.c
new_Variational_from_json: per-block "distributions" with normal /
multivariatenormal / gamma families over transformed parameters) onto
:mod:`physher_tpu.inference.vb` families. Normal blocks over the full free
parameter set map to one mean-field normal on the unconstrained space with
per-block initial locations/scales; a fullrank request maps to
FullRankNormalVB.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..inference.vb import MeanFieldNormalVB, FullRankNormalVB
from .builder import Context, _param_value


class VariationalHandle:
    """Built variational model: family + the posterior it targets."""

    def __init__(self, family, posterior, space, params, elbo_samples=100,
                 grad_samples=1):
        self.family = family
        self.posterior = posterior
        self.space = space
        self.params = params
        self.elbo_samples = elbo_samples
        self.grad_samples = grad_samples
        self.vparams = family.init  # updated by the optimizer action

    def elbo(self, key, vparams=None, n_samples=None):
        return self.family.elbo(vparams or self.vparams, key,
                                n_samples or self.elbo_samples)


def build_variational(node, ctx: Context):
    node = ctx.resolve(node)
    if isinstance(node, VariationalHandle):
        return node
    posterior = ctx.resolve(node.get("posterior"))
    log_prob = getattr(posterior, "log_prob", None) or posterior.log_likelihood
    space = posterior.param_space()
    params = space.init_params()

    blocks = node.get("distributions", [])
    fullrank = any(
        str(b.get("distribution", "")).lower() == "multivariatenormal"
        for b in blocks) or str(node.get("family", "")).lower() in (
            "fullrank", "multivariatenormal")
    cls = FullRankNormalVB if fullrank else MeanFieldNormalVB
    fam = cls(log_prob, space, params)

    # apply per-block initial mu/sigma on the unconstrained space
    slices = space.unconstrained_slices()
    loc = np.asarray(fam.init["loc"], dtype=np.float64).copy()
    if fullrank:
        log_scale = np.asarray(fam.init["log_diag"], dtype=np.float64).copy()
    else:
        log_scale = np.asarray(fam.init["log_scale"], dtype=np.float64).copy()
    for b in blocks:
        x = b.get("x")
        if x is None:
            continue
        names = ctx.resolve_target(x)
        idx = []
        for n in names:
            if n not in slices:
                continue
            off, size = slices[n]
            idx.extend(range(off, off + size))
        idx = np.asarray(idx, dtype=np.int64)
        pnode = b.get("parameters", {})
        initialize = bool(b.get("initialize", False))
        mu_node = pnode.get("mu") if isinstance(pnode, dict) else None
        sigma_node = pnode.get("sigma") if isinstance(pnode, dict) else None
        if mu_node is not None and not initialize:
            mu = np.ravel(np.asarray(_param_value(mu_node, ctx, 0.0)))
            if mu.size in (1, idx.size) and "value" in (
                    mu_node if isinstance(mu_node, dict) else {"value": 1}):
                loc[idx] = mu if mu.size == idx.size else mu[0]
        if sigma_node is not None:
            sg = np.ravel(np.asarray(_param_value(sigma_node, ctx, 0.1)))
            if isinstance(sigma_node, dict) and "value" in sigma_node:
                log_scale[idx] = np.log(sg if sg.size == idx.size else sg[0])

    fam.init["loc"] = jnp.asarray(loc)
    if fullrank:
        fam.init["log_diag"] = jnp.asarray(log_scale)
    else:
        fam.init["log_scale"] = jnp.asarray(log_scale)

    handle = VariationalHandle(
        fam, posterior, space, params,
        elbo_samples=int(node.get("elbosamples", 100)),
        grad_samples=int(node.get("gradsamples", 1)))
    ctx.register(node.get("id"), handle)
    return handle
