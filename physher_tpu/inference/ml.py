"""Maximum-likelihood / MAP optimization.

Functional replacement for the reference's optimizer stack (reference:
src/phyc/optimizer.c: meta/Brent/serial-Brent/BFGS/CG/Powell/SG/Adam). The
reference's serial-Brent-per-branch loop exists because it lacks cheap full
gradients; with autodiff the idiomatic TPU approach is full-vector
first-order (Adam) and quasi-Newton (L-BFGS) optimization of ALL parameters
in unconstrained space, with every iteration one fused jitted step.

``optimize`` mirrors the meta-optimizer contract (rounds until the objective
improves by < tol, reference: optimizer.c:154-210) and supports checkpointing
like the reference (reference: src/phyc/checkpoint.c, optimizer.c:870-878).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.parameters import ParamSpace


@dataclass
class OptResult:
    params: dict
    logp: float
    iterations: int
    converged: bool
    history: list = field(default_factory=list)


def _make_loss(log_prob: Callable, space: ParamSpace):
    def loss(uparams):
        return -log_prob(space.constrain(uparams))

    return loss


def optimize_adam(log_prob, space: ParamSpace, params: dict, *,
                  learning_rate: float = 0.05, max_iter: int = 5000,
                  tol: float = 1e-6, patience: int = 100,
                  checkpoint: Optional[str] = None,
                  checkpoint_every: int = 1000,
                  log_every: int = 0) -> OptResult:
    """Adam on the unconstrained reparameterization (reference:
    src/phyc/gradascent.c optimize_stochastic_gradient_adam)."""
    uparams = space.unconstrain(params)
    opt = optax.adam(learning_rate)
    loss = _make_loss(log_prob, space)

    @jax.jit
    def step(uparams, state):
        val, grads = jax.value_and_grad(loss)(uparams)
        updates, state = opt.update(grads, state, uparams)
        return optax.apply_updates(uparams, updates), state, val

    state = opt.init(uparams)
    best = np.inf
    best_u = uparams
    since = 0
    history = []
    it = 0
    for it in range(max_iter):
        uparams, state, val = step(uparams, state)
        v = float(val)
        history.append(-v)
        if log_every and it % log_every == 0:
            print(f"iter {it} logP {-v:.6f}")
        if v < best - tol:
            best, best_u, since = v, uparams, 0
        else:
            since += 1
            if since >= patience:
                break
        if checkpoint and it % checkpoint_every == 0 and it > 0:
            save_checkpoint(checkpoint, space.constrain(best_u))
    final = space.constrain(best_u)
    if checkpoint:
        save_checkpoint(checkpoint, final)
    return OptResult(final, -best, it + 1, since < patience, history)


def optimize_adam_adapt(log_prob, space: ParamSpace, params: dict, *,
                        etas=(1.0, 0.1, 0.01, 0.001), trial_iter: int = 100,
                        **kw) -> OptResult:
    """Learning-rate search, then a full Adam run at the winner (reference:
    src/phyc/gradascent.c:141-203 optimize_stochastic_gradient_adapt, which
    trials the etas on a pthread pool — here the trials run as ONE vmapped
    optimization over the eta batch).
    """
    uparams = space.unconstrain(params)
    loss = _make_loss(log_prob, space)
    etas_arr = jnp.asarray(list(etas))
    flat0 = space.flatten_unconstrained(uparams)

    def trial(eta):
        opt = optax.adam(1.0)  # rescale per-eta below

        def step(carry, _):
            flat, state = carry
            up = space.unflatten_unconstrained(flat)
            val, grads = jax.value_and_grad(loss)(up)
            gflat = space.flatten_unconstrained(grads)
            updates, state = opt.update(gflat, state, flat)
            return (flat + eta * updates, state), val

        (flat, _), vals = jax.lax.scan(
            step, (flat0, optax.adam(1.0).init(flat0)), None,
            length=trial_iter)
        up = space.unflatten_unconstrained(flat)
        return loss(up)

    finals = jax.jit(jax.vmap(trial))(etas_arr)
    finals = jnp.where(jnp.isfinite(finals), finals, jnp.inf)
    best_eta = float(etas_arr[int(jnp.argmin(finals))])
    return optimize_adam(log_prob, space, params, learning_rate=best_eta,
                         **kw)


def optimize_lbfgs(log_prob, space: ParamSpace, params: dict, *,
                   max_iter: int = 500, tol: float = 1e-8,
                   history_size: int = 20) -> OptResult:
    """L-BFGS with Zoom linesearch on the unconstrained space (replacement
    for the reference's BFGS/CG, src/phyc/bfgs.c, frpmrn.c)."""
    uparams = space.unconstrain(params)
    loss = _make_loss(log_prob, space)
    opt = optax.lbfgs(memory_size=history_size)
    value_and_grad = optax.value_and_grad_from_state(loss)

    @jax.jit
    def step(uparams, state):
        val, grad = value_and_grad(uparams, state=state)
        updates, state = opt.update(
            grad, state, uparams, value=val, grad=grad, value_fn=loss)
        return optax.apply_updates(uparams, updates), state, val, grad

    state = opt.init(uparams)
    prev = np.inf
    it = 0
    converged = False
    for it in range(max_iter):
        uparams, state, val, grad = step(uparams, state)
        v = float(val)
        if not np.isfinite(v):
            break
        if abs(prev - v) < tol:
            converged = True
            break
        prev = v
    final_val = float(loss(uparams))
    return OptResult(space.constrain(uparams), -final_val, it + 1, converged)


def optimize(log_prob, space: ParamSpace, params: dict, *,
             method: str = "meta", **kw) -> OptResult:
    """Meta strategy: Adam warmup then L-BFGS polish until no round improves
    by more than ``tol`` (the reference's meta-optimizer loop contract,
    optimizer.c:154-210)."""
    if method == "adam":
        return optimize_adam(log_prob, space, params, **kw)
    if method == "lbfgs":
        return optimize_lbfgs(log_prob, space, params, **kw)
    if method != "meta":
        raise ValueError(f"unknown method {method!r}")
    tol = kw.pop("tol", 1e-6)
    res = optimize_adam(log_prob, space, params, tol=tol,
                        max_iter=kw.pop("adam_iter", 2000), **kw)
    total_it = res.iterations
    for _ in range(10):
        res2 = optimize_lbfgs(log_prob, space, res.params, tol=tol)
        total_it += res2.iterations
        if res2.logp <= res.logp + tol:
            res = res2 if res2.logp > res.logp else res
            break
        res = res2
    return OptResult(res.params, res.logp, total_it, True)


# -- checkpointing (reference: src/phyc/checkpoint.c name,value CSV) --------


def save_checkpoint(path: str, params: dict) -> None:
    """Atomic-ish name,value CSV (reference: checkpoint.c:40-62)."""
    lines = []
    for name, value in params.items():
        arr = np.ravel(np.asarray(value))
        if arr.size == 1:
            lines.append(f"{name},{float(arr[0]):.17g}")
        else:
            for i, v in enumerate(arr):
                lines.append(f"{name}.{i},{float(v):.17g}")
    tmp = path + ".new"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    import os

    os.replace(tmp, path)


def load_checkpoint(path: str, params: dict) -> dict:
    """Restore values by name into an existing parameter pytree
    (reference: checkpoint.c checkpoint_apply)."""
    values: dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            name, _, val = line.rpartition(",")
            values[name] = float(val)
    out = {}
    for name, value in params.items():
        arr = np.array(np.asarray(value), dtype=np.float64)
        if arr.ndim == 0:
            if name in values:
                arr = np.asarray(values[name])
        else:
            for i in range(arr.size):
                k = f"{name}.{i}"
                if k in values:
                    arr.flat[i] = values[k]
        out[name] = jnp.asarray(arr)
    return out
