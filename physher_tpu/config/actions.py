"""Action execution: the `physher` run list of a config.

Rebuild of the reference's main action dispatcher (reference:
src/physher.c:207-305): optimizer, mcmc (+ loggers/operators), logger,
hessian, marginallikelihood, mmcmc, and friends. Actions share one mutable
parameter pool so sequential actions see each other's results (the
reference's shared Parameter objects in the hashtable).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import ml, mcmc as mcmc_mod, vb as vb_mod, marginal
from ..models.parameters import ParamSpace
from .builder import Context
from .variational import VariationalHandle


class Runner:
    def __init__(self, ctx: Context, seed: int = 0, out=None):
        self.ctx = ctx
        self.seed = seed
        self.key = jax.random.PRNGKey(seed)
        self.pool: dict = {}
        self.out = out or sys.stdout
        self.results: dict = {}

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- parameter pool ----------------------------------------------------

    def params_for(self, space: ParamSpace) -> dict:
        init = space.init_params()
        return {k: self.pool.get(k, v) for k, v in init.items()}

    def update_pool(self, params: dict):
        self.pool.update(params)

    def model_logprob(self, model):
        return getattr(model, "log_prob", None) or model.log_likelihood

    # -- dispatch ----------------------------------------------------------

    def run(self, actions: list):
        for node in actions:
            typ = str(node.get("type", "")).lower()
            handler = getattr(self, f"action_{typ}", None)
            if handler is None:
                raise ValueError(f"unknown action type {typ!r}")
            handler(node)
        return self.results

    # -- actions -----------------------------------------------------------

    def action_optimizer(self, node):
        model = self.ctx.resolve(node.get("model"))
        algorithm = str(node.get("algorithm", "meta")).lower()
        max_iter = int(node.get("max", 1000))
        tol = float(node.get("precision", node.get("tol", 1e-3)))

        if isinstance(model, VariationalHandle):
            # SG/Adam on the ELBO (reference: optimizer.c OPT_SG/OPT_SG_ADAM
            # driving the variational model, JC69-time-ELBO.json)
            lr = float(node.get("eta", 0.05))
            res = vb_mod.fit(
                model.family, self.next_key(), steps=max_iter,
                learning_rate=lr, grad_samples=model.grad_samples,
                elbo_samples=model.elbo_samples, tol=tol)
            model.vparams = res.vparams
            self.results[node.get("id", "vb")] = res
            print(f"ELBO: {res.elbo:.6f} ({res.iterations} iterations)",
                  file=self.out)
            return res

        log_prob = self.model_logprob(model)
        space = model.param_space()
        restrict = node.get("parameters")
        params = self.params_for(space)
        if restrict:
            names = self.ctx.resolve_target(restrict)
            sub_specs = [space.by_name[n] for n in names if n in space.by_name]
            sub_space = ParamSpace(sub_specs)
            fixed = {k: v for k, v in params.items()
                     if k not in {s.name for s in sub_specs}}
            fn = lambda p: log_prob({**fixed, **p})  # noqa: E731
            sub_params = {k: params[k] for k in sub_space.names}
            method = {"sg": "adam", "adam": "adam"}.get(algorithm, "meta")
            res = ml.optimize(fn, sub_space, sub_params, method=method,
                              tol=tol)
            params.update(res.params)
        else:
            method = {"sg": "adam", "adam": "adam",
                      "lbfgs": "lbfgs", "bfgs": "lbfgs",
                      "cg": "lbfgs"}.get(algorithm, "meta")
            kw = {}
            if node.get("checkpoint"):
                kw["checkpoint"] = node["checkpoint"]
            res = ml.optimize(log_prob, space, params, method=method,
                              tol=tol, **kw)
            params = dict(res.params)
        self.update_pool(params)
        self.results[node.get("id", "optimizer")] = res
        print(f"Maximum log likelihood: {res.logp:.6f} "
              f"({res.iterations} iterations)", file=self.out)
        return res

    def action_mcmc(self, node):
        model = self.ctx.resolve(node.get("model"))
        log_prob = self.model_logprob(model)
        space = model.param_space()
        params = self.params_for(space)
        length = int(node.get("length", 100000))
        # operator weights -> per-spec proposal weights
        weights: dict = {}
        for op in node.get("operators", []):
            names = self.ctx.resolve_target(op.get("x"))
            w = float(op.get("weight", 1.0))
            for n in names:
                weights[n] = weights.get(n, 0.0) + w
        # logging granularity = smallest logger "every"
        logs = node.get("log", [])
        every = min([int(l.get("every", 1000)) for l in logs] or [1000])

        sampler = mcmc_mod.MCMC(space, log_prob,
                                weights=weights or None)
        res = sampler.run(self.next_key(), params, n_iter=length,
                          every=every)
        self.results[node.get("id", "mcmc")] = res
        self._write_mcmc_logs(node, res, space, every)
        # leave the pool at the last sample
        last = res.params_at(-1)
        self.update_pool(last)
        acc = ", ".join(f"{b}:{a:.2f}" for b, a in
                        zip(sampler.blocks, res.acceptance))
        print(f"MCMC finished: {length} iterations; acceptance {acc}",
              file=self.out)
        return res

    def _write_mcmc_logs(self, node, res, space, base_every):
        cons = res.to_dict_of_arrays()
        S = res.samples_u.shape[0]
        for log_node in node.get("log", []):
            every = int(log_node.get("every", 1000))
            stride = max(1, every // base_every)
            idx = np.arange(0, S, stride)
            states = idx * base_every
            fname = log_node.get("file")
            models = log_node.get("models", [])
            if isinstance(models, str):
                models = [models]
            xs = log_node.get("x", [])
            if isinstance(xs, str):
                xs = [xs]
            # tree logger?
            tree_handle = None
            for m in models:
                obj = self.ctx.resolve(m) if isinstance(m, str) else m
                if hasattr(obj, "is_time_tree"):
                    tree_handle = obj
            if tree_handle is not None and fname:
                self._write_tree_log(fname, tree_handle, res, idx, states)
                continue
            # tabular logger
            cols: list = ["state"]
            series: list = [states]
            zsel = jnp.asarray(res.samples_u[idx, 0])
            for m in models:
                obj = self.ctx.resolve(m) if isinstance(m, str) else m
                if hasattr(obj, "log_prob") or hasattr(obj, "log_likelihood"):
                    fn = self.model_logprob(obj)
                    batch = jax.jit(jax.vmap(lambda z: fn(space.constrain(
                        space.unflatten_unconstrained(z)))))
                    vals = np.asarray(batch(zsel))
                    cols.append(m.lstrip("&$%"))
                    series.append(vals)
                elif isinstance(m, str):
                    for name in self.ctx.resolve_target(m):
                        if name in cons:
                            arr = cons[name][idx, 0]
                            arr2 = arr.reshape(len(idx), -1)
                            for j in range(arr2.shape[1]):
                                cols.append(f"{name}.{j}" if arr2.shape[1] > 1
                                            else name)
                                series.append(arr2[:, j])
            for x in xs:
                for name in self.ctx.resolve_target(x):
                    if name not in cons:
                        continue
                    arr = cons[name][idx, 0].reshape(len(idx), -1)
                    for j in range(arr.shape[1]):
                        cols.append(f"{name}.{j}" if arr.shape[1] > 1
                                    else name)
                        series.append(arr[:, j])
            table = np.column_stack(series)
            lines = ["\t".join(cols)]
            for row in table:
                lines.append("\t".join(
                    str(int(row[0])) if c == 0 else f"{v:.10g}"
                    for c, v in enumerate(row)))
            text = "\n".join(lines) + "\n"
            if fname:
                with open(self._path(fname), "w") as fh:
                    fh.write(text)
            else:
                print(text[:2000], file=self.out)

    def _write_tree_log(self, fname, handle, res, idx, states):
        from ..io.treeio import write_newick
        from ..trees.heights import branch_durations

        topo = handle.topo
        lines = ["#NEXUS", "begin trees;"]
        for s, i in zip(states, idx):
            p = res.params_at(int(i))
            if handle.is_time_tree:
                h = handle.heights(p)
                dist = np.asarray(branch_durations(h, topo))
            else:
                d = np.asarray(p["tree.distances"])
                dist = np.concatenate([d, [np.nan]])
            lines.append(
                f"tree STATE_{int(s)} = {write_newick(topo, dist)}")
        lines += ["end;", ""]
        with open(self._path(fname), "w") as fh:
            fh.write("\n".join(lines))

    def _path(self, p):
        import os

        if os.path.isabs(p):
            return p
        return os.path.join(self.ctx.base_dir, p)

    def action_logger(self, node):
        """One-shot logger (reference: src/phyc/logger.c)."""
        tree = self.ctx.resolve(node.get("tree")) if node.get("tree") else None
        if tree is not None and hasattr(tree, "is_time_tree"):
            from ..io.treeio import write_newick
            from ..trees.heights import branch_durations

            space_holder = self.ctx.objects.get("treelikelihood")
            if tree.is_time_tree and space_holder is not None:
                params = self.params_for(space_holder.param_space())
                h = tree.heights(params)
                dist = np.asarray(branch_durations(h, tree.topo))
            else:
                dist = self.pool.get("tree.distances")
                if dist is None:
                    dist = np.asarray(tree.distances)[: tree.topo.N - 1]
                dist = np.concatenate([np.asarray(dist), [np.nan]])
            print(write_newick(tree.topo, dist), file=self.out)
        models = node.get("models", [])
        if isinstance(models, str):
            models = [models]
        for m in models:
            obj = self.ctx.resolve(m)
            if hasattr(obj, "log_prob") or hasattr(obj, "log_likelihood"):
                fn = self.model_logprob(obj)
                params = self.params_for(obj.param_space())
                print(f"{m.lstrip('&')}: {float(fn(params)):.6f}",
                      file=self.out)

    def action_hessian(self, node):
        model = self.ctx.resolve(node.get("model"))
        log_prob = self.model_logprob(model)
        space = model.param_space()
        params = self.params_for(space)
        u = space.flatten_unconstrained(space.unconstrain(params))

        def f(z):
            return log_prob(space.constrain(space.unflatten_unconstrained(z)))

        H = np.asarray(jax.hessian(f)(u))
        self.results[node.get("id", "hessian")] = H
        print("Hessian (unconstrained space):", file=self.out)
        print(np.array2string(H, precision=6), file=self.out)
        return H
