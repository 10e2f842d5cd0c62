"""Benchmark suite: prints ONE JSON line {"metric","value","unit",
"vs_baseline", "extras": {...}}.

Headline metric: site-patterns/s/chip of full value+gradient evaluation of a
GTR+Gamma(4) time-tree likelihood (128 taxa, 16384 patterns) — BASELINE.json
primary ("site-patterns/s/chip (GTR+G pruning)").

Reference-CPU baselines (all measured on THIS machine from the reference
source at /root/reference, single core + SSE, via `tools/reforacle.c --bench`
and `tools/reforacle_codon.c` with REFORACLE_BENCH; full-recompute logP per
iteration plus the reference's own analytic O(N) branch gradient):

  GTR+Gamma4, 128 taxa x 16384 patterns (/tmp-generated synthetic, the EXACT
    workload below):  logP 49.78 ms, value+grad 398.22 ms
    -> 329,132 patterns/s forward, 41,144 patterns/s value+grad
  WAG+Gamma4, 64 taxa x 8192 aa patterns: logP 155.55 ms, v+g 863.23 ms
    -> 52,665 / 9,490 patterns/s
  Codon GY94 M0, 32 taxa x 4096 codon patterns: logP 401.20 ms
    -> 10,209 patterns/s forward
  fluA JC69 strict-clock time tree (tests/data/jc69-time.json, 238 patterns):
    logP 0.0844 ms, value+grad 0.4524 ms -> ELBO-iteration floor 2,210 it/s
    (one reparameterized gradient per iteration; the floor is OPTIMISTIC for
    the reference: its VI also transforms/samples per step)

NOTE the round-1 baseline of 650 patterns/s measured the reference's
finite-difference gradient fallback (354 ms for 238 patterns); the numbers
above use its analytic gradient path (prepare_gradient + dlogP), which is
the honest comparison and ~60x faster than the FD path.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REF = {
    # reference-CPU patterns/s on identical workloads (provenance above)
    "gtrg4_value_grad": 16384 / 0.39822,
    "gtrg4_forward": 16384 / 0.049777,
    "wag_value_grad": 8192 / 0.86323,
    "wag_forward": 8192 / 0.15555,
    "codon_forward": 4096 / 0.40120,
    "elbo_iters_per_s": 1.0 / 0.4524e-3,
    "timetree_logp_per_s": 1.0 / 0.0844e-3,
}


def build_gtrg4(n_tips, n_patterns, dtype, engine="auto"):
    import jax.numpy as jnp

    from physher_tpu.models.clock import StrictClock
    from physher_tpu.models.sitemodel import GammaSiteModel
    from physher_tpu.models.substitution import GTR
    from physher_tpu.models.treelikelihood import TreeLikelihood
    from physher_tpu.trees.timetree import TimeTreeData
    from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern

    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, n_patterns, seed=7)
    heights = np.zeros(topo.N)
    for k in range(topo.I):
        cs = topo.children[k, : topo.child_count[k]]
        heights[topo.T + k] = heights[cs].max() + 0.5
    td = TimeTreeData.from_heights(topo, heights)
    return TreeLikelihood(
        sp, topo, GTR(), GammaSiteModel(4),
        clock=StrictClock(topo.N, rate_init=1e-2), time_data=td,
        rescale=True, pattern_pad_multiple=128, dtype=dtype, engine=engine,
    )


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_gtrg4(extras):
    import jax
    import jax.numpy as jnp

    n_patterns = 16384
    tlk = build_gtrg4(128, n_patterns, jnp.float32)
    params = tlk.param_space().init_params(dtype=jnp.float32)

    vg = jax.jit(jax.value_and_grad(tlk.log_likelihood))
    dt_vg = timeit(vg, params)
    fwd = jax.jit(tlk.log_likelihood)
    dt_f = timeit(fwd, params)

    pps = n_patterns / dt_vg
    extras["gtrg4_forward_patterns_per_s"] = round(n_patterns / dt_f, 1)
    extras["gtrg4_forward_vs_ref_cpu"] = round(
        n_patterns / dt_f / REF["gtrg4_forward"], 2)

    # roofline of the useful pruning arithmetic (utils/profiling.py)
    try:
        from physher_tpu.utils.profiling import pruning_roofline, detect_chip

        rl = pruning_roofline(255, 4, 4, n_patterns, dt_vg,
                              chip=detect_chip(), with_gradient=True)
        extras["gtrg4_roofline"] = rl.report()
        extras["gtrg4_pct_of_chip_peak"] = round(
            100 * rl.fraction_of_peak(), 2)
    except Exception as e:  # pragma: no cover
        extras["gtrg4_roofline"] = f"failed: {e}"
    return pps


def bench_wag(extras):
    import jax
    import jax.numpy as jnp

    from physher_tpu.models.sitemodel import GammaSiteModel
    from physher_tpu.models.protein import WAG
    from physher_tpu.models.treelikelihood import TreeLikelihood
    from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern

    n_patterns = 8192
    topo = balanced_topology(64)
    sp = random_sitepattern(64, n_patterns, seed=9, datatype="aminoacid")
    tlk = TreeLikelihood(sp, topo, WAG(), GammaSiteModel(4), rescale=True,
                         pattern_pad_multiple=128, dtype=jnp.float32)
    params = tlk.param_space().init_params(dtype=jnp.float32)
    vg = jax.jit(jax.value_and_grad(tlk.log_likelihood))
    dt = timeit(vg, params, n=10)
    fwd = jax.jit(tlk.log_likelihood)
    dt_f = timeit(fwd, params, n=10)
    extras["wag_g4_value_grad_patterns_per_s"] = round(n_patterns / dt, 1)
    extras["wag_g4_value_grad_vs_ref_cpu"] = round(
        n_patterns / dt / REF["wag_value_grad"], 2)
    extras["wag_g4_forward_vs_ref_cpu"] = round(
        n_patterns / dt_f / REF["wag_forward"], 2)


def bench_codon(extras):
    import jax
    import jax.numpy as jnp

    from physher_tpu.models.codon import GY94
    from physher_tpu.models.treelikelihood import TreeLikelihood
    from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern

    n_patterns = 4096
    topo = balanced_topology(32)
    sp = random_sitepattern(32, n_patterns, seed=5, datatype="codon")
    tlk = TreeLikelihood(sp, topo, GY94(fixed_freqs=True), rescale=True,
                         pattern_pad_multiple=128, dtype=jnp.float32)
    params = tlk.param_space().init_params(dtype=jnp.float32)
    fwd = jax.jit(tlk.log_likelihood)
    dt_f = timeit(fwd, params, n=10)
    vg = jax.jit(jax.value_and_grad(tlk.log_likelihood))
    dt = timeit(vg, params, n=10)
    extras["codon_m0_forward_patterns_per_s"] = round(n_patterns / dt_f, 1)
    extras["codon_m0_forward_vs_ref_cpu"] = round(
        n_patterns / dt_f / REF["codon_forward"], 2)
    extras["codon_m0_value_grad_patterns_per_s"] = round(n_patterns / dt, 1)


def bench_elbo(extras):
    """fluA JC69-time ELBO (meanfield ADVI, grad_samples=1): iterations/s
    and wall-clock for 1000 iterations, vs the reference per-iteration floor
    (one analytic reparameterized gradient, measured 0.4524 ms)."""
    import jax
    import jax.numpy as jnp

    from physher_tpu.config.builder import build_config, load_json
    from physher_tpu.inference.vb import MeanFieldNormalVB

    base = os.path.join(os.path.dirname(__file__), "tests", "data")
    cfg = load_json(os.path.join(base, "jc69-time.json"))
    ctx, _ = build_config(cfg, base_dir=base)
    tlk = ctx.objects["treelikelihood"]
    space = tlk.param_space()
    params = space.init_params(dtype=jnp.float32)
    vb = MeanFieldNormalVB(jax.jit(tlk.log_likelihood), space, params)

    # scan-chunked Adam (inference/vb.py fit(chunk=...)): per-step dispatch
    # latency dominates this 238-pattern model on an accelerator, so run
    # 100 reparameterized-gradient steps per device call. utils/optim.adam
    # (not optax.adam, whose update graph schedules pathologically inside
    # this scan on TPU — 7-14x slower per step, see utils/optim.py)
    from physher_tpu.utils.optim import adam

    opt = adam(0.02)
    chunk = 100

    @jax.jit
    def run_chunk(vparams, state, key):
        def body(carry, k):
            vp, st = carry
            val, grads = jax.value_and_grad(
                lambda q: -vb.elbo(q, k, 1))(vp)
            updates, st = opt.update(grads, st, vp)
            vp = jax.tree.map(lambda a, u: a + u, vp, updates)
            return (vp, st), -val

        keys = jax.random.split(key, chunk)
        (vparams, state), vals = jax.lax.scan(body, (vparams, state), keys)
        return vparams, state, vals[-1]

    key = jax.random.PRNGKey(0)
    vparams = vb.init
    state = opt.init(vparams)
    vparams, state, val = run_chunk(vparams, state, key)  # compile
    jax.block_until_ready(val)
    n = 10
    dt = 1e18
    for _ in range(3):  # best-of-3: the shared TPU pool has 2-3x run-to-run
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            vparams, state, val = run_chunk(vparams, state, sub)
        jax.block_until_ready(val)
        dt = min(dt, (time.perf_counter() - t0) / (n * chunk))
    extras["fluA_elbo_iters_per_s"] = round(1.0 / dt, 1)
    extras["fluA_elbo_1000iter_wall_s"] = round(1000 * dt, 3)
    extras["fluA_elbo_vs_ref_cpu_floor"] = round(
        (1.0 / dt) / REF["elbo_iters_per_s"], 2)
    extras["fluA_elbo_final"] = round(float(val), 2)


def bench_mcmc(extras):
    """Tempered-ladder MCMC throughput on the fluA time-tree model: total
    posterior evaluations/s across a batched 8-temperature ladder (the
    reference runs its ladder sequentially, mmcmc.c:18-105). vs_ref uses
    the reference's full-logP recompute rate as the per-proposal floor —
    OPTIMISTIC for the reference, whose single-parameter moves recompute
    incrementally."""
    import jax
    import jax.numpy as jnp

    from physher_tpu.config.builder import build_config, load_json
    from physher_tpu.inference.mcmc import MCMC

    base = os.path.join(os.path.dirname(__file__), "tests", "data")
    cfg = load_json(os.path.join(base, "jc69-time.json"))
    ctx, _ = build_config(cfg, base_dir=base)
    tlk = ctx.objects["treelikelihood"]
    space = tlk.param_space()
    params = space.init_params(dtype=jnp.float32)

    n_chains = 64
    mcmc = MCMC(space, jax.jit(tlk.log_likelihood))
    key = jax.random.PRNGKey(1)

    n_iter = 512

    def run():
        return mcmc.run(key, params, n_iter=n_iter, every=n_iter,
                        n_chains=n_chains)

    run()  # compile + warmup (identical scan shape as the timed runs)
    dt = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    per_s = n_iter * n_chains / dt
    extras["mcmc_64chain_proposals_per_s"] = round(per_s, 1)
    extras["mcmc_vs_ref_cpu_floor"] = round(
        per_s / REF["timetree_logp_per_s"], 2)


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    extras = {"device": str(jax.devices()[0])}
    pps = bench_gtrg4(extras)
    for name, fn in (("wag", bench_wag), ("codon", bench_codon),
                     ("elbo", bench_elbo), ("mcmc", bench_mcmc)):
        try:
            fn(extras)
        except Exception as e:  # keep the primary metric alive
            extras[f"{name}_error"] = f"{type(e).__name__}: {e}"

    result = {
        "metric": "site-patterns/s/chip (GTR+G pruning)",
        "value": round(pps, 1),
        "unit": "patterns/s (value+grad, 128 taxa, Gamma4)",
        "vs_baseline": round(pps / REF["gtrg4_value_grad"], 2),
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
