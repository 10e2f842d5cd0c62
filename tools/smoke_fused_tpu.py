"""Real-TPU compiled-Mosaic smoke for EVERY selectable Pallas engine.

Compares logP and pmat/freq gradients between the XLA engine (bf16x3
"high" einsums, ~1e-6 accurate) and each Pallas kernel compiled as real
Mosaic on the attached TPU — the lowering path interpret-mode CI cannot
exercise (a csplit block-spec violation shipped in round 3, and the
round-3 "vmap miscompute" was really Mosaic's DEFAULT bf16 dot precision,
both invisible to interpret mode). Covers:

- fused engine, packed (S=4) and category-split (S=20/61) modes
- fused engine at the flagship 128-taxa GTR+G4 shape (the bench shape)
- fused engine under vmap (batch -> leading grid axis lowering)
- staged and loop engines (incl. the staged flagship shape)
- shard_map + fused kernel on a 1-device mesh (the multi-chip code path)

Run: python tools/smoke_fused_tpu.py
(sys.path bootstrap instead of PYTHONPATH: prepending the repo root to
PYTHONPATH shadows a module the axon TPU plugin needs and kills backend
discovery)
"""
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from physher_tpu.ops.pallas_fused import TILE, fused_tree_log_likelihood
from physher_tpu.ops.pallas_staged import staged_tree_log_likelihood
from physher_tpu.ops.pallas_pruning_loop import loop_tree_log_likelihood
from physher_tpu.ops.pallas_wide import wide_tree_log_likelihood
from physher_tpu.ops.pruning import pad_patterns, tree_log_likelihood
from physher_tpu.utils.synthetic import balanced_topology

ENGINES = {
    "fused": fused_tree_log_likelihood,
    "staged": staged_tree_log_likelihood,
    "loop": loop_tree_log_likelihood,
    "wide": wide_tree_log_likelihood,
}


def setup(S, C, n_tips=16, n_sites=500, seed=0):
    topo = balanced_topology(n_tips)
    rng = np.random.default_rng(seed)
    P = pad_patterns(n_sites, TILE)
    states = rng.integers(0, S, size=(n_tips, n_sites))
    tips = np.zeros((n_tips, S, P), np.float32)
    tips[:, :, n_sites:] = 1.0  # pad sites resolve like gaps (all-ones)
    for t in range(n_tips):
        tips[t, states[t], np.arange(n_sites)] = 1.0
    order = [topo.taxa.index(f"t{i}") for i in range(n_tips)] \
        if hasattr(topo, "taxa") and topo.taxa else list(range(n_tips))
    tips = jnp.asarray(tips[order])
    Q = rng.random((topo.N, C, S, S)).astype(np.float32) + 0.1
    pm = jnp.asarray(Q / Q.sum(-1, keepdims=True))
    fr = rng.random(S).astype(np.float32)
    freqs = jnp.asarray(fr / fr.sum())
    props = jnp.asarray(
        (np.arange(1, C + 1) / (C * (C + 1) / 2)).astype(np.float32))
    w = np.zeros(P, np.float32)
    w[:n_sites] = 1.0
    return topo, tips, pm, freqs, props, jnp.asarray(w)


def _f64_truth(topo, tips, pm, freqs, props, w):
    """f64 logP + gradients on CPU: the absolute anchor (the reference's
    arithmetic is f64; a silent bf16 drop in either TPU path shows up as a
    large deviation from this, which engine-vs-engine comparison missed in
    rounds 2-3). x64 is scoped to this block: enabling it globally makes
    the Pallas index maps emit i64, which Mosaic rejects."""
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        c = lambda a: jax.device_put(
            jnp.asarray(np.asarray(a), jnp.float64), cpu)
        tips64, pm64, fr64, pr64, w64 = map(c, (tips, pm, freqs, props, w))

        def f(pm_, fr_):
            ll, _ = tree_log_likelihood(tips64, pm_, topo, fr_, pr64, w64,
                                        rescale=True)
            return ll

        l64 = float(f(pm64, fr64))
        g64 = jax.grad(f, argnums=(0, 1))(pm64, fr64)
        g64 = tuple(np.asarray(a) for a in g64)
    return l64, g64


def check(name, S, C, engine="fused", n_tips=16, n_sites=500):
    topo, tips, pm, freqs, props, w = setup(S, C, n_tips, n_sites)
    eng = ENGINES[engine]
    l64, g64 = _f64_truth(topo, tips, pm, freqs, props, w)

    def f_p(pm_, fr_):
        ll, _ = eng(tips, pm_, topo, fr_, props, w)
        return ll

    lp = float(jax.jit(f_p)(pm, freqs))
    gp = jax.jit(jax.grad(f_p, argnums=(0, 1)))(pm, freqs)
    gdiff = max(
        float(np.max(np.abs(np.asarray(b, np.float64) - a))
              / (1e-6 + np.max(np.abs(a))))
        for a, b in zip(g64, gp))
    print(f"{engine}/{name}: f64={l64:.4f} pallas={lp:.4f} "
          f"absdiff={abs(l64 - lp):.2e} rel-gdiff={gdiff:.2e}", flush=True)
    # HIGHEST-precision kernels sit within f32 noise of f64 truth (~1e-7
    # in interpret mode); the round-3 bf16 regression was ~1e-2 relative
    # logP / ~4e-3 gradients, orders above these gates
    assert abs(l64 - lp) < 3e-5 * abs(l64) + 0.05, (l64, lp)
    assert gdiff < 2e-4, gdiff


def check_vmap(S=4, C=4):
    """vmap lowers onto the fused kernel's leading grid axis on-device."""
    topo, tips, pm, freqs, props, w = setup(S, C)
    pms = jnp.stack([pm, pm * 1.01 + 0.001, pm * 0.99, pm * 1.001])

    def f(pm_):
        ll, _ = fused_tree_log_likelihood(tips, pm_, topo, freqs, props, w)
        return ll

    single = jnp.stack([jax.jit(f)(p) for p in pms])
    batched = jax.jit(jax.vmap(f))(pms)
    fdiff = float(jnp.max(jnp.abs(single - batched)))
    g_single = jnp.stack([jax.jit(jax.grad(f))(p) for p in pms])
    g_batched = jax.jit(jax.vmap(jax.grad(f)))(pms)
    gdiff = float(jnp.max(jnp.abs(g_single - g_batched))
                  / (1e-9 + float(jnp.max(jnp.abs(g_single)))))
    print(f"fused/vmap4: max|logP diff|={fdiff:.2e} "
          f"rel grad diff={gdiff:.2e}", flush=True)
    # L=4 vs L=1 grids may schedule the multi-pass f32 dots differently;
    # tiny f32-level drift is expected, the round-3 failure was ~54 units
    assert fdiff < 1e-6 * float(jnp.max(jnp.abs(single))) + 1e-3, fdiff
    assert gdiff < 1e-5, gdiff


def check_shard_map():
    """shard_map + fused kernel compiled on a 1-device mesh (the exact
    multi-chip code path, minus the collectives fabric)."""
    from physher_tpu.parallel.mesh import pattern_mesh, shard_map_fused_engine

    topo, tips, pm, freqs, props, w = setup(4, 4)
    mesh = pattern_mesh(1)
    run = shard_map_fused_engine(mesh)

    def f_s(pm_):
        ll, _ = run(tips, pm_, topo, freqs, props, w)
        return ll

    def f_x(pm_):
        ll, _ = tree_log_likelihood(tips, pm_, topo, freqs, props, w,
                                    rescale=True)
        return ll

    lx, ls = float(jax.jit(f_x)(pm)), float(jax.jit(f_s)(pm))
    gx = jax.jit(jax.grad(f_x))(pm)
    gs = jax.jit(jax.grad(f_s))(pm)
    gdiff = float(jnp.max(jnp.abs(gx - gs)) / (1e-6 + jnp.max(jnp.abs(gx))))
    print(f"fused/shard_map(1dev): xla={lx:.4f} sharded={ls:.4f} "
          f"rel-gdiff={gdiff:.2e}", flush=True)
    assert abs(lx - ls) < 2e-5 * abs(lx) + 0.05
    assert gdiff < 1e-3


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    check("S=20 C=4 (csplit, WAG-shaped)", 20, 4)
    check("S=61 C=1 (csplit, codon-shaped)", 61, 1, n_tips=32,
          n_sites=1024)
    check("S=4  C=4 (packed)", 4, 4)
    check("S=4 C=4 128-taxa flagship", 4, 4, n_tips=128, n_sites=4096)
    check("S=4 C=4 128-taxa flagship", 4, 4, engine="staged",
          n_tips=128, n_sites=4096)
    check("S=4 C=4 (loop)", 4, 4, engine="loop")
    # the wide HBM-staged kernel's target regime: large-S trees past the
    # fused VMEM gate (round-4 review ask: on-device 64-taxa codon parity)
    check("S=61 C=1 64-taxa codon", 61, 1, engine="wide", n_tips=64,
          n_sites=1024)
    check("S=20 C=4 256-taxa WAG", 20, 4, engine="wide", n_tips=256,
          n_sites=512)
    check_vmap()
    check_shard_map()
    print("OK", flush=True)
