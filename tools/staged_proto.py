"""Prototype: staged block-diagonal pruning kernel (forward only).

Each step processes B internal nodes as ONE [R,R]@[R,TILE] MXU dot where
R = B*maxc*C*S and the [R,R] matrix is block-diagonal with the children's
per-category P matrices. Node outputs are written directly into the input
slot of their parent's step ("staging"), so steps read one contiguous block.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from physher_tpu.trees.topology import Topology
from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern

TILE = 128
_PREC = [None]


def staged_schedule(topo: Topology, B: int):
    """Assign internal nodes to steps of B (postorder-compatible), and each
    node/tip a consumer slot (step, slot_index).

    Returns dict of numpy arrays:
      n_steps
      node_step[k], node_pos[k]   : step and position (0..B-1) of internal k
      cons_step[n], cons_slot[n]  : consumer step/slot of node id n (root ->
                                    extra virtual step n_steps, slot 0)
      child_id[s, B*maxc]         : node id feeding each slot (-1 = none)
    """
    I, T, maxc = topo.I, topo.T, int(topo.child_count.max())
    # level-scheduled packing: nodes of one level are mutually independent,
    # and all their children live in strictly earlier levels, so packing
    # level-by-level guarantees every step's inputs were produced by earlier
    # steps (all B nodes of a step read before any write lands)
    node_step = np.zeros(I, dtype=np.int64)
    node_pos = np.zeros(I, dtype=np.int64)
    cur = 0
    for ranks in topo.levels:
        for i, k in enumerate(ranks):
            node_step[k] = cur + i // B
            node_pos[k] = i % B
        cur += (len(ranks) + B - 1) // B
    n_steps = cur
    cons_step = np.full(topo.N, n_steps, dtype=np.int32)
    cons_slot = np.zeros(topo.N, dtype=np.int32)
    child_id = np.full((n_steps, B * maxc), -1, dtype=np.int32)
    for k in range(I):
        s, b = node_step[k], node_pos[k]
        for j in range(int(topo.child_count[k])):
            ch = int(topo.children[k, j])
            slot = j * B + b
            cons_step[ch] = s
            cons_slot[ch] = slot
            child_id[s, slot] = ch
    return dict(n_steps=n_steps, node_step=node_step.astype(np.int32),
                node_pos=node_pos.astype(np.int32),
                cons_step=cons_step.astype(np.int32),
                cons_slot=cons_slot.astype(np.int32), child_id=child_id,
                maxc=maxc)


def build_block_pmats(pmats, sched, C, S, B):
    """[n_steps, R, R] block-diagonal step matrices from pmats [N, C, S, S].

    Rows/cols: slot-major, then category, then state. Dummy slots get zero
    blocks (their input rows are zero; output fixed to 1 via mask later).
    """
    maxc = sched["maxc"]
    n_steps = sched["n_steps"]
    CS = C * S
    Rb = B * CS
    child = sched["child_id"].reshape(n_steps, maxc, B)   # slot = j*B + b
    csafe = np.maximum(child, 0)
    ssx, jx, bx, ccx, iix, jjx = np.meshgrid(
        np.arange(n_steps), np.arange(maxc), np.arange(B), np.arange(C),
        np.arange(S), np.arange(S), indexing="ij")
    rows = bx * CS + ccx * S + iix
    cols = bx * CS + ccx * S + jjx
    vals = pmats[csafe[ssx, jx, bx], ccx, iix, jjx]
    vals = jnp.where(jnp.asarray(child[ssx, jx, bx] >= 0), vals, 0.0)
    blockP = jnp.zeros((n_steps, maxc, Rb, Rb), pmats.dtype)
    blockP = blockP.at[ssx, jx, rows, cols].set(vals)
    return blockP


def _kernel(C, S, B, maxc, n_steps, T, n_zero, rescale,
            tipcons_ref, nodecons_ref, zrows_ref, valid_ref,
            tips_ref, blockP_ref, rootw_ref, site_log_ref,
            stage, scal_acc):
    from jax.experimental import pallas as pl

    f32 = tips_ref.dtype
    CS = C * S
    R = B * maxc * CS

    # zero never-produced rows (uninitialized VMEM would poison the dot)
    def init_zero(i, _):
        r = pl.multiple_of(zrows_ref[i, 1], CS)
        stage[zrows_ref[i, 0], pl.ds(r, CS)] = jnp.zeros((CS, TILE), f32)
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_zero), init_zero,
                      jnp.int32(0))

    # stage tips into their consumer slots
    def init_tip(t, _):
        tp = tips_ref[pl.ds(t, 1)][0]                  # [S, TILE]
        exp = jnp.broadcast_to(tp[None], (C, S, TILE)).reshape(CS, TILE)
        s = tipcons_ref[t, 0]
        r = pl.multiple_of(tipcons_ref[t, 1], CS)
        stage[s, pl.ds(r, CS)] = exp
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), init_tip, jnp.int32(0))
    scal_acc[0, :] = jnp.zeros((TILE,), f32)

    Rb = B * CS

    def step(s, _):
        res = None
        for j in range(maxc):
            stacked = stage[s, pl.ds(j * Rb, Rb)]      # [Rb, TILE]
            bp = blockP_ref[s, j]                      # [Rb, Rb]
            contrib = jnp.dot(bp, stacked, preferred_element_type=f32,
                              precision=_PREC[0])
            v = valid_ref[s][:, None][j * Rb:(j + 1) * Rb]  # [Rb, 1]
            contrib = contrib * v + (1.0 - v)
            res = contrib if res is None else res * contrib  # [Rb, TILE]
        if rescale == "exp":
            # exponent-only rescale: m = 2^(e-127) from the exponent bits of
            # the per-node max; division becomes an exponent flip (exact),
            # log m = (e-127)*ln2 (exact) — no transcendental per step
            esum = None
            for b in range(B):
                rb = res[b * CS:(b + 1) * CS]
                m = jnp.max(rb, axis=0, keepdims=True)             # [1, TILE]
                bits = jax.lax.bitcast_convert_type(
                    jnp.maximum(m, jnp.finfo(f32).tiny), jnp.int32)
                e = (bits >> 23) & 0xFF
                inv_m = jax.lax.bitcast_convert_type((254 - e) << 23, f32)
                rb = rb * inv_m
                esum = e if esum is None else esum + e
                ps = nodecons_ref[s, b, 0]
                pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
                stage[ps, pl.ds(pr, CS)] = rb
            scal_acc[:, :] = scal_acc[:, :] + (
                esum.astype(f32) - np.float32(127.0 * B)
            ) * np.float32(np.log(2.0))
        elif rescale:
            logm_sum = None
            for b in range(B):
                rb = res[b * CS:(b + 1) * CS]
                m = jnp.max(rb, axis=0, keepdims=True)     # [1, TILE]
                m = jnp.maximum(m, jnp.finfo(f32).tiny)
                rb = rb / m
                lm = jnp.log(m)
                logm_sum = lm if logm_sum is None else logm_sum + lm
                ps = nodecons_ref[s, b, 0]
                pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
                stage[ps, pl.ds(pr, CS)] = rb
            scal_acc[:, :] = scal_acc[:, :] + logm_sum
        else:
            for b in range(B):
                ps = nodecons_ref[s, b, 0]
                pr = pl.multiple_of(nodecons_ref[s, b, 1], CS)
                stage[ps, pl.ds(pr, CS)] = res[b * CS:(b + 1) * CS]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, jnp.int32(0))

    rp = stage[n_steps, pl.ds(0, CS)]                  # [CS, TILE]
    site = jnp.dot(rootw_ref[:], rp, preferred_element_type=f32)[0]
    site = jnp.maximum(site, jnp.finfo(f32).tiny)
    site_log_ref[0, :] = jnp.log(site) + scal_acc[0, :]


def build_staged_forward(topo, C, S, P, B=4, interpret=False,
                         dtype=jnp.float32, tile=None, rescale=True):
    global TILE
    if tile is not None:
        TILE = tile
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched = staged_schedule(topo, B)
    maxc, n_steps = sched["maxc"], sched["n_steps"]
    CS = C * S
    R = B * maxc * CS
    T = topo.T
    n_tiles = P // TILE

    # prefetch arrays
    tipcons = np.stack([sched["cons_step"][:T],
                        sched["cons_slot"][:T] * CS], axis=1).astype(np.int32)
    # default consumer = scratch slot (virtual step n_steps, just after the
    # root rows) so unfilled node positions never clobber live data
    nodecons = np.full((n_steps, B, 2), (n_steps, CS), np.int32)
    for k in range(topo.I):
        s, b = sched["node_step"][k], sched["node_pos"][k]
        n = topo.T + k
        nodecons[s, b, 0] = sched["cons_step"][n]
        nodecons[s, b, 1] = sched["cons_slot"][n] * CS

    validf = np.zeros((n_steps, R), np.float32)
    for s in range(n_steps):
        for sl in range(B * maxc):
            if sched["child_id"][s, sl] >= 0:
                validf[s, sl * CS:(sl + 1) * CS] = 1.0

    # stage rows never written by a producer (dummy child slots) must be
    # zeroed: VMEM scratch is uninitialized and 0*garbage in the dot would
    # poison the masked lanes
    zrows = [(s, sl * CS) for s in range(n_steps)
             for sl in range(B * maxc) if sched["child_id"][s, sl] < 0]
    zrows = np.asarray(zrows if zrows else [(0, 0)], np.int32)
    n_zero = len(zrows)

    kernel = partial(_kernel, C, S, B, maxc, n_steps, T, n_zero, rescale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                # tipcons, nodecons, zrows
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_steps, R), lambda p, *_: (0, 0)),   # valid
            pl.BlockSpec((T, S, TILE), lambda p, *_: (0, 0, p)),
            pl.BlockSpec((n_steps, maxc, B * CS, B * CS),
                         lambda p, *_: (0, 0, 0, 0)),
            pl.BlockSpec((1, CS), lambda p, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda p, *_: (0, p)),
        scratch_shapes=[
            pltpu.VMEM((n_steps + 1, R, TILE), dtype),
            pltpu.VMEM((1, TILE), dtype),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, P), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    tipcons_j = jnp.asarray(tipcons)
    nodecons_j = jnp.asarray(nodecons)
    zrows_j = jnp.asarray(zrows)
    valid_j = jnp.asarray(validf, dtype)

    def fn(tip_partials, pmats, freqs, props):
        blockP = build_block_pmats(pmats, sched, C, S, B).astype(dtype)
        rootw = (props[:, None] * freqs[None, :]).reshape(1, CS).astype(dtype)
        out = call(tipcons_j, nodecons_j, zrows_j, valid_j, tip_partials,
                   blockP, rootw)
        return out[0]

    return fn


def main():
    n_tips, n_patterns, C, S = 128, 16384, 4, 4
    topo = balanced_topology(n_tips)
    sp = random_sitepattern(n_tips, n_patterns, seed=7)
    P = n_patterns
    tp = sp.tip_partials(pad_to=P, dtype=np.float64)
    order = [sp.taxa.index(t) for t in topo.taxa]
    tips = jnp.asarray(tp[order], jnp.float32)

    key = jax.random.PRNGKey(0)
    # random-ish valid pmats: rows sum to 1
    raw = jax.random.uniform(key, (topo.N, C, S, S), jnp.float32) + 0.1
    pmats = raw / raw.sum(-1, keepdims=True)
    freqs = jnp.full((S,), 0.25, jnp.float32)
    props = jnp.full((C,), 1.0 / C, jnp.float32)

    # reference: XLA engine
    from physher_tpu.ops.pruning import tree_log_likelihood
    weights = jnp.asarray(sp.padded_weights(P), jnp.float32)
    ref_logL, ref_site = jax.jit(lambda *a: tree_log_likelihood(
        a[0], a[1], topo, a[2], a[3], a[4], rescale=True))(
        tips, pmats, freqs, props, weights)

    import jax.lax as lax
    for B, tile, prec, resc in [
            (8, 256, None, True), (8, 256, None, False), (8, 256, None, "exp"),
            (8, 512, None, "exp"), (16, 512, None, "exp"),
            (8, 256, lax.Precision.HIGHEST, True),
            (8, 512, None, True), (16, 256, None, "exp")]:
        _PREC[0] = prec
        fn = jax.jit(build_staged_forward(topo, C, S, P, B=B, tile=tile,
                                          rescale=resc))
        site = fn(tips, pmats, freqs, props)
        err = float(jnp.max(jnp.abs(site - ref_site)))
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            site = fn(tips, pmats, freqs, props)
        jax.block_until_ready(site)
        dt = (time.perf_counter() - t0) / n
        print(f"B={B} tile={tile} prec={prec} resc={resc}: max|err|={err:.2e}  "
              f"fwd {dt*1e3:7.3f} ms  "
              f"{n_patterns/dt/1e6:7.3f} M patterns/s", flush=True)

    # current loop kernel forward for comparison
    from physher_tpu.ops.pallas_pruning_loop import build_loop_forward
    fn0 = jax.jit(build_loop_forward(topo, C, S, P))
    site0 = fn0(tips, pmats, freqs, props)
    err0 = float(jnp.max(jnp.abs(site0 - ref_site)))
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        site0 = fn0(tips, pmats, freqs, props)
    jax.block_until_ready(site0)
    dt = (time.perf_counter() - t0) / n
    print(f"loop: max|err|={err0:.2e}  fwd {dt*1e3:7.3f} ms  "
          f"{n_patterns/dt/1e6:7.3f} M patterns/s")


if __name__ == "__main__":
    main()
