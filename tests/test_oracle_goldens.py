"""Parity with reference-oracle golden values on tiny.fa NJ-tree models.

Fixtures under tests/data/goldens/ were produced by tools/reforacle.c (a
driver linking the REFERENCE libphyc) evaluating each config: logP, the
resolved tree, and branch-length gradients. Node ids in the fixtures follow
the reference's id scheme, which Topology reproduces by construction.
"""

import json
import os
import re

import jax
import numpy as np
import pytest

from physher_tpu.config.builder import build_config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data", "goldens")

CASES = ["jc69nj", "hky2", "gtrg4", "jc69w4", "gtrg4_fluA"]


def parse_golden(path):
    logp = None
    node_ids = []  # postorder order, including root last
    grads = []
    fd_grads = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("logP "):
                logp = float(line.split()[1])
            elif line.startswith("node "):
                m = re.match(r"node \S+ id (\d+) distance (\S+)", line)
                node_ids.append(int(m.group(1)))
            elif line.startswith("dlogP_distance "):
                _, idx, val = line.split()
                grads.append(float(val))
            elif line.startswith("dlogP_fd "):
                _, idx, val = line.split()
                fd_grads.append(float(val))
    return logp, node_ids, grads, fd_grads


@pytest.mark.parametrize("case", CASES)
def test_golden(case, data_dir):
    cfg = json.load(open(os.path.join(GOLDEN_DIR, f"{case}.json")))
    ctx, _ = build_config(cfg, base_dir=data_dir)
    tlk = ctx.objects["treelikelihood"]
    params = tlk.param_space().init_params()

    logp_ref, node_ids, grads_ref, fd_ref = parse_golden(
        os.path.join(GOLDEN_DIR, f"{case}.txt"))

    logp = float(jax.jit(tlk.log_likelihood)(params))
    # rtol covers f64 eigendecomposition noise (our symmetrized eigh vs the
    # reference's Hessenberg/hqr) accumulating over sites on the 69-taxon
    # fluA case (measured 2.4e-9 relative); small cases agree to 1e-11
    np.testing.assert_allclose(logp, logp_ref, rtol=5e-9, atol=2e-8)

    grad = jax.jit(jax.grad(tlk.log_likelihood))(params)
    g = np.asarray(grad["tree.distances"])  # indexed by node id, root absent

    root = tlk.topo.root
    root_children = set(
        int(c) for c in tlk.topo.children[root - tlk.topo.T][
            : tlk.topo.child_count[root - tlk.topo.T]]
    )
    nonroot_ids = [i for i in node_ids if i != root]

    # Primary parity: reference FD gradients (dlogP_fd, central differences
    # of the REFERENCE's own logP, eps=1e-7). For HKY/GTR the reference's
    # ANALYTIC branch gradient is wrong — measured against the FD of its own
    # likelihood it errs by up to 2.1x (HKY) / 0.65x (GTR) relative, while
    # JC69 agrees to <=4e-7 (see PARITY.md "Gradient conventions"). Our
    # autodiff must match the FD. Root children: wiggling either folded root
    # edge changes the same effective branch, so FD == sum-gradient on both,
    # which is exactly what our per-child gradient reports.
    # atol covers the FD's own bias at (near-)zero-length edges, where the
    # one-sided step picks up O(f''*eps) curvature (f'' ~ 1e5 there); the
    # reference-analytic errors this guards against are O(50-1000)
    assert len(nonroot_ids) == len(fd_ref)
    for nid, fd in zip(nonroot_ids, fd_ref):
        np.testing.assert_allclose(g[nid], fd, rtol=5e-4, atol=5e-2)

    if case.startswith("jc69"):
        # For JC69 the reference's analytic gradient is also correct —
        # compare against it at tight tolerance.
        assert len(nonroot_ids) == len(grads_ref)
        for nid, gref in zip(nonroot_ids, grads_ref):
            if nid in root_children:
                # the reference folds the two root edges into one: it reports
                # the full gradient on one child and 0 on the other; ours
                # reports the (equal) sum-gradient on both (reversible model)
                if gref == 0.0:
                    continue
                np.testing.assert_allclose(g[nid], gref, rtol=1e-6)
            else:
                np.testing.assert_allclose(g[nid], gref, rtol=1e-6, atol=1e-9)

    # autodiff vs central finite differences of our own logP (all cases)
    f = jax.jit(tlk.log_likelihood)
    eps = 1e-6
    for nid in [0, 1, tlk.topo.T]:
        d = np.asarray(params["tree.distances"], dtype=np.float64)
        dp, dm = d.copy(), d.copy()
        dp[nid] += eps
        dm[nid] -= eps
        fd = (float(f({**params, "tree.distances": dp}))
              - float(f({**params, "tree.distances": dm}))) / (2 * eps)
        np.testing.assert_allclose(g[nid], fd, rtol=5e-4, atol=1e-6)
