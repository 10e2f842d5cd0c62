"""fluA ELBO parity with the reference (BASELINE "ELBO trajectories to
tolerance").

The model graph is built from the reference's own config
(examples/fluA/JC69-time-ELBO.json) through the config layer; the fit uses
the same schedule the reference uses (Adam with eta/sqrt(t) decay,
gradascent.c:257) and must converge within tolerance of the committed
reference optimum (tests/data/goldens/fluA_elbo.json, minted by running
the full reference binary — tools/build_reference_full.sh — at 4 seeds).
"""

import json
import os

import jax
import numpy as np
import pytest

from physher_tpu.config.builder import build_config, load_json

REF_CFG = "/root/reference/examples/fluA/JC69-time-ELBO.json"


@pytest.mark.skipif(not os.path.exists(REF_CFG),
                    reason="reference examples not mounted")
def test_flua_elbo_matches_reference(data_dir):
    golden = json.load(open(f"{data_dir}/goldens/fluA_elbo.json"))
    cfg = load_json(REF_CFG)
    ctx, actions = build_config(cfg, base_dir=os.path.dirname(REF_CFG))
    vh = ctx.objects["varnormal"]
    assert actions and actions[0]["algorithm"] == "sg"
    assert vh.elbo_samples == 100 and vh.grad_samples == 1

    from physher_tpu.inference import vb as vb_mod

    res = vb_mod.fit(vh.family, jax.random.PRNGKey(0), steps=6000,
                     learning_rate=float(actions[0]["eta"]),
                     grad_samples=1, elbo_samples=100, tol=1e-5)
    # low-noise evaluation of the converged variational distribution
    elbo = float(vh.family.elbo(res.vparams, jax.random.PRNGKey(123), 2000))
    ref = golden["reference_elbo"]
    tol = golden["tolerance_nats"]
    assert abs(elbo - ref) < tol, (elbo, ref)
