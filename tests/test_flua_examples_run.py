"""The reference's fluA example configs RUN end-to-end (not just build).

Round-3 review: the config smoke only asserted the object graph built —
a broken action wiring for these exact configs would pass CI. Here every
fluA example executes its full "physher" action list through the Runner
with iteration counts capped for CI time (the actions and models are the
reference's own: /root/reference/examples/fluA/*.json, run flow
src/physher.c:207-305).
"""

import copy
import glob
import os
import shutil

import numpy as np
import pytest

FLUA = "/root/reference/examples/fluA"
NAMES = sorted(os.path.basename(p)
               for p in glob.glob(os.path.join(FLUA, "*.json"))) \
    if os.path.isdir(FLUA) else []

# CI caps per action key (reference keys: optimizer.c max, mcmc length)
CAPS = {"length": 64, "max": 40, "steps": 4, "temperatures": 3,
        "burnin": 8, "every": 16, "rounds": 1}


def _cap(node):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in CAPS and isinstance(v, (int, float)):
                out[k] = min(int(v), CAPS[k])
            else:
                out[k] = _cap(v)
        if str(node.get("type", "")).lower() == "optimizer":
            out.setdefault("tol", 0.5)
            out["tol"] = max(float(out.get("tol", 0.5)), 0.5)
            out["starts"] = 1
        return out
    if isinstance(node, list):
        return [_cap(v) for v in node]
    return node


@pytest.mark.skipif(not NAMES, reason="reference examples not mounted")
@pytest.mark.parametrize("name", NAMES)
def test_flua_example_runs(name, tmp_path):
    from physher_tpu.config.actions import Runner
    from physher_tpu.config.builder import build_config, load_json

    for f in ("fluA.fa", "fluA-rooted.nxs"):
        shutil.copy(os.path.join(FLUA, f), tmp_path / f)
    cfg = load_json(os.path.join(FLUA, name))
    cfg = copy.deepcopy(cfg)
    cfg["physher"] = _cap(cfg.get("physher", []))
    ctx, actions = build_config(cfg, base_dir=str(tmp_path))
    runner = Runner(ctx, seed=1)
    results = runner.run(actions)
    assert results, f"{name}: no action produced a result"
    for rid, res in results.items():
        arr = getattr(res, "log_posterior", getattr(res, "logp", None))
        if arr is not None:
            assert np.isfinite(np.asarray(arr)).all(), (name, rid)
