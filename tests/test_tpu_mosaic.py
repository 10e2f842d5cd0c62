"""Compiled-Mosaic parity gate (real accelerator only).

The default suite runs interpret-mode Pallas everywhere (conftest pins
JAX_PLATFORMS=cpu process-wide), which cannot catch Mosaic *lowering*
regressions — e.g. block shapes that violate the second-to-minor
divisibility rule compile fine in interpret mode and only fail on a chip
(this exact failure shipped in round 3 for the category-split fused
kernel). This test runs the real-TPU smoke as a subprocess with the
session's accelerator environment.

Opt in with PHYSHER_TPU_DEVICE_TESTS=1 (needs an attached TPU; takes a
few minutes of Mosaic compiles):

    PHYSHER_TPU_DEVICE_TESTS=1 python -m pytest tests/test_tpu_mosaic.py -v
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("PHYSHER_TPU_DEVICE_TESTS") != "1",
    reason="set PHYSHER_TPU_DEVICE_TESTS=1 with an attached TPU")
def test_fused_kernel_compiled_mosaic_parity():
    env = dict(os.environ)
    # undo the conftest CPU pin for the child; the smoke script bootstraps
    # sys.path itself (PYTHONPATH=REPO shadows an axon plugin module and
    # breaks accelerator discovery)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "smoke_fused_tpu.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
