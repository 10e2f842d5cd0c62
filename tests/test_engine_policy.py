"""Engine auto-selection policy (round 5): the measured regime table in
PARITY.md expressed as unit tests.

- large vmapped chain batches (>= 256) route to the level-array XLA path
  (trace-time BatchTracer probe; measured 2.5-3.7x faster than batched
  Pallas on v5e),
- samplers that wrap their kernels in lax.scan apply engine_override
  ("xla") instead — the probe cannot see through a scan body,
- large state spaces (S >= 16) stay on the XLA path under auto (the
  fused csplit backward costs 3.4x its forward); fused csplit and the
  wide HBM-staged kernel remain explicit opt-ins.

These run on CPU, where every Pallas gate is closed — the tests pin the
SELECTION logic (engine_name, _vmap_batch_size, override routing), not
on-device behavior (tools/smoke_fused_tpu.py covers that).
"""

import jax
import jax.numpy as jnp
import numpy as np

from physher_tpu.models.codon import GY94
from physher_tpu.models.substitution import JC69
from physher_tpu.models.treelikelihood import (
    TreeLikelihood, _vmap_batch_size, engine_override)
from physher_tpu.utils.synthetic import balanced_topology, random_sitepattern


def _tlk(engine="auto", datatype="nucleotide", T=8, P=60):
    topo = balanced_topology(T)
    sp = random_sitepattern(T, P, seed=1, datatype=datatype)
    subst = GY94(fixed_freqs=True) if datatype == "codon" else JC69()
    return TreeLikelihood(sp, topo, subst, engine=engine,
                          pattern_pad_multiple=256, dtype=jnp.float32)


def test_vmap_batch_size_probe():
    seen = []

    def f(x):
        seen.append(_vmap_batch_size(x * 2.0))
        return jnp.sum(x)

    jax.vmap(f)(jnp.ones((300, 4)))
    assert seen[-1] == 300
    # plain jit trace: no batching visible
    seen.clear()
    jax.jit(f)(jnp.ones(4))
    assert seen[-1] is None
    # a scan body is traced abstractly — the probe must NOT see a batch
    seen.clear()

    def g(xs):
        def body(c, x):
            seen.append(_vmap_batch_size(x * 2.0))
            return c, jnp.sum(x)

        return jax.lax.scan(body, 0.0, xs)[1]

    jax.vmap(g)(jnp.ones((300, 5, 4)))
    assert all(s is None for s in seen)


def test_auto_batch_routing_to_xla():
    """Under a >=256-wide vmap the auto selection must resolve to the
    level-array engine; the _engine hook receives the probed size."""
    tlk = _tlk()
    from physher_tpu.ops.pruning import tree_log_likelihood

    assert tlk._engine(vmap_batch=256) is tree_log_likelihood
    assert tlk._engine(vmap_batch=4096) is tree_log_likelihood
    # an explicit override always wins
    with engine_override("pallas-wide"):
        assert tlk._engine(vmap_batch=4096) is not tree_log_likelihood


def test_large_state_auto_is_xla():
    assert _tlk(datatype="codon").engine_name() == "xla"  # on CPU and TPU
    assert _tlk(engine="pallas-wide",
                datatype="codon").engine_name() == "pallas-wide"


def test_mcmc_applies_override_for_large_chain_batches(monkeypatch):
    """MCMC.run must trace its chunk under engine_override('xla') when
    n_chains >= 2 (the probe cannot see through the scan; measured: XLA
    wins inside the MH scan from 2 chains up, ties at 1)."""
    from physher_tpu.inference.mcmc import MCMC
    from physher_tpu.models import treelikelihood as tl
    from physher_tpu.models.parameters import ParamSpace, ParamSpec

    tlk = _tlk()
    space = ParamSpace([ParamSpec.vector(
        "tree.distances", np.full(tlk.topo.N - 1, 0.1), lower=0.0)])
    overrides_seen = []
    orig = tlk._engine

    def spy(vmap_batch=None):
        overrides_seen.append(list(tl._ENGINE_OVERRIDE))
        return orig(vmap_batch=vmap_batch)

    tlk._engine = spy
    mcmc = MCMC(space, tlk.log_likelihood)
    mcmc.run(jax.random.PRNGKey(0), space.init_params(), n_iter=4,
             every=4, n_chains=8)
    assert any(ov and ov[-1] == "xla" for ov in overrides_seen)

    overrides_seen.clear()
    mcmc2 = MCMC(space, tlk.log_likelihood)
    mcmc2.run(jax.random.PRNGKey(0), space.init_params(), n_iter=4,
              every=4, n_chains=1)
    assert all(not ov for ov in overrides_seen)
