"""GA / SA engines, model averaging, symbolic diff, local clocks, GSS.

Reference parity: src/phyc/ga.c, sa.c, modelavg.c, symdiff.c,
branchmodel.c CLOCK_LOCAL, mmcmc.c GSS.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from physher_tpu.inference.ga import GeneticAlgorithm, SimulatedAnnealing
from physher_tpu.inference import modelavg
from physher_tpu.utils import symdiff


class TestGA:
    def test_onemax(self):
        # classic onemax: maximize number of ones
        ga = GeneticAlgorithm(lambda pop: pop.sum(axis=1), length=30,
                              n_states=2, pop_size=60, rng=0)
        res = ga.run(generations=150, max_no_improvement=40)
        assert res.best_fitness >= 28

    def test_chc_mode(self):
        target = np.array([2, 0, 1, 2, 1, 0, 0, 2] * 3)
        ga = GeneticAlgorithm(
            lambda pop: -(pop != target).sum(axis=1), length=len(target),
            n_states=3, pop_size=80, chc=True, rng=1)
        res = ga.run(generations=200, max_no_improvement=60)
        assert res.best_fitness >= -2

    def test_init_seed_respected(self):
        init = np.ones(10, dtype=int)
        ga = GeneticAlgorithm(lambda pop: pop.sum(axis=1), length=10,
                              pop_size=10, rng=0)
        res = ga.run(generations=1, init=init)
        assert res.best_fitness >= 10  # seeded optimum survives elitism


class TestSA:
    def test_quadratic_encoding(self):
        # minimize distance of the 2-digit decimal encoding to 37
        def energy(state):
            return (10 * state[0] + state[1] - 37) ** 2

        sa = SimulatedAnnealing(energy, length=2, n_states=10,
                                initial_temp=20.0, cooling=0.9, rng=0)
        res = sa.run(max_no_improvement=500)
        assert res.best_energy == 0


class TestModelAvg:
    LOG = """#NEXUS
begin trees;
tree TREE1 [&LnL=-10.0,IC=20.0] = ((a[&rate=1.0]:0.1,b[&rate=2.0]:0.2)[&rate=3.0]:0.1,c[&rate=4.0]:0.3);
tree TREE2 [&LnL=-11.0,IC=22.0] = ((a[&rate=2.0]:0.1,b[&rate=4.0]:0.2)[&rate=5.0]:0.1,c[&rate=6.0]:0.3);
end;
"""

    def test_ic_weights(self):
        w = modelavg.ic_weights([20.0, 22.0])
        assert abs(w[0] / w[1] - math.exp(1.0)) < 1e-12
        assert abs(w.sum() - 1.0) < 1e-12

    def test_average_from_log(self):
        out = modelavg.model_average_from_log(self.LOG, "rate")
        w = modelavg.ic_weights([20.0, 22.0])
        key_a = frozenset({"a"})
        expect = w[0] * 1.0 + w[1] * 2.0
        assert abs(out.mean[key_a] - expect) < 1e-12
        assert out.min[key_a] == 1.0 and out.max[key_a] == 2.0
        key_ab = frozenset({"a", "b"})
        assert abs(out.mean[key_ab] - (w[0] * 3.0 + w[1] * 5.0)) < 1e-12


class TestSymdiff:
    def test_polynomial(self):
        d = symdiff.differentiate("x^3 + 2*x", "x")
        for x in (0.3, 1.7, -2.0):
            assert abs(symdiff.evaluate(d, {"x": x})
                       - (3 * x * x + 2)) < 1e-12

    def test_product_quotient_chain(self):
        expr = "sin(x^2) * exp(x) / (1 + x^2)"
        d = symdiff.differentiate(expr, "x")
        for x in (0.2, 1.1):
            eps = 1e-6
            fd = (symdiff.evaluate(expr, {"x": x + eps})
                  - symdiff.evaluate(expr, {"x": x - eps})) / (2 * eps)
            assert abs(symdiff.evaluate(d, {"x": x}) - fd) < 1e-5

    def test_multivar_and_constants(self):
        assert symdiff.differentiate("y*x + y^2", "x") == "y"
        assert symdiff.evaluate(
            symdiff.differentiate("log(x*y)", "y"), {"x": 3.0, "y": 2.0}
        ) == 0.5

    def test_compile_jax_matches_grad(self):
        fn = symdiff.compile_jax("x^2 * sin(y)", ["x", "y"])
        g = jax.grad(fn, argnums=0)(1.5, 0.7)
        d = symdiff.differentiate("x^2 * sin(y)", "x")
        assert abs(float(g)
                   - symdiff.evaluate(d, {"x": 1.5, "y": 0.7})) < 1e-10


class TestLocalClock:
    def test_class_map(self):
        from physher_tpu.io.treeio import read_newick
        from physher_tpu.models.clock import LocalClock
        topo, _ = read_newick("((a:1,b:1):1,(c:1,d:1):1);")
        # activate the internal node above (a, b)
        ind = np.zeros(topo.N, dtype=bool)
        ab = int(topo.parent[topo.taxa.index("a")])
        ind[ab] = True
        clock = LocalClock(topo, ind, rates_init=np.array([1e-3, 5e-3]))
        cmap = clock.class_map
        assert cmap[topo.taxa.index("a")] == 1
        assert cmap[topo.taxa.index("b")] == 1
        assert cmap[ab] == 1
        assert cmap[topo.taxa.index("c")] == 0
        params = clock.param_space().init_params()
        r = np.asarray(clock.rates(params))
        assert r[topo.taxa.index("a")] == 5e-3
        assert r[topo.taxa.index("c")] == 1e-3

    def test_ga_local_clock_search(self):
        # GA over indicator placements prefers the true local clock
        from physher_tpu.io.treeio import read_newick
        from physher_tpu.models.clock import LocalClock
        topo, _ = read_newick("((a:1,b:1):1,(c:1,d:1):1);")
        true_ind = np.zeros(topo.N, dtype=bool)
        ab = int(topo.parent[topo.taxa.index("a")])
        true_ind[ab] = True
        true_map = LocalClock.class_map_from_indicators(topo, true_ind)

        def fitness(pop):
            # toy score: agreement with the true class partition
            out = []
            for row in pop:
                cmap = LocalClock.class_map_from_indicators(
                    topo, row.astype(bool))
                # compare partitions up to labeling on non-root nodes
                agree = sum(
                    (cmap[i] == cmap[j]) == (true_map[i] == true_map[j])
                    for i in range(topo.N - 1) for j in range(i))
                out.append(agree - 2 * row.sum())  # parsimony pressure
            return np.array(out)

        ga = GeneticAlgorithm(fitness, length=topo.N, n_states=2,
                              pop_size=30, rng=0)
        res = ga.run(generations=60, max_no_improvement=25)
        found = LocalClock.class_map_from_indicators(topo,
                                                     res.best.astype(bool))
        same = all((found[i] == found[j]) == (true_map[i] == true_map[j])
                   for i in range(topo.N - 1) for j in range(i))
        assert same


class TestGSS:
    def test_gss_matches_analytic(self):
        """Conjugate normal: like = N(x; 2, 1) over data {2}, prior N(0, 10).
        Use a normal working distribution; GSS should recover log evidence."""
        from physher_tpu.models.parameters import ParamSpec, ParamSpace
        from physher_tpu.inference.marginal import marginal_likelihood

        spec = ParamSpec.scalar("mu", 0.5)
        space = ParamSpace([spec])
        s2_prior = 10.0 ** 2

        def log_like(p):
            return -0.5 * ((p["mu"] - 2.0) ** 2) - 0.5 * math.log(2 * math.pi)

        def log_prior(p):
            return (-0.5 * (p["mu"] ** 2) / s2_prior
                    - 0.5 * math.log(2 * math.pi * s2_prior))

        # working distribution close to the posterior
        post_var = 1.0 / (1.0 + 1.0 / s2_prior)
        post_mean = 2.0 * post_var

        def log_ref(p):
            return (-0.5 * (p["mu"] - post_mean) ** 2 / post_var
                    - 0.5 * math.log(2 * math.pi * post_var))

        # analytic evidence: N(2; 0, 1 + 100)
        expect = (-0.5 * 4.0 / (1 + s2_prior)
                  - 0.5 * math.log(2 * math.pi * (1 + s2_prior)))
        val, info = marginal_likelihood(
            jax.random.PRNGKey(0), space, log_like, log_prior,
            {"mu": jnp.asarray(0.5)}, method="gss", log_ref=log_ref,
            n_temps=8, n_iter=4000, burnin=1000, every=5)
        assert abs(val - expect) < 0.1
