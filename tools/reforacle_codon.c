/* Codon-model oracle: the reference's JSON factory cannot build codon
 * models (src/phyc/substmodel.c:1527-1536 GY94/MG94 branches are empty), so
 * this driver wires GY94/MG94 through the raw C API (the same wiring the
 * phycpp wrapper uses, src/phycpp/physher.cpp:560-592) and prints logP.
 *
 * Usage: reforacle_codon alignment.fa newick.txt gy94|mg94 [params...]
 *   gy94: kappa omega
 *   mg94: alpha beta kappa
 */

#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include <string.h>

#include "phyc/datatype.h"
#include "phyc/gy94.h"
#include "phyc/mg94.h"
#include "phyc/sequence.h"
#include "phyc/sequenceio.h"
#include "phyc/simplex.h"
#include "phyc/sitemodel.h"
#include "phyc/sitepattern.h"
#include "phyc/substmodel.h"
#include "phyc/tree.h"
#include "phyc/treeio.h"
#include "phyc/treelikelihoodX.h"
#include "phyc/treelikelihood.h"

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s aln.fa tree.nwk gy94|mg94 [params]\n",
                argv[0]);
        return 1;
    }
    Sequences* seqs = readSequences(argv[1]);
    DataType* dt = new_CodonDataType(0);
    seqs->datatype = dt;

    char* tree_string = readTree(argv[2]);
    Tree* tree = new_Tree(tree_string, true);
    free(tree_string);

    SitePattern* sp = new_SitePattern(seqs);
    printf("patterns %zu\n", (size_t)sp->count);

    int nstate = dt->state_count(dt);
    Simplex* freqs = new_Simplex("freqs", nstate);
    double* eq = malloc(sizeof(double) * nstate);
    for (int i = 0; i < nstate; i++) eq[i] = 1.0 / nstate;
    freqs->set_values(freqs, eq);
    free(eq);

    SubstitutionModel* sm = NULL;
    if (strcmp(argv[3], "gy94") == 0) {
        double kappa = argc > 4 ? atof(argv[4]) : 1.0;
        double omega = argc > 5 ? atof(argv[5]) : 1.0;
        sm = new_GY94_with_values(freqs, omega, kappa, 0);
    } else {
        double alpha = argc > 4 ? atof(argv[4]) : 1.0;
        double beta = argc > 5 ? atof(argv[5]) : 1.0;
        double kappa = argc > 6 ? atof(argv[6]) : 1.0;
        sm = new_MG94_with_values(freqs, alpha, beta, kappa, 0);
    }

    fprintf(stderr, "model built\n");
    Parameters* empty = new_Parameters(1);
    SiteModel* sitemodel = new_SiteModel_with_parameters(
        empty, NULL, 1, DISTRIBUTION_UNIFORM, false,
        QUADRATURE_QUANTILE_MEDIAN);
    fprintf(stderr, "sitemodel built\n");

    SingleTreeLikelihood* tlk =
        new_SingleTreeLikelihood(tree, sm, sitemodel, sp, NULL, false);
    /* the >=60-state constructor assigns the codon kernels
     * (treelikelihoodCodon.c), which segfault on this construction path in
     * the reference (bit-rot: physher's own JSON factory cannot build codon
     * models, substmodel.c:1527-1536, so the path is untested there);
     * force the state-generic kernels (treelikelihoodX.c) instead — same
     * math, any state count. */
    tlk->update_partials = update_partials_general;
    tlk->integrate_partials = integrate_partials_general;
    tlk->node_log_likelihoods = node_log_likelihoods_general;
    tlk->calculate_per_cat_partials = calculate_branch_partials;
    tlk->update_partials_flexible = NULL;
    double logP = tlk->calculate(tlk);
    printf("logP %.17g\n", logP);

    const char* bench_env = getenv("REFORACLE_BENCH");
    if (bench_env != NULL) {
        int iters = atoi(bench_env);
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC_RAW, &t0);
        for (int it = 0; it < iters; it++) {
            SingleTreeLikelihood_update_all_nodes(tlk);
            logP = tlk->calculate(tlk);
        }
        clock_gettime(CLOCK_MONOTONIC_RAW, &t1);
        double dt = ((t1.tv_sec - t0.tv_sec) +
                     1e-9 * (t1.tv_nsec - t0.tv_nsec)) / iters;
        printf("bench_logP_ms %.4f\n", dt * 1e3);

        /* value+gradient: the reference's O(N) analytic branch gradient
         * through the Model wrapper (same methodology as reforacle.c /
         * bench.py's GTR+G4 and WAG rows; reference machinery:
         * treelikelihood.c:320-341 TreeLikelihood_gradient after
         * prepare_gradient). */
        Model* mtree = new_TreeModel("tree", tree);
        Model* mfreqs = new_SimplexModel("freqs", freqs);
        Model* msubst = new_SubstitutionModel2("subst", sm, mfreqs, NULL);
        Model* msite = new_SiteModel2("sitemodel", sitemodel, NULL);
        Model* model =
            new_TreeLikelihoodModel("tlk", tlk, mtree, msubst, msite, NULL);
        Node** nodes = Tree_get_nodes(tree, POSTORDER);
        Parameters* ps = new_Parameters(Tree_node_count(tree));
        for (int i = 0; i < Tree_node_count(tree); i++) {
            Node* n = nodes[i];
            if (!Node_isroot(n) && n->distance != NULL) {
                Parameters_add(ps, n->distance);
            }
        }
        model->prepare_gradient(model, ps);
        double acc = 0, lp = 0;
        clock_gettime(CLOCK_MONOTONIC_RAW, &t0);
        for (int it = 0; it < iters; it++) {
            SingleTreeLikelihood_update_all_nodes(tlk);
            lp = model->logP(model);
            for (size_t i = 0; i < Parameters_count(ps); i++) {
                acc += model->dlogP(model, Parameters_at(ps, i));
            }
        }
        clock_gettime(CLOCK_MONOTONIC_RAW, &t1);
        double dt_grad = ((t1.tv_sec - t0.tv_sec) +
                          1e-9 * (t1.tv_nsec - t0.tv_nsec)) / iters;
        printf("bench_value_grad_ms %.4f logP %.10g acc %.6g\n",
               dt_grad * 1e3, lp, acc);
    }
    return 0;
}
