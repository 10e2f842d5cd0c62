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

    SiteModel* sitemodel = new_SiteModel_with_parameters(
        NULL, NULL, 1, DISTRIBUTION_UNIFORM, false,
        QUADRATURE_QUANTILE_MEDIAN);

    SingleTreeLikelihood* tlk =
        new_SingleTreeLikelihood(tree, sm, sitemodel, sp, NULL, false);
    double logP = tlk->calculate(tlk);
    printf("logP %.17g\n", logP);
    return 0;
}
