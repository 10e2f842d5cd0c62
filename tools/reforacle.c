/* Test oracle: evaluates a physher JSON tree-likelihood config with the
 * REFERENCE implementation (libphyc built from the read-only mount at
 * /root/reference) and prints logP, the resolved tree, branch lengths, and
 * gradients to 17 significant digits.
 *
 * This is a standalone test utility of the physher-tpu repo — it links
 * against the reference library purely to mint golden values that are then
 * stored as fixtures under tests/data/goldens/. It is NOT part of the
 * framework and contains no reference code.
 *
 * Build (see tools/build_oracle.sh):
 *   cc tools/reforacle.c -I/root/reference/src -L/tmp/refbuild -lphyc -lm
 *
 * Usage: reforacle config.json [--gradient]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "phyc/filereader.h"
#include "phyc/hashtable.h"
#include "phyc/mjson.h"
#include "phyc/treeio.h"
#include "phyc/treelikelihood.h"

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s config.json [--gradient]\n", argv[0]);
        return 1;
    }
    int want_gradient = argc > 2 && strcmp(argv[2], "--gradient") == 0;
    int bench_iters = 0;
    if (argc > 2 && strcmp(argv[2], "--bench") == 0) {
        bench_iters = argc > 3 ? atoi(argv[3]) : 20;
    }

    Hashtable* hash = new_Hashtable_string(10);
    hashtable_set_key_ownership(hash, false);
    hashtable_set_value_ownership(hash, false);

    char* content = load_file(argv[1]);
    if (content == NULL) {
        fprintf(stderr, "cannot read %s\n", argv[1]);
        return 1;
    }
    json_node* json = create_json_tree(content);
    free(content);

    json_node* child = get_json_node(json, "model");
    if (child == NULL) child = json->children[0];

    Model* model = new_TreeLikelihoodModel_from_json(child, hash);
    SingleTreeLikelihood* tlk = model->obj;
    Model** models = (Model**)model->data;
    Tree* tree = ((Model*)models[0])->obj;
    if (Tree_is_time_mode(tree)) {
        Tree_update_heights(tree);
    }

    printf("logP %.17g\n", model->logP(model));

    printf("tree ");
    Tree_print_newick(stdout, tree, false);
    printf("\n");

    /* branch lengths / node distances in postorder with taxon labels */
    Node** nodes = Tree_get_nodes(tree, POSTORDER);
    for (int i = 0; i < Tree_node_count(tree); i++) {
        Node* n = nodes[i];
        printf("node %s id %d distance %.17g height %.17g\n",
               (Node_isleaf(n) ? n->name : "internal"), Node_id(n),
               Node_distance(n), Node_height(n));
    }

    if (want_gradient) {
        Parameters* ps = new_Parameters(Tree_node_count(tree));
        for (int i = 0; i < Tree_node_count(tree); i++) {
            Node* n = nodes[i];
            if (!Node_isroot(n) && n->distance != NULL) {
                Parameters_add(ps, n->distance);
            }
        }
        model->prepare_gradient(model, ps);
        SingleTreeLikelihood_update_all_nodes(tlk);
        for (size_t i = 0; i < Parameters_count(ps); i++) {
            printf("dlogP_distance %zu %.17g\n", i,
                   model->dlogP(model, Parameters_at(ps, i)));
        }
        /* central finite differences of the reference's own logP. For JC69
         * these equal the analytic values above (<=4e-7 relative); for
         * HKY/GTR the reference's analytic branch gradient is WRONG (up to
         * 2.1x / 0.65x relative error vs the FD of its own likelihood,
         * measured with this driver) — parity tests assert against these FD
         * values instead. */
        double eps = 1e-7;
        for (size_t i = 0; i < Parameters_count(ps); i++) {
            Parameter* p = Parameters_at(ps, i);
            double d0 = Parameter_value(p);
            Parameter_set_value(p, d0 + eps);
            SingleTreeLikelihood_update_all_nodes(tlk);
            double lp = model->logP(model);
            /* one-sided at (folded) zero-length edges: stepping to a
             * negative branch length makes the eigen P(t) invalid */
            double lo = d0 >= 2 * eps ? d0 - eps : d0;
            Parameter_set_value(p, lo);
            SingleTreeLikelihood_update_all_nodes(tlk);
            double lm = model->logP(model);
            Parameter_set_value(p, d0);
            SingleTreeLikelihood_update_all_nodes(tlk);
            printf("dlogP_fd %zu %.12g\n", i, (lp - lm) / (d0 + eps - lo));
        }
        free_Parameters(ps);
    }

    if (bench_iters > 0) {
        /* reference-CPU baseline timings for bench.py: full recompute logP
         * per iteration (all nodes dirtied, the reference's own benchmark
         * methodology, examples/benchmarking.c:139-180) and the full O(N)
         * analytic branch gradient. */
        struct timespec t0, t1;
        double lp = 0;
        clock_gettime(CLOCK_MONOTONIC_RAW, &t0);
        for (int it = 0; it < bench_iters; it++) {
            SingleTreeLikelihood_update_all_nodes(tlk);
            lp = model->logP(model);
        }
        clock_gettime(CLOCK_MONOTONIC_RAW, &t1);
        double dt_logp = ((t1.tv_sec - t0.tv_sec) +
                          1e-9 * (t1.tv_nsec - t0.tv_nsec)) / bench_iters;
        printf("bench_logP_ms %.4f logP %.10g\n", dt_logp * 1e3, lp);

        Parameters* ps = new_Parameters(Tree_node_count(tree));
        for (int i = 0; i < Tree_node_count(tree); i++) {
            Node* n = nodes[i];
            if (!Node_isroot(n) && n->distance != NULL) {
                Parameters_add(ps, n->distance);
            }
        }
        model->prepare_gradient(model, ps);
        clock_gettime(CLOCK_MONOTONIC_RAW, &t0);
        double acc = 0;
        for (int it = 0; it < bench_iters; it++) {
            SingleTreeLikelihood_update_all_nodes(tlk);
            lp = model->logP(model);
            for (size_t i = 0; i < Parameters_count(ps); i++) {
                acc += model->dlogP(model, Parameters_at(ps, i));
            }
        }
        clock_gettime(CLOCK_MONOTONIC_RAW, &t1);
        double dt_grad = ((t1.tv_sec - t0.tv_sec) +
                          1e-9 * (t1.tv_nsec - t0.tv_nsec)) / bench_iters;
        printf("bench_value_grad_ms %.4f acc %.6g\n", dt_grad * 1e3, acc);
        printf("patterns %zu\n", (size_t)tlk->sp->count);
        free_Parameters(ps);
    }

    model->free(model);
    free_Hashtable(hash);
    json_free_tree(json);
    return 0;
}
