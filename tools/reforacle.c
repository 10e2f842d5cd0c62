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
        free_Parameters(ps);
    }

    model->free(model);
    free_Hashtable(hash);
    json_free_tree(json);
    return 0;
}
