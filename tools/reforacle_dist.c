/* Distribution oracle: build a "distribution" JSON node through the
 * reference's factory (src/phyc/distmodelfactory.c) and print logP —
 * used to mint goldens for features the reference's own tests don't pin
 * (e.g. the `shift` offset, distmodel.h:83). Link against the full
 * reference sources + tools/gslshim (see build_reference_full.sh).
 *
 * Usage: reforacle_dist config.json id1 [id2 ...]
 */
#include <stdio.h>
#include <string.h>

#include "phyc/distmodel.h"
#include "phyc/distmodelfactory.h"
#include "phyc/distgamma.h"
#include "phyc/distlognormal.h"
#include "phyc/distexp.h"
#include "phyc/distnormal.h"
#include "phyc/filereader.h"
#include "phyc/hashtable.h"
#include "phyc/mjson.h"
#include "phyc/parameters.h"
#include "phyc/random.h"

#include <gsl/gsl_rng.h>

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s config.json id...\n", argv[0]);
        return 1;
    }
    Hashtable* hash = new_Hashtable_string(100);
    hashtable_set_key_ownership(hash, false);
    hashtable_set_value_ownership(hash, false);
    gsl_rng* r = gsl_rng_alloc(gsl_rng_taus);
    gsl_rng_set(r, 1);
    Hashtable_add(hash, "RANDOM_GENERATOR!@", r);

    char* content = load_file(argv[1]);
    json_node* json = create_json_tree(content);
    free(content);

    for (int i = 0; i < json->child_count; i++) {
        json_node* child = json->children[i];
        char* type = get_json_node_value_string(child, "type");
        if (type == NULL || strcasecmp(type, "distribution") != 0) continue;
        /* the factory's allowed-key list rejects "shift" (exit 12) even
         * though every family parser reads it (distgamma.c:276 etc.) —
         * shift is only reachable in the reference through direct family
         * parsing (the laplace refdist path, laplace.c:1025), so dispatch
         * the same way */
        char* dist = get_json_node_value_string(child, "distribution");
        Model* m;
        if (strcasecmp(dist, "gamma") == 0) {
            m = new_GammaDistributionModel_from_json(child, hash);
        } else if (strcasecmp(dist, "lognormal") == 0) {
            m = new_LogNormalDistributionModel_from_json(child, hash);
        } else if (strcasecmp(dist, "exponential") == 0) {
            m = new_ExponentialDistributionModel_from_json(child, hash);
        } else if (strcasecmp(dist, "normal") == 0) {
            m = new_NormalDistributionModel_from_json(child, hash);
        } else {
            m = new_DistributionModel_from_json(child, hash);
        }
        char* id = get_json_node_value_string(child, "id");
        Hashtable_add(hash, id, m);
        for (int a = 2; a < argc; a++) {
            if (strcmp(argv[a], id) == 0) {
                printf("%s logP %.17g\n", id, m->logP(m));
            }
        }
    }
    return 0;
}
