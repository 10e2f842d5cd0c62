/* gslshim: minimal gsl_permutation (see gsl_rng.h header note). */
#ifndef GSLSHIM_PERMUTATION_H
#define GSLSHIM_PERMUTATION_H

#include <stdlib.h>

typedef struct {
    size_t size;
    size_t *data;
} gsl_permutation;

gsl_permutation *gsl_permutation_alloc(size_t n);
void gsl_permutation_free(gsl_permutation *p);

#endif
