/* gslshim: minimal gsl_vector (see gsl_rng.h header note). */
#ifndef GSLSHIM_VECTOR_H
#define GSLSHIM_VECTOR_H

#include <stdlib.h>

typedef struct {
    size_t size;
    size_t stride;
    double *data;
    void *block;
    int owner;
} gsl_vector;

gsl_vector *gsl_vector_alloc(size_t n);
gsl_vector *gsl_vector_calloc(size_t n);
void gsl_vector_free(gsl_vector *v);
double gsl_vector_get(const gsl_vector *v, size_t i);
void gsl_vector_set(gsl_vector *v, size_t i, double x);
int gsl_vector_memcpy(gsl_vector *dst, const gsl_vector *src);

#endif
