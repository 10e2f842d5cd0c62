/* gslshim: minimal gsl_matrix (see gsl_rng.h header note). */
#ifndef GSLSHIM_MATRIX_H
#define GSLSHIM_MATRIX_H

#include <stdlib.h>

#include <gsl/gsl_vector.h>

typedef struct {
    size_t size1;   /* rows */
    size_t size2;   /* cols */
    size_t tda;     /* row stride (== size2 here) */
    double *data;
    void *block;
    int owner;
} gsl_matrix;

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2);
gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2);
void gsl_matrix_free(gsl_matrix *m);
double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j);
void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x);
int gsl_matrix_memcpy(gsl_matrix *dst, const gsl_matrix *src);

#endif
