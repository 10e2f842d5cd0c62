/* gslshim: LU + Cholesky on small dense matrices (see gsl_rng.h note). */
#ifndef GSLSHIM_LINALG_H
#define GSLSHIM_LINALG_H

#include <gsl/gsl_matrix.h>
#include <gsl/gsl_permutation.h>

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum);
int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse);
int gsl_linalg_cholesky_decomp1(gsl_matrix *A);

#endif
