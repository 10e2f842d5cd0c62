/* gslshim: samplers + densities (see gsl_rng.h header note). */
#ifndef GSLSHIM_RANDIST_H
#define GSLSHIM_RANDIST_H

#include <gsl/gsl_errno.h>
#include <gsl/gsl_rng.h>
#include <gsl/gsl_vector.h>
#include <gsl/gsl_matrix.h>

double gsl_ran_flat(gsl_rng *r, double a, double b);
double gsl_ran_gaussian(gsl_rng *r, double sigma);
double gsl_ran_gaussian_pdf(double x, double sigma);
double gsl_ran_exponential(gsl_rng *r, double mu);
double gsl_ran_gamma(gsl_rng *r, double a, double b);
double gsl_ran_gamma_pdf(double x, double a, double b);
double gsl_ran_beta(gsl_rng *r, double a, double b);
double gsl_ran_beta_pdf(double x, double a, double b);
double gsl_ran_cauchy(gsl_rng *r, double a);
double gsl_ran_cauchy_pdf(double x, double a);
double gsl_ran_lognormal(gsl_rng *r, double zeta, double sigma);
double gsl_ran_lognormal_pdf(double x, double zeta, double sigma);
double gsl_ran_weibull_pdf(double x, double a, double b);
void gsl_ran_dirichlet(gsl_rng *r, size_t K, const double alpha[],
                       double theta[]);
double gsl_ran_dirichlet_lnpdf(size_t K, const double alpha[],
                               const double theta[]);
int gsl_ran_multivariate_gaussian(gsl_rng *r, const gsl_vector *mu,
                                  const gsl_matrix *L, gsl_vector *result);
int gsl_ran_multivariate_gaussian_log_pdf(const gsl_vector *x,
                                          const gsl_vector *mu,
                                          const gsl_matrix *L,
                                          double *result,
                                          gsl_vector *work);

#endif
