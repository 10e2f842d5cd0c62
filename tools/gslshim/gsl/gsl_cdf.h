/* gslshim: quantile functions (see gsl_rng.h header note). */
#ifndef GSLSHIM_CDF_H
#define GSLSHIM_CDF_H

#include <gsl/gsl_errno.h>

double gsl_cdf_gamma_Qinv(double Q, double a, double b);
double gsl_cdf_beta_Pinv(double P, double a, double b);
double gsl_cdf_beta_Qinv(double Q, double a, double b);
double gsl_cdf_lognormal_Qinv(double Q, double zeta, double sigma);
double gsl_cdf_weibull_Qinv(double Q, double a, double b);
double gsl_cdf_ugaussian_Pinv(double P);

#endif
