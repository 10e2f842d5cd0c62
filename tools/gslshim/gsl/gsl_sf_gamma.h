/* gslshim: gamma/beta special functions (see gsl_rng.h header note). */
#ifndef GSLSHIM_SF_GAMMA_H
#define GSLSHIM_SF_GAMMA_H

double gsl_sf_gamma(double x);
double gsl_sf_lngamma(double x);
double gsl_sf_beta(double a, double b);
double gsl_sf_lnbeta(double a, double b);

#endif
