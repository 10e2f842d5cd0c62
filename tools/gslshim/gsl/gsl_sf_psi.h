/* gslshim: digamma family (see gsl_rng.h header note). */
#ifndef GSLSHIM_SF_PSI_H
#define GSLSHIM_SF_PSI_H

double gsl_sf_psi(double x);      /* digamma */
double gsl_sf_psi_1(double x);    /* trigamma */
double gsl_sf_psi_n(int n, double x); /* polygamma, n <= 3 used */

#endif
