/* Minimal GSL-compatible API shim (tools/gslshim) — original code.
 *
 * The reference (4ment/physher) links GSL for RNG, densities, special
 * functions, quantiles, and small dense linear algebra; this image has no
 * GSL and no network. The shim implements exactly the 67 symbols the
 * reference uses (standard textbook algorithms, written from scratch) so
 * the FULL reference binary — including its VB/MCMC/optimizer paths that
 * the DISABLE_GSL build drops — can run as a golden/baseline oracle.
 * Random streams differ from real GSL (documented; converged quantities
 * like ELBO optima are stream-independent).
 */
#ifndef GSLSHIM_RNG_H
#define GSLSHIM_RNG_H

#include <stdlib.h>

#include <gsl/gsl_errno.h>

typedef struct {
    const char *name;
} gsl_rng_type;

typedef struct {
    unsigned long long state;
    unsigned long long inc;
} gsl_rng;

extern const gsl_rng_type *gsl_rng_taus;
extern const gsl_rng_type *gsl_rng_default;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
void gsl_rng_free(gsl_rng *r);
double gsl_rng_uniform(gsl_rng *r);
unsigned long gsl_rng_uniform_int(gsl_rng *r, unsigned long n);

#endif
