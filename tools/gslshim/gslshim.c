/* gslshim.c — minimal GSL-compatible implementation (original code).
 *
 * Implements the exact GSL surface the reference (4ment/physher) links:
 * PCG-style RNG, standard samplers (Marsaglia-Tsang gamma, polar
 * gaussian), closed-form densities, digamma family (asymptotic series +
 * recurrence), regularized incomplete gamma/beta (series + continued
 * fractions) with Newton-refined inverses, Wichura-style normal quantile,
 * and small dense LU/Cholesky. Purpose: run the FULL reference binary
 * (VB/MCMC/optimizer, which its GSL-free build drops) as a golden /
 * baseline oracle in an image without GSL. Not a substitute for GSL:
 * random streams differ; accuracies are ~1e-12 (quantiles ~1e-10).
 */
#include <math.h>
#include <stdio.h>
#include <string.h>

#include <gsl/gsl_rng.h>
#include <gsl/gsl_randist.h>
#include <gsl/gsl_cdf.h>
#include <gsl/gsl_sf_gamma.h>
#include <gsl/gsl_sf_psi.h>
#include <gsl/gsl_vector.h>
#include <gsl/gsl_matrix.h>
#include <gsl/gsl_permutation.h>
#include <gsl/gsl_linalg.h>

/* ------------------------------- RNG --------------------------------- */

static const gsl_rng_type taus_type = {"shim-pcg64"};
const gsl_rng_type *gsl_rng_taus = &taus_type;
const gsl_rng_type *gsl_rng_default = &taus_type;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
    (void)T;
    gsl_rng *r = malloc(sizeof(gsl_rng));
    r->state = 0x853c49e6748fea9bULL;
    r->inc = 0xda3e39cb94b95bdbULL;
    return r;
}

void gsl_rng_set(gsl_rng *r, unsigned long seed) {
    r->state = 0;
    r->inc = (((unsigned long long)seed << 1) | 1u);
    /* advance twice mixing the seed (PCG init pattern) */
    r->state = r->state * 6364136223846793005ULL + r->inc;
    r->state += (unsigned long long)seed;
    r->state = r->state * 6364136223846793005ULL + r->inc;
}

static unsigned int pcg32(gsl_rng *r) {
    unsigned long long old = r->state;
    r->state = old * 6364136223846793005ULL + r->inc;
    unsigned int xorshifted = (unsigned int)(((old >> 18u) ^ old) >> 27u);
    unsigned int rot = (unsigned int)(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
}

void gsl_rng_free(gsl_rng *r) { free(r); }

double gsl_rng_uniform(gsl_rng *r) {
    /* 53-bit uniform in [0, 1) */
    unsigned long long hi = pcg32(r), lo = pcg32(r);
    return ((hi << 21) ^ lo) * (1.0 / 9007199254740992.0);
}

unsigned long gsl_rng_uniform_int(gsl_rng *r, unsigned long n) {
    return (unsigned long)(gsl_rng_uniform(r) * (double)n);
}

/* ----------------------------- samplers ------------------------------ */

double gsl_ran_flat(gsl_rng *r, double a, double b) {
    return a + (b - a) * gsl_rng_uniform(r);
}

double gsl_ran_gaussian(gsl_rng *r, double sigma) {
    /* polar (Marsaglia) method, one deviate per call */
    double u, v, s;
    do {
        u = 2.0 * gsl_rng_uniform(r) - 1.0;
        v = 2.0 * gsl_rng_uniform(r) - 1.0;
        s = u * u + v * v;
    } while (s >= 1.0 || s == 0.0);
    return sigma * u * sqrt(-2.0 * log(s) / s);
}

double gsl_ran_exponential(gsl_rng *r, double mu) {
    double u;
    do { u = gsl_rng_uniform(r); } while (u <= 0.0);
    return -mu * log(u);
}

double gsl_ran_gamma(gsl_rng *r, double a, double b) {
    /* Marsaglia & Tsang (2000); b is the GSL scale parameter */
    if (a < 1.0) {
        double u;
        do { u = gsl_rng_uniform(r); } while (u <= 0.0);
        return gsl_ran_gamma(r, a + 1.0, b) * pow(u, 1.0 / a);
    }
    double d = a - 1.0 / 3.0, c = 1.0 / sqrt(9.0 * d);
    for (;;) {
        double x, v, u;
        do {
            x = gsl_ran_gaussian(r, 1.0);
            v = 1.0 + c * x;
        } while (v <= 0.0);
        v = v * v * v;
        u = gsl_rng_uniform(r);
        if (u < 1.0 - 0.0331 * x * x * x * x) return b * d * v;
        if (u > 0.0 && log(u) < 0.5 * x * x + d * (1.0 - v + log(v)))
            return b * d * v;
    }
}

double gsl_ran_beta(gsl_rng *r, double a, double b) {
    double x = gsl_ran_gamma(r, a, 1.0);
    double y = gsl_ran_gamma(r, b, 1.0);
    return x / (x + y);
}

double gsl_ran_cauchy(gsl_rng *r, double a) {
    double u;
    do { u = gsl_rng_uniform(r); } while (u == 0.5 || u == 0.0);
    return a * tan(M_PI * (u - 0.5));
}

double gsl_ran_lognormal(gsl_rng *r, double zeta, double sigma) {
    return exp(zeta + sigma * gsl_ran_gaussian(r, 1.0));
}

void gsl_ran_dirichlet(gsl_rng *r, size_t K, const double alpha[],
                       double theta[]) {
    double sum = 0.0;
    for (size_t i = 0; i < K; i++) {
        theta[i] = gsl_ran_gamma(r, alpha[i], 1.0);
        sum += theta[i];
    }
    for (size_t i = 0; i < K; i++) theta[i] /= sum;
}

/* ----------------------------- densities ----------------------------- */

double gsl_ran_gaussian_pdf(double x, double sigma) {
    return exp(-0.5 * x * x / (sigma * sigma)) /
           (sigma * sqrt(2.0 * M_PI));
}

double gsl_ran_gamma_pdf(double x, double a, double b) {
    if (x < 0.0) return 0.0;
    if (x == 0.0) return (a == 1.0) ? 1.0 / b : (a > 1.0 ? 0.0 : INFINITY);
    return exp((a - 1.0) * log(x) - x / b - lgamma(a) - a * log(b));
}

double gsl_ran_beta_pdf(double x, double a, double b) {
    if (x < 0.0 || x > 1.0) return 0.0;
    return exp((a - 1.0) * log(x) + (b - 1.0) * log1p(-x) -
               gsl_sf_lnbeta(a, b));
}

double gsl_ran_cauchy_pdf(double x, double a) {
    return a / (M_PI * (a * a + x * x));
}

double gsl_ran_lognormal_pdf(double x, double zeta, double sigma) {
    if (x <= 0.0) return 0.0;
    double z = (log(x) - zeta) / sigma;
    return exp(-0.5 * z * z) / (x * sigma * sqrt(2.0 * M_PI));
}

double gsl_ran_weibull_pdf(double x, double a, double b) {
    /* GSL: p(x) = (b/a) (x/a)^(b-1) exp(-(x/a)^b) */
    if (x < 0.0) return 0.0;
    if (x == 0.0) return (b == 1.0) ? 1.0 / a : (b > 1.0 ? 0.0 : INFINITY);
    double z = x / a;
    return (b / a) * exp((b - 1.0) * log(z) - pow(z, b));
}

double gsl_ran_dirichlet_lnpdf(size_t K, const double alpha[],
                               const double theta[]) {
    double lp = 0.0, asum = 0.0;
    for (size_t i = 0; i < K; i++) {
        lp += (alpha[i] - 1.0) * log(theta[i]) - lgamma(alpha[i]);
        asum += alpha[i];
    }
    return lp + lgamma(asum);
}

/* --------------------------- special fns ------------------------------ */

double gsl_sf_lngamma(double x) { return lgamma(x); }
double gsl_sf_gamma(double x) { return tgamma(x); }

double gsl_sf_lnbeta(double a, double b) {
    return lgamma(a) + lgamma(b) - lgamma(a + b);
}

double gsl_sf_beta(double a, double b) { return exp(gsl_sf_lnbeta(a, b)); }

double gsl_sf_psi(double x) {
    /* digamma: recurrence to x >= 6, then asymptotic series */
    double result = 0.0;
    while (x < 6.0) {
        result -= 1.0 / x;
        x += 1.0;
    }
    double f = 1.0 / (x * x);
    result += log(x) - 0.5 / x -
              f * (1.0 / 12.0 - f * (1.0 / 120.0 - f * (1.0 / 252.0 -
              f * (1.0 / 240.0 - f * (1.0 / 132.0)))));
    return result;
}

double gsl_sf_psi_1(double x) {
    /* trigamma */
    double result = 0.0;
    while (x < 6.0) {
        result += 1.0 / (x * x);
        x += 1.0;
    }
    double f = 1.0 / (x * x);
    result += 1.0 / x + 0.5 * f +
              f / x * (1.0 / 6.0 - f * (1.0 / 30.0 - f * (1.0 / 42.0 -
              f / 30.0)));
    return result;
}

double gsl_sf_psi_n(int n, double x) {
    if (n == 0) return gsl_sf_psi(x);
    if (n == 1) return gsl_sf_psi_1(x);
    if (n == 2) {
        /* tetragamma: psi''(x) = psi''(x+1) - 2/x^3, then asymptotic
           psi''(x) ~ -1/x^2 - 1/x^3 - 1/(2x^4) + 1/(6x^6) - 1/(6x^8) */
        double shift = 0.0;
        while (x < 8.0) {
            shift -= 2.0 / (x * x * x);
            x += 1.0;
        }
        double asym = -1.0 / (x * x) - 1.0 / (x * x * x) -
                      0.5 / (x * x * x * x) + 1.0 / (6.0 * pow(x, 6)) -
                      1.0 / (6.0 * pow(x, 8));
        return asym + shift;
    }
    fprintf(stderr, "gslshim: psi_n(%d) unsupported\n", n);
    return NAN;
}

/* -------------------- incomplete gamma / beta ------------------------- */

static double gammap(double a, double x);

static double gser(double a, double x) {
    /* series for P(a,x), x < a+1 */
    double ap = a, sum = 1.0 / a, del = sum;
    for (int n = 0; n < 500; n++) {
        ap += 1.0;
        del *= x / ap;
        sum += del;
        if (fabs(del) < fabs(sum) * 1e-16) break;
    }
    return sum * exp(-x + a * log(x) - lgamma(a));
}

static double gcf(double a, double x) {
    /* continued fraction for Q(a,x), x >= a+1 (modified Lentz) */
    double b = x + 1.0 - a, c = 1e308, d = 1.0 / b, h = d;
    for (int i = 1; i < 500; i++) {
        double an = -i * (i - a);
        b += 2.0;
        d = an * d + b;
        if (fabs(d) < 1e-300) d = 1e-300;
        c = b + an / c;
        if (fabs(c) < 1e-300) c = 1e-300;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (fabs(del - 1.0) < 1e-16) break;
    }
    return exp(-x + a * log(x) - lgamma(a)) * h;
}

static double gammap(double a, double x) {
    if (x <= 0.0) return 0.0;
    if (x < a + 1.0) return gser(a, x);
    return 1.0 - gcf(a, x);
}

double gsl_cdf_ugaussian_Pinv(double P) {
    /* rational approximation (Acklam) + one Halley refinement */
    if (P <= 0.0) return -INFINITY;
    if (P >= 1.0) return INFINITY;
    static const double a[] = {-3.969683028665376e+01, 2.209460984245205e+02,
                               -2.759285104469687e+02, 1.383577518672690e+02,
                               -3.066479806614716e+01, 2.506628277459239e+00};
    static const double b[] = {-5.447609879822406e+01, 1.615858368580409e+02,
                               -1.556989798598866e+02, 6.680131188771972e+01,
                               -1.328068155288572e+01};
    static const double c[] = {-7.784894002430293e-03, -3.223964580411365e-01,
                               -2.400758277161838e+00, -2.549732539343734e+00,
                               4.374664141464968e+00, 2.938163982698783e+00};
    static const double d[] = {7.784695709041462e-03, 3.224671290700398e-01,
                               2.445134137142996e+00, 3.754408661907416e+00};
    double q, r, x;
    if (P < 0.02425) {
        q = sqrt(-2.0 * log(P));
        x = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
             c[5]) /
            ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0);
    } else if (P <= 0.97575) {
        q = P - 0.5;
        r = q * q;
        x = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r +
             a[5]) *
            q /
            (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r +
             1.0);
    } else {
        q = sqrt(-2.0 * log1p(-P));
        x = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
              c[5]) /
            ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0);
    }
    /* Halley refinement with erfc */
    double e = 0.5 * erfc(-x / sqrt(2.0)) - P;
    double u = e * sqrt(2.0 * M_PI) * exp(0.5 * x * x);
    x = x - u / (1.0 + 0.5 * x * u);
    return x;
}

double gsl_cdf_gamma_Qinv(double Q, double a, double b) {
    /* x with Q(a, x/b) = Q; Newton on P with Wilson-Hilferty start */
    if (Q <= 0.0) return INFINITY;
    if (Q >= 1.0) return 0.0;
    double P = 1.0 - Q;
    double z = gsl_cdf_ugaussian_Pinv(P);
    double t = 1.0 - 2.0 / (9.0 * a) + z * sqrt(2.0 / (9.0 * a));
    double x = a * t * t * t;
    if (x <= 0.0) x = 1e-8 * a;
    for (int it = 0; it < 64; it++) {
        double f = gammap(a, x) - P;
        double dens = exp((a - 1.0) * log(x) - x - lgamma(a));
        if (dens <= 0.0) break;
        double dx = f / dens;
        /* damped Newton, keep positive */
        double xn = x - dx;
        if (xn <= 0.0) xn = 0.5 * x;
        if (fabs(xn - x) < 1e-14 * (x + 1e-300)) { x = xn; break; }
        x = xn;
    }
    return b * x;
}

static double betacf(double a, double b, double x) {
    double qab = a + b, qap = a + 1.0, qam = a - 1.0;
    double c = 1.0, d = 1.0 - qab * x / qap;
    if (fabs(d) < 1e-300) d = 1e-300;
    d = 1.0 / d;
    double h = d;
    for (int m = 1; m <= 500; m++) {
        int m2 = 2 * m;
        double aa = m * (b - m) * x / ((qam + m2) * (a + m2));
        d = 1.0 + aa * d;
        if (fabs(d) < 1e-300) d = 1e-300;
        c = 1.0 + aa / c;
        if (fabs(c) < 1e-300) c = 1e-300;
        d = 1.0 / d;
        h *= d * c;
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2));
        d = 1.0 + aa * d;
        if (fabs(d) < 1e-300) d = 1e-300;
        c = 1.0 + aa / c;
        if (fabs(c) < 1e-300) c = 1e-300;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (fabs(del - 1.0) < 1e-16) break;
    }
    return h;
}

static double betainc(double a, double b, double x) {
    if (x <= 0.0) return 0.0;
    if (x >= 1.0) return 1.0;
    double lbeta = lgamma(a) + lgamma(b) - lgamma(a + b);
    double bt = exp(a * log(x) + b * log1p(-x) - lbeta);
    if (x < (a + 1.0) / (a + b + 2.0))
        return bt * betacf(a, b, x) / a;
    return 1.0 - bt * betacf(b, a, 1.0 - x) / b;
}

double gsl_cdf_beta_Pinv(double P, double a, double b) {
    if (P <= 0.0) return 0.0;
    if (P >= 1.0) return 1.0;
    /* bisection + Newton hybrid */
    double lo = 0.0, hi = 1.0, x = a / (a + b);
    double lbeta = lgamma(a) + lgamma(b) - lgamma(a + b);
    for (int it = 0; it < 200; it++) {
        double f = betainc(a, b, x) - P;
        if (f > 0.0) hi = x; else lo = x;
        double dens = exp((a - 1.0) * log(x) + (b - 1.0) * log1p(-x) -
                          lbeta);
        double xn = (dens > 0.0) ? x - f / dens : 0.5 * (lo + hi);
        if (!(xn > lo && xn < hi)) xn = 0.5 * (lo + hi);
        if (fabs(xn - x) < 1e-15) { x = xn; break; }
        x = xn;
    }
    return x;
}

double gsl_cdf_beta_Qinv(double Q, double a, double b) {
    return gsl_cdf_beta_Pinv(1.0 - Q, a, b);
}

double gsl_cdf_lognormal_Qinv(double Q, double zeta, double sigma) {
    return exp(zeta + sigma * gsl_cdf_ugaussian_Pinv(1.0 - Q));
}

double gsl_cdf_weibull_Qinv(double Q, double a, double b) {
    /* GSL weibull: scale a, shape b; Q(x) = exp(-(x/a)^b) */
    return a * pow(-log(Q), 1.0 / b);
}

/* --------------------------- vector/matrix ---------------------------- */

gsl_vector *gsl_vector_alloc(size_t n) {
    gsl_vector *v = malloc(sizeof(gsl_vector));
    v->size = n;
    v->stride = 1;
    v->data = malloc(n * sizeof(double));
    v->block = NULL;
    v->owner = 1;
    return v;
}

gsl_vector *gsl_vector_calloc(size_t n) {
    gsl_vector *v = gsl_vector_alloc(n);
    memset(v->data, 0, n * sizeof(double));
    return v;
}

void gsl_vector_free(gsl_vector *v) {
    if (!v) return;
    free(v->data);
    free(v);
}

double gsl_vector_get(const gsl_vector *v, size_t i) {
    return v->data[i * v->stride];
}

void gsl_vector_set(gsl_vector *v, size_t i, double x) {
    v->data[i * v->stride] = x;
}

int gsl_vector_memcpy(gsl_vector *dst, const gsl_vector *src) {
    for (size_t i = 0; i < src->size; i++)
        gsl_vector_set(dst, i, gsl_vector_get(src, i));
    return 0;
}

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
    gsl_matrix *m = malloc(sizeof(gsl_matrix));
    m->size1 = n1;
    m->size2 = n2;
    m->tda = n2;
    m->data = malloc(n1 * n2 * sizeof(double));
    m->block = NULL;
    m->owner = 1;
    return m;
}

gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2) {
    gsl_matrix *m = gsl_matrix_alloc(n1, n2);
    memset(m->data, 0, n1 * n2 * sizeof(double));
    return m;
}

void gsl_matrix_free(gsl_matrix *m) {
    if (!m) return;
    free(m->data);
    free(m);
}

double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j) {
    return m->data[i * m->tda + j];
}

void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x) {
    m->data[i * m->tda + j] = x;
}

int gsl_matrix_memcpy(gsl_matrix *dst, const gsl_matrix *src) {
    memcpy(dst->data, src->data,
           src->size1 * src->size2 * sizeof(double));
    return 0;
}

gsl_permutation *gsl_permutation_alloc(size_t n) {
    gsl_permutation *p = malloc(sizeof(gsl_permutation));
    p->size = n;
    p->data = malloc(n * sizeof(size_t));
    for (size_t i = 0; i < n; i++) p->data[i] = i;
    return p;
}

void gsl_permutation_free(gsl_permutation *p) {
    if (!p) return;
    free(p->data);
    free(p);
}

/* ------------------------------ linalg -------------------------------- */

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum) {
    size_t n = A->size1;
    *signum = 1;
    for (size_t i = 0; i < n; i++) p->data[i] = i;
    for (size_t j = 0; j < n; j++) {
        /* pivot */
        size_t piv = j;
        double big = fabs(gsl_matrix_get(A, j, j));
        for (size_t i = j + 1; i < n; i++) {
            double v = fabs(gsl_matrix_get(A, i, j));
            if (v > big) { big = v; piv = i; }
        }
        if (piv != j) {
            for (size_t k = 0; k < n; k++) {
                double tmp = gsl_matrix_get(A, j, k);
                gsl_matrix_set(A, j, k, gsl_matrix_get(A, piv, k));
                gsl_matrix_set(A, piv, k, tmp);
            }
            size_t tp = p->data[j];
            p->data[j] = p->data[piv];
            p->data[piv] = tp;
            *signum = -*signum;
        }
        double d = gsl_matrix_get(A, j, j);
        if (d == 0.0) continue;
        for (size_t i = j + 1; i < n; i++) {
            double f = gsl_matrix_get(A, i, j) / d;
            gsl_matrix_set(A, i, j, f);
            for (size_t k = j + 1; k < n; k++)
                gsl_matrix_set(A, i, k,
                               gsl_matrix_get(A, i, k) -
                                   f * gsl_matrix_get(A, j, k));
        }
    }
    return 0;
}

int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse) {
    size_t n = LU->size1;
    double *col = malloc(n * sizeof(double));
    for (size_t j = 0; j < n; j++) {
        for (size_t i = 0; i < n; i++) col[i] = (p->data[i] == j) ? 1.0 : 0.0;
        /* forward */
        for (size_t i = 0; i < n; i++)
            for (size_t k = 0; k < i; k++)
                col[i] -= gsl_matrix_get(LU, i, k) * col[k];
        /* back */
        for (size_t ii = n; ii-- > 0;) {
            for (size_t k = ii + 1; k < n; k++)
                col[ii] -= gsl_matrix_get(LU, ii, k) * col[k];
            col[ii] /= gsl_matrix_get(LU, ii, ii);
        }
        for (size_t i = 0; i < n; i++) gsl_matrix_set(inverse, i, j, col[i]);
    }
    free(col);
    return 0;
}

int gsl_linalg_cholesky_decomp1(gsl_matrix *A) {
    size_t n = A->size1;
    for (size_t j = 0; j < n; j++) {
        double d = gsl_matrix_get(A, j, j);
        for (size_t k = 0; k < j; k++) {
            double l = gsl_matrix_get(A, j, k);
            d -= l * l;
        }
        if (d <= 0.0) return 1; /* GSL_EDOM */
        d = sqrt(d);
        gsl_matrix_set(A, j, j, d);
        for (size_t i = j + 1; i < n; i++) {
            double s = gsl_matrix_get(A, i, j);
            for (size_t k = 0; k < j; k++)
                s -= gsl_matrix_get(A, i, k) * gsl_matrix_get(A, j, k);
            gsl_matrix_set(A, i, j, s / d);
        }
    }
    /* mirror upper = lower like GSL decomp1 (keeps A symmetric-ish) */
    for (size_t i = 0; i < n; i++)
        for (size_t j = i + 1; j < n; j++)
            gsl_matrix_set(A, i, j, gsl_matrix_get(A, j, i));
    return 0;
}

/* --------------------- multivariate gaussian -------------------------- */

int gsl_ran_multivariate_gaussian(gsl_rng *r, const gsl_vector *mu,
                                  const gsl_matrix *L, gsl_vector *result) {
    size_t n = mu->size;
    for (size_t i = 0; i < n; i++)
        gsl_vector_set(result, i, gsl_ran_gaussian(r, 1.0));
    /* result = mu + L z (L lower triangular) */
    for (size_t i = n; i-- > 0;) {
        double s = 0.0;
        for (size_t j = 0; j <= i; j++)
            s += gsl_matrix_get(L, i, j) * gsl_vector_get(result, j);
        gsl_vector_set(result, i, gsl_vector_get(mu, i) + s);
    }
    return 0;
}

int gsl_ran_multivariate_gaussian_log_pdf(const gsl_vector *x,
                                          const gsl_vector *mu,
                                          const gsl_matrix *L,
                                          double *result, gsl_vector *work) {
    size_t n = mu->size;
    /* solve L w = x - mu */
    for (size_t i = 0; i < n; i++) {
        double s = gsl_vector_get(x, i) - gsl_vector_get(mu, i);
        for (size_t j = 0; j < i; j++)
            s -= gsl_matrix_get(L, i, j) * gsl_vector_get(work, j);
        gsl_vector_set(work, i, s / gsl_matrix_get(L, i, i));
    }
    double quad = 0.0, logdet = 0.0;
    for (size_t i = 0; i < n; i++) {
        double w = gsl_vector_get(work, i);
        quad += w * w;
        logdet += log(gsl_matrix_get(L, i, i));
    }
    *result = -0.5 * quad - logdet - 0.5 * n * log(2.0 * M_PI);
    return 0;
}

/* --------------------------- error handler ---------------------------- */

gsl_error_handler_t *gsl_set_error_handler(gsl_error_handler_t *h) {
    (void)h;
    return NULL;
}

gsl_error_handler_t *gsl_set_error_handler_off(void) { return NULL; }
