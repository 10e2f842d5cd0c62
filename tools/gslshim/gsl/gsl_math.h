/* gslshim: math constants passthrough (see gsl_rng.h header note). */
#ifndef GSLSHIM_MATH_H
#define GSLSHIM_MATH_H

#include <math.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#ifndef M_EULER
#define M_EULER 0.57721566490153286061 /* Euler-Mascheroni constant */
#endif

#endif
