/* tetra_dsp.c — LP analysis / LSF conversion / filtering primitives for
 * the spec-derived TETRA ACELP codec (see tetra_codec.h header note).
 *
 * Algorithms are the published classics every EN 300 395-2-era CELP
 * codec builds on: Levinson-Durbin recursion, Chebyshev-grid LSF root
 * search (Kabal & Ramachandran), direct-form synthesis/residual filters.
 */
#include "tetra_codec.h"

#include <math.h>
#include <string.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

void autocorr(const float *x, int n, float *r, int order)
{
    for (int k = 0; k <= order; ++k) {
        double acc = 0.0;
        for (int i = k; i < n; ++i)
            acc += (double)x[i] * x[i - k];
        r[k] = (float)acc;
    }
    if (r[0] < 1.0f)
        r[0] = 1.0f;             /* silence guard */
    /* 60 Hz lag window + white-noise floor (standard conditioning) */
    r[0] *= 1.0001f;
    for (int k = 1; k <= order; ++k) {
        double w = exp(-0.5 * pow(2.0 * M_PI * 60.0 * k / 8000.0, 2.0));
        r[k] = (float)(r[k] * w);
    }
}

void levinson(const float *r, float *a, int order)
{
    double err = r[0];
    double ad[LP_ORDER + 1] = {1.0};
    for (int i = 1; i <= order; ++i) {
        double acc = r[i];
        for (int j = 1; j < i; ++j)
            acc += ad[j] * r[i - j];
        double k = (err > 1e-9) ? -acc / err : 0.0;
        if (k > 0.999) k = 0.999;
        if (k < -0.999) k = -0.999;
        double tmp[LP_ORDER + 1];
        for (int j = 1; j < i; ++j)
            tmp[j] = ad[j] + k * ad[i - j];
        for (int j = 1; j < i; ++j)
            ad[j] = tmp[j];
        ad[i] = k;
        err *= 1.0 - k * k;
        if (err < 1e-9)
            err = 1e-9;
    }
    a[0] = 1.0f;
    for (int i = 1; i <= order; ++i)
        a[i] = (float)ad[i];
}

/* ---- LSF <-> LP conversion via Chebyshev polynomials ---- */

/* evaluate the order-5 sum/difference polynomial at x = cos(w) using the
 * Chebyshev recursion (f has 6 coefficients f[0..5]) */
static double cheb_eval(const double *f, double x)
{
    double b2 = f[0], b1 = 2.0 * x * f[0] + f[1], t;
    for (int i = 2; i < 5; ++i) {
        t = 2.0 * x * b1 - b2 + f[i];
        b2 = b1;
        b1 = t;
    }
    return x * b1 - b2 + 0.5 * f[5];
}

void a_to_lsf(const float *a, float *lsf, const float *lsf_prev)
{
    /* P'(z)/(1+z^-1), Q'(z)/(1-z^-1) Chebyshev coefficient sets */
    double f1[6], f2[6];
    f1[0] = f2[0] = 1.0;
    for (int i = 0; i < 5; ++i) {
        f1[i + 1] = a[i + 1] + a[LP_ORDER - i] - f1[i];
        f2[i + 1] = a[i + 1] - a[LP_ORDER - i] + f2[i];
    }

    /* grid search for sign changes, alternating P and Q, then bisection;
     * after each root, rescan from the root itself with the other
     * polynomial so interlaced roots inside one grid cell are not missed
     * (the G.729-style search order) */
    const int GRID = 256;
    int found = 0, which = 0;       /* 0 -> f1, 1 -> f2 */
    double xlow = 1.0;              /* cos(0) */
    double ylow = cheb_eval(f1, xlow);
    int g = 1;
    while (g <= GRID && found < LP_ORDER) {
        double x = cos(M_PI * g / GRID);
        const double *f = which ? f2 : f1;
        double y = cheb_eval(f, x);
        if (ylow * y <= 0.0) {
            /* bisect [x, xlow] (x < xlow in cos domain) */
            double lo = x, hi = xlow, yhi = ylow;
            for (int it = 0; it < 30; ++it) {
                double mid = 0.5 * (lo + hi);
                double ym = cheb_eval(f, mid);
                if (ym * yhi <= 0.0)
                    lo = mid;
                else {
                    hi = mid;
                    yhi = ym;
                }
            }
            double root = 0.5 * (lo + hi);
            lsf[found++] = (float)acos(root);
            which ^= 1;             /* roots of P and Q interlace */
            xlow = root;            /* resume from the root, same cell */
            ylow = cheb_eval(which ? f2 : f1, xlow);
            continue;               /* re-test this grid point */
        }
        ylow = y;
        xlow = x;
        ++g;
    }
    if (found < LP_ORDER) {
        /* ill-conditioned frame: fall back to previous LSFs (or a
         * uniform fan on the very first frame) */
        for (int i = 0; i < LP_ORDER; ++i)
            lsf[i] = lsf_prev ? lsf_prev[i]
                              : (float)(M_PI * (i + 1) / (LP_ORDER + 1));
    }
}

void lsf_to_a(const float *lsf, float *a)
{
    /* rebuild P(z), Q(z) from the line-spectral roots, average */
    double p[LP_ORDER + 2], q[LP_ORDER + 2];
    memset(p, 0, sizeof(p));
    memset(q, 0, sizeof(q));
    p[0] = q[0] = 1.0;
    int np = 0, nq = 0;
    for (int i = 0; i < LP_ORDER; ++i) {
        double c = -2.0 * cos((double)lsf[i]);
        double *poly = (i % 2 == 0) ? p : q;
        int *n = (i % 2 == 0) ? &np : &nq;
        /* multiply by (1 + c z^-1 + z^-2) */
        int deg = 2 * (*n);
        poly[deg + 2] = 0.0;
        poly[deg + 1] = 0.0;
        for (int j = deg + 2; j >= 2; --j)
            poly[j] += c * poly[j - 1] + poly[j - 2];
        poly[1] += c * poly[0];
        (*n)++;
    }
    /* P'(z) = P(z)(1+z^-1), Q'(z) = Q(z)(1-z^-1); A = (P'+Q')/2 */
    double pp[LP_ORDER + 2], qq[LP_ORDER + 2];
    pp[0] = p[0];
    qq[0] = q[0];
    for (int j = 1; j <= LP_ORDER + 1; ++j) {
        pp[j] = p[j] + p[j - 1];
        qq[j] = q[j] - q[j - 1];
    }
    a[0] = 1.0f;
    for (int j = 1; j <= LP_ORDER; ++j)
        a[j] = (float)(0.5 * (pp[j] + qq[j]));
}

void weight_az(const float *a, float gamma, float *aw)
{
    float g = 1.0f;
    for (int i = 0; i <= LP_ORDER; ++i) {
        aw[i] = a[i] * g;
        g *= gamma;
    }
}

/* y = x filtered by 1/A(z); mem holds the last LP_ORDER outputs
 * (mem[0] = y[-1] ... mem[order-1] = y[-order]) */
void syn_filter(const float *a, const float *x, float *y, int n,
                float *mem, int update)
{
    float buf[LP_ORDER + FRAME_N];
    for (int i = 0; i < LP_ORDER; ++i)
        buf[i] = mem[LP_ORDER - 1 - i];
    float *yy = buf + LP_ORDER;
    for (int i = 0; i < n; ++i) {
        double acc = x[i];
        for (int j = 1; j <= LP_ORDER; ++j)
            acc -= (double)a[j] * yy[i - j];
        /* clamp to avoid blow-ups on corrupted frames */
        if (acc > 1e6) acc = 1e6;
        if (acc < -1e6) acc = -1e6;
        yy[i] = (float)acc;
    }
    memcpy(y, yy, n * sizeof(float));
    if (update)
        for (int i = 0; i < LP_ORDER; ++i)
            mem[i] = yy[n - 1 - i];
}

/* y = x filtered by A(z); hist = LP_ORDER samples preceding x
 * (hist[0] = x[-order] ... hist[order-1] = x[-1]) */
void residu_filter(const float *a, const float *x, float *y, int n,
                   const float *hist)
{
    for (int i = 0; i < n; ++i) {
        double acc = x[i];
        for (int j = 1; j <= LP_ORDER; ++j) {
            int k = i - j;
            acc += (double)a[j] * (k >= 0 ? x[k] : hist[LP_ORDER + k]);
        }
        y[i] = (float)acc;
    }
}
