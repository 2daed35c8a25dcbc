/* tetra_celp.c — ACELP speech codec core (EN 300 395-2 architecture).
 *
 * Real analysis-by-synthesis CELP at the TETRA frame contract
 * (240 samples / 137 bits per 30 ms, 4 x 60-sample subframes):
 *
 *   LP        10th order, autocorrelation + 60 Hz lag window, Levinson
 *   LSF Q     26 bits: MA-predicted (0.6) per-coefficient scalar
 *             quantization, bits {3,3,3,3,3,3,2,2,2,2}
 *   pitch     adaptive codebook, delays 20..143, 1/3-fractional below
 *             85; 8-bit absolute (sf 0,2), 5-bit relative (sf 1,3)
 *   innovation  algebraic codebook: 3 unit pulses on 3 of 4 interleaved
 *             tracks (track rotation by subframe), 4-bit positions +
 *             3 signs = 15 bits, exhaustive 15^3 search over the
 *             backward-filtered target (d, Phi formulation)
 *   gains     3-bit adaptive gain {0..1.2}, 3-bit fixed-gain correction
 *             on a 4-tap moving-average dB-energy predictor
 *   weighting W(z) = Aq(z)/Aq(z/0.75) (one-memory exact AbS form)
 *   postfilter  Aq(z/0.65)/Aq(z/0.80) + impulse-response-derived tilt
 *             compensation + smoothed AGC
 *   concealment repeat-damp LSF/gains, PRNG innovation, mute after 6
 *
 * See tetra_codec.h for the honesty note: spec-shaped, self-consistent
 * encoder/decoder pair; ETSI test vectors are unavailable offline so
 * bit-exactness to the ETSI binaries is not claimed.
 */
#include "tetra_codec.h"

#include <math.h>
#include <string.h>
#if defined(GAIN_STATS) || defined(LSF_STATS)
#include <stdio.h>
#endif

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#ifndef GAMMA_W
#define GAMMA_W 0.75f          /* perceptual weighting (sweep-overridable;
                                  0.70-0.90 measured flat on segSNR) */
#endif
#ifndef TILT_FACTOR
/* tilt-compensation strength (x k1 of the formant filter's impulse
 * response).  Sweep measured (seed 3+7 mean, stream): 0.0 -> 8.46 dB
 * segSNR, 0.3 -> 8.29, 0.5 -> 8.08, 0.8 -> 7.60, 1.0 -> 7.19; 0.5
 * keeps most of the waveform fidelity while still canceling half the
 * formant filter's muffling tilt. */
#define TILT_FACTOR 0.5f
#endif
#ifdef PF_NUM_OVERRIDE                 /* tuning-sweep hook */
#define GAMMA_PF_NUM PF_NUM_OVERRIDE
#define GAMMA_PF_DEN PF_DEN_OVERRIDE
#else
#define GAMMA_PF_NUM 0.65f     /* postfilter numerator */
#define GAMMA_PF_DEN 0.80f     /* postfilter denominator */
#endif

/* ---- bit layout ---- */
static const int LSF_BITS[LP_ORDER] = {3, 3, 3, 3, 3, 3, 2, 2, 2, 2};
static const int SF_OFF[SUBFRAMES] = {26, 55, 81, 110};
static const int SF_PITCH_BITS[SUBFRAMES] = {8, 5, 8, 5};

/* mean LSF (rad) for a typical speech spectrum and per-coef quantizer
 * step (rad); steps sized so +/-([levels/2]) spans the MA-prediction
 * residual range.  Step scale swept (x0.6..x1.25): x0.8 of the original
 * sizing measured best (8.22 vs 7.99 dB segSNR, 3-seed stream mean) */
/* NOTE (round-5 sweep): -DLSF_STATS measures large systematic bias
 * here (several coefficients saturate their quantizer every frame on
 * the test corpus), but re-centering LSF_MEAN to the measured means
 * was a NON-win (streaming +0.1 dB, per-block-context -0.4 dB): the
 * MA prediction loop self-corrects the bias within ~2 frames
 * (steady-state lsf_q -> mean + (levels/2)*step/(1-LSF_PRED)) and the
 * analysis-by-synthesis excitation search absorbs the residual
 * spectral error.  Kept as-is; hooks below for future sweeps. */
#ifdef LSF_MEAN_OVERRIDE               /* tuning-sweep hook */
static const float LSF_MEAN[LP_ORDER] = {LSF_MEAN_OVERRIDE};
#else
static const float LSF_MEAN[LP_ORDER] = {
    0.2244f, 0.4553f, 0.7101f, 1.0053f, 1.3302f,
    1.6541f, 1.9752f, 2.2920f, 2.6032f, 2.9034f};
#endif
#ifdef LSF_STEP_OVERRIDE               /* tuning-sweep hook */
static const float LSF_STEP[LP_ORDER] = {LSF_STEP_OVERRIDE};
#else
static const float LSF_STEP[LP_ORDER] = {
    0.0416f, 0.0480f, 0.0544f, 0.0600f, 0.0640f,
    0.0640f, 0.0880f, 0.0880f, 0.0840f, 0.0760f};
#endif
/* predictors are deliberately SHORT-memory: the host invokes the codec
 * exes once per 690-short block (2 frames — reference voice.py:73), so
 * decoder state never survives more than 2 frames; prediction operates
 * on errors around fixed means and decays within a frame */
#define LSF_PRED 0.4f
#define LSF_MIN_GAP 0.0314f    /* ~40 Hz */

#ifdef GP_TABLE_OVERRIDE                /* tuning-sweep hook */
static const float GP_TABLE[8] = {GP_TABLE_OVERRIDE};
#else
/* adaptive-gain levels re-sized from measured jointly-optimal gains
 * (gp_opt p25/p50/p75 = 0.87/1.01/1.27): dense near 1.0 where voiced
 * subframes live, one zero entry for unvoiced.  Measured +0.37 dB
 * segSNR over the original even spacing (round-5 sweep,
 * tools/codec_quality.py). */
static const float GP_TABLE[8] = {
    0.0f, 0.45f, 0.65f, 0.78f, 0.9f, 1.0f, 1.1f, 1.2f};
#endif
#ifdef GC_TABLE_OVERRIDE                /* tuning-sweep hook */
static const float GC_DELTA_DB[8] = {GC_TABLE_OVERRIDE};
#else
static const float GC_DELTA_DB[8] = {
    -18.0f, -10.0f, -5.0f, -1.5f, 1.5f, 5.0f, 10.0f, 18.0f};
#endif
#ifndef GC_MEAN_DB
/* center of the fixed-gain quantizer's reachable energy range.
 * Sized from measured jointly-optimal innovation energies on the test
 * corpus (tools/codec_quality.py instrumentation, -DGAIN_STATS):
 * e_opt p5..p95 = 50.6..63.1 dB at full-scale speech — the original
 * 36 dB saturated the +18 dB delta step on nearly every voiced
 * subframe (59% of subframes wanted |delta| > 10 dB). */
#define GC_MEAN_DB 48.0f
#endif
#define GC_MIN_DB (-24.0f)

/* 1/3-resolution fractional-delay interpolator: 3 phases x 9 taps of a
 * Hamming-windowed sinc (built at first use) */
static float interp3[3][9];
static int interp3_ready = 0;

static void build_interp3(void)
{
    if (interp3_ready)
        return;
    for (int ph = 0; ph < 3; ++ph) {
        for (int k = -4; k <= 4; ++k) {
            double t = k - ph / 3.0;
            double s = (fabs(t) < 1e-9) ? 1.0
                       : sin(M_PI * t) / (M_PI * t);
            double w = 0.54 + 0.46 * cos(M_PI * t / 4.5);
            interp3[ph][k + 4] = (float)(s * w);
        }
    }
    interp3_ready = 1;
}

/* ---- bit helpers (MSB first) ---- */
static void put_bits(uint8_t *bits, int off, int n, int v)
{
    for (int i = 0; i < n; ++i)
        bits[off + i] = (uint8_t)((v >> (n - 1 - i)) & 1);
}

static int get_bits(const uint8_t *bits, int off, int n)
{
    int v = 0;
    for (int i = 0; i < n; ++i)
        v = (v << 1) | (bits[off + i] & 1);
    return v;
}

/* ================= shared parameter coding ================= */

static void lsf_quantize(tetra_celp_state *st, const float *lsf,
                         float *lsf_q, int *idx)
{
    for (int i = 0; i < LP_ORDER; ++i) {
        float pred = LSF_MEAN[i]
            + LSF_PRED * (st->lsf_prev_q[i] - LSF_MEAN[i]);
        float r = lsf[i] - pred;
        int levels = 1 << LSF_BITS[i];
        int q = (int)floorf(r / LSF_STEP[i] + 0.5f) + levels / 2;
        if (q < 0) q = 0;
        if (q > levels - 1) q = levels - 1;
        idx[i] = q;
        lsf_q[i] = pred + (q - levels / 2) * LSF_STEP[i];
#ifdef LSF_STATS
        fprintf(stderr, "LSF i=%d r=%.4f lsf=%.4f clip=%d\n", i, r,
                lsf[i], (q == 0 || q == levels - 1));
#endif
    }
}

static void lsf_stabilize(float *lsf)
{
    /* sort (they should already be ordered) then enforce min gap */
    for (int i = 1; i < LP_ORDER; ++i)
        for (int j = i; j > 0 && lsf[j] < lsf[j - 1]; --j) {
            float t = lsf[j];
            lsf[j] = lsf[j - 1];
            lsf[j - 1] = t;
        }
    if (lsf[0] < LSF_MIN_GAP)
        lsf[0] = LSF_MIN_GAP;
    for (int i = 1; i < LP_ORDER; ++i)
        if (lsf[i] < lsf[i - 1] + LSF_MIN_GAP)
            lsf[i] = lsf[i - 1] + LSF_MIN_GAP;
    if (lsf[LP_ORDER - 1] > (float)M_PI - LSF_MIN_GAP)
        lsf[LP_ORDER - 1] = (float)M_PI - LSF_MIN_GAP;
    for (int i = LP_ORDER - 2; i >= 0; --i)
        if (lsf[i] > lsf[i + 1] - LSF_MIN_GAP)
            lsf[i] = lsf[i + 1] - LSF_MIN_GAP;
}

static void lsf_dequantize(tetra_celp_state *st, const int *idx,
                           float *lsf_q)
{
    for (int i = 0; i < LP_ORDER; ++i) {
        float pred = LSF_MEAN[i]
            + LSF_PRED * (st->lsf_prev_q[i] - LSF_MEAN[i]);
        int levels = 1 << LSF_BITS[i];
        lsf_q[i] = pred + (idx[i] - levels / 2) * LSF_STEP[i];
    }
    lsf_stabilize(lsf_q);
}

/* subframe LSF interpolation: prev->curr weights 3/4, 1/2, 1/4, 0.
 * `fresh` (first frame of a 2-frame block) uses curr for ALL subframes:
 * the predictor reset leaves no meaningful previous spectrum, and a
 * per-block decoder process has none either — both sides agree. */
static void lsf_interp(const float *prev, const float *curr, int sf,
                       int fresh, float *a_out)
{
    float lsf[LP_ORDER];
    float wp = fresh ? 0.0f : (3 - sf) / 4.0f;
    for (int i = 0; i < LP_ORDER; ++i)
        lsf[i] = wp * prev[i] + (1.0f - wp) * curr[i];
    lsf_stabilize(lsf);
    lsf_to_a(lsf, a_out);
}

/* pitch index <-> (integer lag, 1/3 fraction) — t3 = 3*T + frac */
static int pitch_abs_encode(int t3)
{
    int T = t3 / 3;
    if (T < PIT_FR_MAX)
        return t3 - 3 * PIT_MIN;                 /* 0..194 */
    return 195 + (T - PIT_FR_MAX);               /* 195..253 */
}

static int pitch_abs_decode(int idx)
{
    if (idx <= 194)
        return idx + 3 * PIT_MIN;
    if (idx > 253)
        idx = 253;
    return 3 * (PIT_FR_MAX + (idx - 195));
}

static int clamp_t3(int t3)
{
    if (t3 < 3 * PIT_MIN) t3 = 3 * PIT_MIN;
    if (t3 > 3 * PIT_MAX) t3 = 3 * PIT_MAX;
    return t3;
}

/* adaptive-codebook vector at fractional delay t3 from the excitation
 * history ending at exc_end (exc_end[-1] = last past sample); LTP
 * periodic extension for in-subframe references */
static void acb_vector(const float *exc_end, int t3, float *v)
{
    build_interp3();
    int T = t3 / 3, ph = t3 % 3;
    /* v[n] = sum_k w[ph][k+4] * e[n - T + k],
     * phase shifts by -ph/3: e(n - T - ph/3) */
    for (int n = 0; n < SUB_N; ++n) {
        double acc = 0.0;
        for (int k = -4; k <= 4; ++k) {
            int j = n - T + k;
            float s = (j < 0) ? exc_end[j]
                              : v[j];   /* j <= n-16 < n: already built */
            acc += (double)interp3[ph][k + 4] * s;
        }
        v[n] = (float)acc;
    }
}

/* convolution y = x (*) h truncated to the subframe */
static void conv_h(const float *x, const float *h, float *y)
{
    for (int n = 0; n < SUB_N; ++n) {
        double acc = 0.0;
        for (int i = 0; i <= n; ++i)
            acc += (double)x[i] * h[n - i];
        y[n] = (float)acc;
    }
}

static float dot(const float *a, const float *b, int n)
{
    double acc = 0.0;
    for (int i = 0; i < n; ++i)
        acc += (double)a[i] * b[i];
    return (float)acc;
}

/* fixed-gain prediction: fixed mean + short MA over past quantized
 * prediction ERRORS (deltas), so an all-zero initial state predicts the
 * mean — correct behavior for the per-block exe invocation pattern */
static float gain_predict(const tetra_celp_state *st)
{
    return GC_MEAN_DB + 0.4f * st->energy_hist[0]
        + 0.25f * st->energy_hist[1] + 0.15f * st->energy_hist[2]
        + 0.1f * st->energy_hist[3];
}

static void gain_update(tetra_celp_state *st, float delta_db)
{
    st->energy_hist[3] = st->energy_hist[2];
    st->energy_hist[2] = st->energy_hist[1];
    st->energy_hist[1] = st->energy_hist[0];
    st->energy_hist[0] = delta_db;
}

/* pitch sharpening: inject periodicity into the innovation (standard
 * ACELP enhancement).  beta from the PREVIOUS subframe's quantized
 * adaptive gain and the CURRENT decoded lag — both known to encoder
 * and decoder before the innovation is used, so the two sides build
 * identical excitation. */
static void pitch_sharpen(float *c, int lag, float prev_gp)
{
    float beta = 0.85f * prev_gp;
    if (beta <= 0.0f)
        return;
    if (beta > 0.8f)
        beta = 0.8f;
    for (int n = lag; n < SUB_N; ++n)
        c[n] += beta * c[n - lag];
}

/* algebraic codebook: 3 pulses on tracks (sf+j)%4, positions t+4m */
static void code_decode(int sf, int pos_idx[3], int sign_bits,
                        float *c)
{
    memset(c, 0, SUB_N * sizeof(float));
    for (int j = 0; j < 3; ++j) {
        int track = (sf + j) & 3;
        int m = pos_idx[j];
        if (m > 14)
            m = 14;             /* index 15 unused by the encoder */
        int p = track + 4 * m;
        float s = ((sign_bits >> (2 - j)) & 1) ? 1.0f : -1.0f;
        c[p] += s;
    }
}

/* predictor state is block-scoped: the transport unit is a 2-frame
 * 690-short block decoded by a fresh exe process (voice.py:73), so both
 * sides reset the LSF/gain predictors at every even frame — streaming
 * and per-block invocations then make IDENTICAL decisions */
static void predictor_block_reset(tetra_celp_state *st)
{
    if ((st->frame_index & 1) == 0) {
        for (int i = 0; i < LP_ORDER; ++i)
            st->lsf_prev_q[i] = LSF_MEAN[i];
        for (int i = 0; i < 4; ++i)
            st->energy_hist[i] = 0.0f;
        st->gp_prev_q = 0.0f;      /* sharpening off at block starts */
    }
}

void celp_init(tetra_celp_state *st)
{
    memset(st, 0, sizeof(*st));
    for (int i = 0; i < LP_ORDER; ++i) {
        st->lsf_prev_q[i] = LSF_MEAN[i];
        st->lsf_conceal[i] = LSF_MEAN[i];
    }
    for (int i = 0; i < 4; ++i)
        st->energy_hist[i] = 0.0f;   /* zero prediction error */
    st->prev_lag = 60;
    st->postf_gain_smooth = 1.0f;
    st->prng = 0x13572468u;
    build_interp3();
}

/* ================= encoder ================= */

void celp_encode_frame(tetra_celp_state *st, const float *speech,
                       uint8_t bits[BITS_PER_FRAME])
{
    memset(bits, 0, BITS_PER_FRAME);
    predictor_block_reset(st);
    st->frame_index++;

    /* --- preprocess: 2nd-order 80 Hz high-pass --- */
    float s[FRAME_N];
    {
        /* butter(2, 80/4000, 'high') */
        const double b0 = 0.95654323, b1 = -1.91308645, b2 = 0.95654323;
        const double a1 = -1.91119707, a2 = 0.91497583;
        double x1 = st->hp_mem[0], x2 = st->hp_mem[1];
        double y1 = st->hp_mem[2], y2 = st->hp_mem[3];
        for (int n = 0; n < FRAME_N; ++n) {
            double x0 = speech[n];
            double y0 = b0 * x0 + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2;
            x2 = x1; x1 = x0; y2 = y1; y1 = y0;
            s[n] = (float)y0;
        }
        st->hp_mem[0] = (float)x1; st->hp_mem[1] = (float)x2;
        st->hp_mem[2] = (float)y1; st->hp_mem[3] = (float)y2;
    }

    /* speech_hist: [60 past | FRAME_N current] */
    float *sp = st->speech_hist + 60;
    memcpy(st->speech_hist, sp + FRAME_N - 60, 60 * sizeof(float));
    memcpy(sp, s, FRAME_N * sizeof(float));
    int fresh = ((st->frame_index - 1) & 1) == 0;

    /* --- LP analysis: Hamming window over [last 60 of prev | 240] --- */
    float a_q[LP_ORDER + 1], lsf[LP_ORDER], lsf_q[LP_ORDER];
    {
        /* 300-sample Hamming window over [60 prev | 240 current]:
         * spectral continuity across frames without lookahead */
        enum { WIN = 60 + FRAME_N };
        float w[WIN], r[LP_ORDER + 1], a[LP_ORDER + 1];
        for (int n = 0; n < WIN; ++n)
            w[n] = st->speech_hist[n] * (0.54f - 0.46f * cosf(
                2.0f * (float)M_PI * n / (WIN - 1)));
        autocorr(w, WIN, r, LP_ORDER);
        levinson(r, a, LP_ORDER);
        a_to_lsf(a, lsf, st->lsf_prev_q);
        lsf_stabilize(lsf);
        int idx[LP_ORDER];
        lsf_quantize(st, lsf, lsf_q, idx);
        lsf_stabilize(lsf_q);
        int off = 0;
        for (int i = 0; i < LP_ORDER; ++i) {
            put_bits(bits, off, LSF_BITS[i], idx[i]);
            off += LSF_BITS[i];
        }
    }
    float lsf_prev_q[LP_ORDER];
    memcpy(lsf_prev_q, st->lsf_prev_q, sizeof(lsf_prev_q));
    memcpy(st->lsf_prev_q, lsf_q, sizeof(lsf_q));

    /* --- open-loop pitch on the (lightly) weighted frame.  A plain
     * argmax is prone to pitch DOUBLING (2T scores nearly as well as T
     * on strongly periodic frames); favor the shortest lag whose score
     * is within 15% of the best, and lags near the previous frame's
     * estimate (continuity), G.729-style. --- */
    int t_ol = 60;
    {
        float score_at[PIT_MAX + 1];
        float best = -1e30f;
        for (int T = PIT_MIN; T <= PIT_MAX; ++T) {
            double num = 0.0, den = 1e-6;
            for (int n = T; n < FRAME_N; ++n) {
                num += (double)s[n] * s[n - T];
                den += (double)s[n - T] * s[n - T];
            }
            score_at[T] = (float)(num * fabs(num) / den);
            if (score_at[T] > best) {
                best = score_at[T];
                t_ol = T;
            }
        }
        if (best > 0.0f) {
            for (int T = PIT_MIN; T < t_ol; ++T) {
                float w = 1.0f;
                int dd = T - st->prev_lag;
                if (dd < 0) dd = -dd;
                if (dd <= 3)
                    w = 0.8f;            /* continuity bonus */
                if (score_at[T] > 0.85f * w * best
                    && 2 * T >= t_ol - 3 && 2 * T <= t_ol + 3) {
                    t_ol = T;            /* halve a doubled estimate */
                    break;
                }
            }
        }
    }

    float *exc = st->exc + PIT_MAX + SUB_N;   /* current frame region */

    for (int sf = 0; sf < SUBFRAMES; ++sf) {
        const float *ssub = s + sf * SUB_N;
        float *esub = exc + sf * SUB_N;

        lsf_interp(lsf_prev_q, lsf_q, sf, fresh, a_q);

        /* impulse response of 1/Aq(z/gamma) */
        float ag[LP_ORDER + 1], h[SUB_N];
        weight_az(a_q, GAMMA_W, ag);
        {
            float delta[SUB_N];
            float zmem[LP_ORDER] = {0};
            memset(delta, 0, sizeof(delta));
            delta[0] = 1.0f;
            syn_filter(ag, delta, h, SUB_N, zmem, 0);
        }

        /* residual and weighted target x = 1/Aq(z/g) * res with the
         * running weighted-error memory */
        float res[SUB_N], x[SUB_N];
        {
            float hist[LP_ORDER];
            const float *ptr = st->speech_hist + 60
                + sf * SUB_N;           /* current subframe start */
            for (int i = 0; i < LP_ORDER; ++i)
                hist[i] = ptr[i - LP_ORDER];
            residu_filter(a_q, ssub, res, SUB_N, hist);
            float mem[LP_ORDER];
            memcpy(mem, st->w_err_mem, sizeof(mem));
            syn_filter(ag, res, x, SUB_N, mem, 0);
        }

        /* --- adaptive codebook search --- */
        int t3_lo, t3_hi;
        if (sf % 2 == 0) {
            int lo = t_ol - 5, hi = t_ol + 5;
            if (lo < PIT_MIN) lo = PIT_MIN;
            if (hi > PIT_MAX) hi = PIT_MAX;
            t3_lo = 3 * lo;
            t3_hi = 3 * hi + 2;
            if (t3_hi > 3 * PIT_MAX) t3_hi = 3 * PIT_MAX;
        } else {
            t3_lo = clamp_t3(3 * st->prev_lag - 15);
            t3_hi = clamp_t3(3 * st->prev_lag + 16);
        }
        int best_t3 = t3_lo;
        float best_score = -1e30f, y1[SUB_N], v[SUB_N];
        float best_v[SUB_N], best_y1[SUB_N];
        for (int t3 = t3_lo; t3 <= t3_hi; ++t3) {
            int T = t3 / 3;
            if (sf % 2 == 0 && T >= PIT_FR_MAX && (t3 % 3) != 0)
                continue;       /* integer-only upper range (abs code) */
            acb_vector(esub, t3, v);
            conv_h(v, h, y1);
            float cy = dot(x, y1, SUB_N);
            float yy = dot(y1, y1, SUB_N) + 1e-6f;
            float score = cy * cy / yy;
            if (score > best_score) {
                best_score = score;
                best_t3 = t3;
                memcpy(best_v, v, sizeof(v));
                memcpy(best_y1, y1, sizeof(y1));
            }
        }
        int T_int = best_t3 / 3;
        st->prev_lag = T_int;

        float gp = dot(x, best_y1, SUB_N)
            / (dot(best_y1, best_y1, SUB_N) + 1e-6f);
        if (gp < 0.0f) gp = 0.0f;
        if (gp > 1.2f) gp = 1.2f;
        int gp_idx = 0;
        {
            float bd = 1e30f;
            for (int i = 0; i < 8; ++i) {
                float d = fabsf(gp - GP_TABLE[i]);
                if (d < bd) {
                    bd = d;
                    gp_idx = i;
                }
            }
        }
        float gp_q = GP_TABLE[gp_idx];

        /* --- algebraic codebook search (pitch-sharpened impulse
         * response: the search and the synthesis see the same
         * sharpened innovation) --- */
        int lag_sh = T_int;
        float h_sh[SUB_N];
        memcpy(h_sh, h, sizeof(h_sh));
        pitch_sharpen(h_sh, lag_sh, st->gp_prev_q);
        float x2[SUB_N], d[SUB_N], phi[SUB_N][SUB_N];
        for (int n = 0; n < SUB_N; ++n)
            x2[n] = x[n] - gp_q * best_y1[n];
        for (int i = 0; i < SUB_N; ++i) {
            double acc = 0.0;
            for (int n = i; n < SUB_N; ++n)
                acc += (double)x2[n] * h_sh[n - i];
            d[i] = (float)acc;
        }
        for (int i = 0; i < SUB_N; ++i)
            for (int j = i; j < SUB_N; ++j) {
                double acc = 0.0;
                for (int n = j; n < SUB_N; ++n)
                    acc += (double)h_sh[n - i] * h_sh[n - j];
                phi[i][j] = phi[j][i] = (float)acc;
            }
        int tr[3] = {sf & 3, (sf + 1) & 3, (sf + 2) & 3};
        int best_m[3] = {0, 0, 0};
        float bestC = -1e30f;
        for (int m0 = 0; m0 < 15; ++m0) {
            int p0 = tr[0] + 4 * m0;
            float s0 = d[p0] >= 0 ? 1.0f : -1.0f;
            float c0 = s0 * d[p0];
            for (int m1 = 0; m1 < 15; ++m1) {
                int p1 = tr[1] + 4 * m1;
                float s1 = d[p1] >= 0 ? 1.0f : -1.0f;
                float c01 = c0 + s1 * d[p1];
                float e01 = phi[p0][p0] + phi[p1][p1]
                    + 2.0f * s0 * s1 * phi[p0][p1];
                for (int m2 = 0; m2 < 15; ++m2) {
                    int p2 = tr[2] + 4 * m2;
                    float s2 = d[p2] >= 0 ? 1.0f : -1.0f;
                    float C = c01 + s2 * d[p2];
                    float E = e01 + phi[p2][p2]
                        + 2.0f * s2 * (s0 * phi[p0][p2]
                                       + s1 * phi[p1][p2]);
                    float score = C * C / (E + 1e-6f);
                    if (score > bestC) {
                        bestC = score;
                        best_m[0] = m0;
                        best_m[1] = m1;
                        best_m[2] = m2;
                    }
                }
            }
        }
        int signs = 0;
        float c[SUB_N];
        memset(c, 0, sizeof(c));
        for (int j = 0; j < 3; ++j) {
            int p = tr[j] + 4 * best_m[j];
            int sbit = d[p] >= 0 ? 1 : 0;
            signs |= sbit << (2 - j);
            c[p] += sbit ? 1.0f : -1.0f;
        }
        pitch_sharpen(c, lag_sh, st->gp_prev_q);

        /* --- joint gain-pair search: argmin ||x - gp*y1 - gc*y2||^2
         * over the 8x8 quantizer grid (5 precomputed correlations) --- */
        float y2[SUB_N];
        conv_h(c, h, y2);
        float e_pred = gain_predict(st);
        float xy1 = dot(x, best_y1, SUB_N), xy2 = dot(x, y2, SUB_N);
        float y11 = dot(best_y1, best_y1, SUB_N);
        float y22 = dot(y2, y2, SUB_N);
        float y12 = dot(best_y1, y2, SUB_N);
        int gc_idx = 0;
        {
            /* block-start subframes: the 2-frame-per-exe invocation
             * pattern (voice.py:73) gives the decoder an EMPTY adaptive
             * codebook at each block start, so the encoder codes the
             * first subframes innovation-heavy (gp capped), like a
             * voiced onset — streaming and per-block decode then hear
             * the same thing */
#ifndef FRESH_GP_SF0
#define FRESH_GP_SF0 3         /* tuning-sweep hooks (index caps) */
#endif
#ifndef FRESH_GP_SF1
#define FRESH_GP_SF1 6
#endif
            int gp_max = (fresh && sf == 0) ? FRESH_GP_SF0
                         : (fresh && sf == 1) ? FRESH_GP_SF1 : 8;
            float berr = 1e30f;
            for (int i = 0; i < gp_max; ++i) {
                float a1 = GP_TABLE[i];
                for (int j = 0; j < 8; ++j) {
                    float eq = e_pred + GC_DELTA_DB[j];
                    if (eq < GC_MIN_DB) eq = GC_MIN_DB;
                    float a2 = powf(10.0f, eq / 20.0f);
                    float err = a1 * a1 * y11 + a2 * a2 * y22
                        + 2.0f * a1 * a2 * y12
                        - 2.0f * a1 * xy1 - 2.0f * a2 * xy2;
                    if (err < berr) {
                        berr = err;
                        gp_idx = i;
                        gc_idx = j;
                    }
                }
            }
        }
        gp_q = GP_TABLE[gp_idx];
        float e_q = e_pred + GC_DELTA_DB[gc_idx];
        if (e_q < GC_MIN_DB) e_q = GC_MIN_DB;
        float gc_q = powf(10.0f, e_q / 20.0f);
        gain_update(st, GC_DELTA_DB[gc_idx]);
        st->gp_prev_q = gp_q;
#ifdef GAIN_STATS
        {
            /* diagnostic build: unquantized optima vs chosen indices,
             * for sizing the gain tables (stderr, one line/subframe) */
            float det = y11 * y22 - y12 * y12;
            float gpo = 0.0f, gco = 0.0f;
            if (fabsf(det) > 1e-9f) {
                gpo = (xy1 * y22 - xy2 * y12) / det;
                gco = (xy2 * y11 - xy1 * y12) / det;
            }
            float eo = (gco > 1e-9f) ? 20.0f * log10f(gco) : GC_MIN_DB;
            fprintf(stderr, "GAINS gp_idx=%d gc_idx=%d gp_opt=%.3f "
                    "delta_opt=%.2f e_opt=%.2f\n", gp_idx, gc_idx, gpo,
                    eo - e_pred, eo);
        }
#endif

        /* --- build excitation, update AbS memory --- */
        float diff[SUB_N];
        for (int n = 0; n < SUB_N; ++n) {
            esub[n] = gp_q * best_v[n] + gc_q * c[n];
            diff[n] = res[n] - esub[n];
        }
        {
            float tmp[SUB_N];
            syn_filter(ag, diff, tmp, SUB_N, st->w_err_mem, 1);
        }

        /* --- pack --- */
        int off = SF_OFF[sf];
        if (sf % 2 == 0)
            put_bits(bits, off, 8, pitch_abs_encode(best_t3));
        else
            put_bits(bits, off, 5, best_t3 - t3_lo);
        off += SF_PITCH_BITS[sf];
        put_bits(bits, off, 3, gp_idx);
        put_bits(bits, off + 3, 3, gc_idx);
        off += 6;
        for (int j = 0; j < 3; ++j)
            put_bits(bits, off + 4 * j, 4, best_m[j]);
        put_bits(bits, off + 12, 3, signs);
    }
    bits[136] = 0;   /* spare */

    /* roll excitation history */
    memmove(st->exc, st->exc + FRAME_N,
            (PIT_MAX + SUB_N) * sizeof(float));
}

/* ================= decoder ================= */

static uint32_t prng_next(uint32_t *s)
{
    *s = *s * 1664525u + 1013904223u;
    return *s;
}

void celp_decode_frame(tetra_celp_state *st,
                       const uint8_t bits[BITS_PER_FRAME], int bfi,
                       float *speech_out)
{
    predictor_block_reset(st);
    st->frame_index++;
    int fresh = ((st->frame_index - 1) & 1) == 0;
    float lsf_q[LP_ORDER], lsf_prev_q[LP_ORDER];
    memcpy(lsf_prev_q, st->lsf_prev_q, sizeof(lsf_prev_q));

    if (!bfi) {
        int idx[LP_ORDER], off = 0;
        for (int i = 0; i < LP_ORDER; ++i) {
            idx[i] = get_bits(bits, off, LSF_BITS[i]);
            off += LSF_BITS[i];
        }
        lsf_dequantize(st, idx, lsf_q);
        st->bad_frame_count = 0;
    } else {
        /* concealment: hold spectrum, drift slightly toward the mean */
        st->bad_frame_count++;
        for (int i = 0; i < LP_ORDER; ++i)
            lsf_q[i] = 0.9f * st->lsf_conceal[i] + 0.1f * LSF_MEAN[i];
        lsf_stabilize(lsf_q);
    }
    memcpy(st->lsf_prev_q, lsf_q, sizeof(lsf_q));
    memcpy(st->lsf_conceal, lsf_q, sizeof(lsf_q));

    float *exc = st->exc + PIT_MAX + SUB_N;

    for (int sf = 0; sf < SUBFRAMES; ++sf) {
        float *esub = exc + sf * SUB_N;
        float a_q[LP_ORDER + 1];
        lsf_interp(lsf_prev_q, lsf_q, sf, fresh, a_q);

        int t3;
        float gp_q, gc_q, c[SUB_N];
        if (!bfi) {
            int off = SF_OFF[sf];
            if (sf % 2 == 0) {
                t3 = pitch_abs_decode(get_bits(bits, off, 8));
            } else {
                int t3_lo = clamp_t3(3 * st->prev_lag - 15);
                t3 = clamp_t3(t3_lo + get_bits(bits, off, 5));
            }
            off += SF_PITCH_BITS[sf];
            int gp_idx = get_bits(bits, off, 3);
            int gc_idx = get_bits(bits, off + 3, 3);
            off += 6;
            int pos[3];
            for (int j = 0; j < 3; ++j)
                pos[j] = get_bits(bits, off + 4 * j, 4);
            int signs = get_bits(bits, off + 12, 3);
            code_decode(sf, pos, signs, c);
            pitch_sharpen(c, t3 / 3, st->gp_prev_q);

            gp_q = GP_TABLE[gp_idx];
            float e_q = gain_predict(st) + GC_DELTA_DB[gc_idx];
            if (e_q < GC_MIN_DB) e_q = GC_MIN_DB;
            gc_q = powf(10.0f, e_q / 20.0f);
            gain_update(st, GC_DELTA_DB[gc_idx]);
            st->gp_conceal = gp_q;
            st->gc_conceal = gc_q;
            st->gp_prev_q = gp_q;
        } else {
            t3 = 3 * st->prev_lag;
            gp_q = st->gp_conceal * 0.9f;
            if (gp_q > 1.0f) gp_q = 1.0f;
            gc_q = st->gc_conceal * 0.8f;
            if (st->bad_frame_count > 6) {
                gp_q = 0.0f;
                gc_q = 0.0f;
            }
            st->gp_conceal = gp_q;
            st->gc_conceal = gc_q;
            /* random innovation keeps comfort energy */
            memset(c, 0, sizeof(c));
            for (int j = 0; j < 3; ++j) {
                int p = (int)(prng_next(&st->prng) % SUB_N);
                c[p] += (prng_next(&st->prng) & 1) ? 1.0f : -1.0f;
            }
            /* drift the gain predictor down during loss */
            gain_update(st, -3.0f);
        }
        st->prev_lag = t3 / 3;

        float v[SUB_N];
        acb_vector(esub, t3, v);
        for (int n = 0; n < SUB_N; ++n)
            esub[n] = gp_q * v[n] + gc_q * c[n];

        /* synthesis + postfilter */
        float synth[SUB_N];
        syn_filter(a_q, esub, synth, SUB_N, st->synth_mem, 1);

#ifdef ORACLE_POSTF_OFF
        /* diagnostic build: skip the formant postfilter to measure its
         * waveform-SNR cost (perceptual enhancers trade waveform
         * fidelity; this knob quantifies the trade) */
        for (int n = 0; n < SUB_N; ++n) {
            float o = synth[n];
            if (o > 32767.0f) o = 32767.0f;
            if (o < -32768.0f) o = -32768.0f;
            speech_out[sf * SUB_N + n] = o;
        }
        continue;
#endif

        float an[LP_ORDER + 1], ad[LP_ORDER + 1];
        weight_az(a_q, GAMMA_PF_NUM, an);
        weight_az(a_q, GAMMA_PF_DEN, ad);
        float r[SUB_N], pf[SUB_N];
        {
            float hist[LP_ORDER];
            for (int i = 0; i < LP_ORDER; ++i)
                hist[i] = st->postf_mem_num[i];
            residu_filter(an, synth, r, SUB_N, hist);
            /* keep the numerator history = last synth samples */
            for (int i = 0; i < LP_ORDER; ++i)
                st->postf_mem_num[i] = synth[SUB_N - LP_ORDER + i];
        }
        syn_filter(ad, r, pf, SUB_N, st->postf_mem_den, 1);

        /* tilt compensation: cancel the spectral tilt the FORMANT FILTER
         * introduces — k1 of the filter's truncated impulse response
         * (G.729-style), NOT of the signal.  (An earlier version used
         * the signal's own k1; voiced speech has k1 ~ 0.9, so it
         * high-passed the speech itself — measured −2.6 dB segSNR.) */
#ifndef ORACLE_TILT_OFF
        {
            enum { HT = 32 };
            float hf[HT], zmem[LP_ORDER] = {0}, rsp[HT];
            memset(hf, 0, sizeof(hf));
            hf[0] = 1.0f;
            /* impulse response of A(z/gn)/A(z/gd): residual of an then
             * synthesis by ad */
            {
                float hist[LP_ORDER] = {0};
                residu_filter(an, hf, rsp, HT, hist);
            }
            syn_filter(ad, rsp, hf, HT, zmem, 0);
            double r0 = 1e-6, r1 = 0.0;
            for (int n = 1; n < HT; ++n) {
                r0 += (double)hf[n] * hf[n];
                r1 += (double)hf[n] * hf[n - 1];
            }
            r0 += (double)hf[0] * hf[0];
            float k1 = (float)(r1 / r0);
            float mu = TILT_FACTOR * k1;
            if (mu > 0.5f) mu = 0.5f;
            if (mu < -0.5f) mu = -0.5f;
            float prev = st->postf_tilt_mem;
            for (int n = 0; n < SUB_N; ++n) {
                float t = pf[n];
                pf[n] = pf[n] - mu * prev;
                prev = t;
            }
            st->postf_tilt_mem = prev;
        }
#endif

        /* AGC against the unfiltered synthesis */
        {
            float e_in = dot(synth, synth, SUB_N) + 1e-6f;
            float e_out = dot(pf, pf, SUB_N) + 1e-6f;
            float g = sqrtf(e_in / e_out);
#ifdef ORACLE_AGC_INSTANT
            st->postf_gain_smooth = g;
#else
            st->postf_gain_smooth = 0.85f * st->postf_gain_smooth
                + 0.15f * g;
#endif
            for (int n = 0; n < SUB_N; ++n) {
                float o = pf[n] * st->postf_gain_smooth;
                if (o > 32767.0f) o = 32767.0f;
                if (o < -32768.0f) o = -32768.0f;
                speech_out[sf * SUB_N + n] = o;
            }
        }
    }

    memmove(st->exc, st->exc + FRAME_N,
            (PIT_MAX + SUB_N) * sizeof(float));
}
