/* tetra_channel.c — TCH/S speech channel coding (EN 300 395-3
 * structure): unequal error protection over a 2-speech-frame block.
 *
 *   274 info bits (2 x 137) -> 432 coded bits:
 *     class 0   2 x 51 = 102   unprotected
 *     class 1   2 x 56 = 112   RCPC rate 8/12 (2/3)       -> 168
 *     class 2   2 x 30 =  60   + CRC-8, RCPC rate 8/18    -> 162
 *   mother code: the K=5 rate-1/4 code of EN 300 392-2 8.2.3.1.2
 *   (G1=1+D+D^4, G2=1+D^2+D^3+D^4, G3=1+D+D^2+D^3+D^4, G4=1+D+D^3+D^4
 *   — identical to tetraear_tpu/ops/viterbi.py so the Python ops and
 *   this C engine cross-validate), one continuous encoding pass over
 *   [class1 | class2 | CRC | 4 tail] with region-dependent puncturing
 *   (true rate-compatible puncturing), then (103*i mod 432) block
 *   interleaving.
 *
 *   Decode: de-interleave -> de-puncture (zero-LLR erasures) -> one
 *   soft-decision 16-state Viterbi pass -> CRC-8 check -> BFI.
 *
 * The class partition (sensitivity order) ranks bits by decode impact:
 * gain MSBs > absolute pitch MSBs > LSF MSBs > relative pitch MSBs >
 * remaining pitch/gain/LSF > pulse signs > pulse positions > spare.
 * (The exact EN 300 395-3 annex table is unavailable offline; the
 * partition sizes and coding rates are the published ones.)
 */
#include "tetra_codec.h"

#include <string.h>

/* ---- mother code (mirrors ops/viterbi.py _GENS/state convention) ---- */
static const uint8_t GENS[4][5] = {
    {1, 1, 0, 0, 1},
    {1, 0, 1, 1, 1},
    {1, 1, 1, 1, 1},
    {1, 1, 0, 1, 1},
};
#define NUM_STATES 16
#define MOTHER_RATE 4
#define CONV_MOTHER (MOTHER_RATE * CCH_CONV_IN)   /* 736 */

static uint8_t conv_out[NUM_STATES][2][4];
static uint8_t conv_nxt[NUM_STATES][2];
static int conv_ready = 0;

static void conv_tables(void)
{
    if (conv_ready)
        return;
    for (int s = 0; s < NUM_STATES; ++s) {
        int hist[4] = {(s >> 3) & 1, (s >> 2) & 1, (s >> 1) & 1, s & 1};
        for (int u = 0; u < 2; ++u) {
            int win[5] = {u, hist[0], hist[1], hist[2], hist[3]};
            for (int g = 0; g < 4; ++g) {
                int acc = 0;
                for (int t = 0; t < 5; ++t)
                    acc ^= win[t] & GENS[g][t];
                conv_out[s][u][g] = (uint8_t)acc;
            }
            conv_nxt[s][u] = (uint8_t)((u << 3) | (s >> 1));
        }
    }
    conv_ready = 1;
}

/* ---- puncturing ----
 * kept mother-bit indices, in order, for the 330 transmitted coded bits:
 * inputs 0..111 (class 1)   rate 2/3: per 2 inputs keep {0,1,4} of 8
 * inputs 112..183 (class 2) rate 8/18: per 8 inputs keep v1,v2 of every
 *                           step + v3 of steps 0 and 4 (18 of 32)
 */
#define CODED_TOTAL (CCH_CLASS1_CODED + CCH_CLASS2_CODED)   /* 330 */

static int punct_idx[CODED_TOTAL];
static int punct_ready = 0;

static void punct_table(void)
{
    if (punct_ready)
        return;
    int k = 0;
    for (int blk = 0; blk < 2 * CLASS1_PER_FRAME / 2; ++blk) {
        punct_idx[k++] = blk * 8 + 0;
        punct_idx[k++] = blk * 8 + 1;
        punct_idx[k++] = blk * 8 + 4;
    }
    int base = MOTHER_RATE * 2 * CLASS1_PER_FRAME;          /* 448 */
    int steps = CLASS2_PER_FRAME * 2 + CCH_CRC_BITS + CCH_TAIL_BITS;
    for (int i = 0; i < steps; ++i) {
        punct_idx[k++] = base + 4 * i + 0;                  /* v1 */
        punct_idx[k++] = base + 4 * i + 1;                  /* v2 */
        if ((i & 7) == 0 || (i & 7) == 4)
            punct_idx[k++] = base + 4 * i + 2;              /* v3 */
    }
    /* k must equal 168 + 162 = 330 */
    punct_ready = (k == CODED_TOTAL) ? 1 : -1;
}

/* ---- CRC-8 (poly 0x07, init 0xFF) over bits MSB-first ---- */
static uint8_t crc8_bits(const uint8_t *bits, int n)
{
    uint8_t crc = 0xFF;
    for (int i = 0; i < n; ++i) {
        crc ^= (uint8_t)((bits[i] & 1) << 7);
        for (int b = 0; b < 1; ++b)
            crc = (uint8_t)((crc & 0x80) ? (crc << 1) ^ 0x07 : crc << 1);
    }
    return crc;
}

/* ---- sensitivity partition ---- */
void tch_s_sensitivity_order(int order[BITS_PER_FRAME])
{
    static const int sfo[4] = {26, 55, 81, 110};
    static const int pb[4] = {8, 5, 8, 5};
    static const int lsfb[LP_ORDER] = {3, 3, 3, 3, 3, 3, 2, 2, 2, 2};
    int lsfo[LP_ORDER], o = 0, k = 0, go[4];
    for (int i = 0; i < LP_ORDER; ++i) {
        lsfo[i] = o;
        o += lsfb[i];
    }
    for (int s = 0; s < 4; ++s)
        go[s] = sfo[s] + pb[s];

    /* class 2 (30) */
    for (int s = 0; s < 4; ++s) {
        order[k++] = go[s];          /* adaptive-gain MSB */
        order[k++] = go[s] + 3;      /* fixed-gain MSB */
    }
    for (int s = 0; s < 4; s += 2)
        for (int b = 0; b < 4; ++b)
            order[k++] = sfo[s] + b; /* absolute pitch MSBs */
    for (int c = 0; c < 6; ++c)
        order[k++] = lsfo[c];        /* low-LSF MSBs */
    for (int s = 0; s < 4; ++s)
        order[k++] = go[s] + 1;      /* adaptive-gain bit 1 */
    for (int s = 1; s < 4; s += 2)
        for (int b = 0; b < 2; ++b)
            order[k++] = sfo[s] + b; /* relative pitch MSBs */

    /* class 1 (56) */
    for (int s = 0; s < 4; s += 2)
        for (int b = 4; b < 8; ++b)
            order[k++] = sfo[s] + b;
    for (int s = 1; s < 4; s += 2)
        for (int b = 2; b < 5; ++b)
            order[k++] = sfo[s] + b;
    for (int s = 0; s < 4; ++s) {
        order[k++] = go[s] + 2;
        order[k++] = go[s] + 4;
        order[k++] = go[s] + 5;
    }
    for (int c = 0; c < 6; ++c)
        for (int b = 1; b < 3; ++b)
            order[k++] = lsfo[c] + b;
    for (int c = 6; c < 8; ++c)
        for (int b = 0; b < 2; ++b)
            order[k++] = lsfo[c] + b;
    order[k++] = lsfo[8];
    order[k++] = lsfo[9];
    for (int s = 0; s < 4; ++s)
        for (int b = 0; b < 3; ++b)
            order[k++] = go[s] + 18 + b;   /* pulse signs */

    /* class 0 (51) */
    order[k++] = lsfo[8] + 1;
    order[k++] = lsfo[9] + 1;
    for (int s = 0; s < 4; ++s)
        for (int b = 0; b < 12; ++b)
            order[k++] = go[s] + 6 + b;    /* pulse positions */
    order[k++] = 136;                      /* spare */
}

/* ---- interleaver: transmitted[(103*i) mod 432] = linear[i] ---- */
static int il_pos(int i)
{
    return (int)(((long)INTERLEAVE_A * i) % TCH_S_BLOCK);
}

void tch_s_encode(const uint8_t bits_f1[BITS_PER_FRAME],
                  const uint8_t bits_f2[BITS_PER_FRAME],
                  uint8_t coded[TCH_S_BLOCK])
{
    conv_tables();
    punct_table();
    int order[BITS_PER_FRAME];
    tch_s_sensitivity_order(order);

    /* class split */
    uint8_t conv_in[CCH_CONV_IN];
    uint8_t class0[2 * CLASS0_PER_FRAME];
    uint8_t class2[2 * CLASS2_PER_FRAME];
    int k1 = 0;
    for (int f = 0; f < 2; ++f) {
        const uint8_t *b = f ? bits_f2 : bits_f1;
        for (int i = 0; i < CLASS1_PER_FRAME; ++i)
            conv_in[k1++] = b[order[CLASS2_PER_FRAME + i]] & 1;
    }
    for (int f = 0; f < 2; ++f) {
        const uint8_t *b = f ? bits_f2 : bits_f1;
        for (int i = 0; i < CLASS2_PER_FRAME; ++i)
            class2[f * CLASS2_PER_FRAME + i] = b[order[i]] & 1;
        for (int i = 0; i < CLASS0_PER_FRAME; ++i)
            class0[f * CLASS0_PER_FRAME + i] =
                b[order[CLASS2_PER_FRAME + CLASS1_PER_FRAME + i]] & 1;
    }
    memcpy(conv_in + 2 * CLASS1_PER_FRAME, class2, sizeof(class2));
    uint8_t crc = crc8_bits(class2, 2 * CLASS2_PER_FRAME);
    for (int i = 0; i < CCH_CRC_BITS; ++i)
        conv_in[2 * CLASS1_PER_FRAME + 2 * CLASS2_PER_FRAME + i] =
            (uint8_t)((crc >> (7 - i)) & 1);
    for (int i = 0; i < CCH_TAIL_BITS; ++i)
        conv_in[CCH_CONV_IN - CCH_TAIL_BITS + i] = 0;

    /* mother encode + puncture */
    uint8_t mother[CONV_MOTHER];
    int s = 0, m = 0;
    for (int i = 0; i < CCH_CONV_IN; ++i) {
        int u = conv_in[i];
        for (int g = 0; g < 4; ++g)
            mother[m++] = conv_out[s][u][g];
        s = conv_nxt[s][u];
    }
    uint8_t linear[TCH_S_BLOCK];
    memcpy(linear, class0, sizeof(class0));
    for (int i = 0; i < CODED_TOTAL; ++i)
        linear[2 * CLASS0_PER_FRAME + i] = mother[punct_idx[i]];

    for (int i = 0; i < TCH_S_BLOCK; ++i)
        coded[il_pos(i)] = linear[i];
}

int tch_s_decode(const float soft[TCH_S_BLOCK],
                 uint8_t bits_f1[BITS_PER_FRAME],
                 uint8_t bits_f2[BITS_PER_FRAME])
{
    conv_tables();
    punct_table();
    int order[BITS_PER_FRAME];
    tch_s_sensitivity_order(order);

    /* de-interleave */
    float linear[TCH_S_BLOCK];
    for (int i = 0; i < TCH_S_BLOCK; ++i)
        linear[i] = soft[il_pos(i)];

    /* de-puncture onto the mother grid (0 = erasure) */
    float llr[CONV_MOTHER];
    memset(llr, 0, sizeof(llr));
    for (int i = 0; i < CODED_TOTAL; ++i)
        llr[punct_idx[i]] = linear[2 * CLASS0_PER_FRAME + i];

    /* soft Viterbi, terminated at state 0 */
    float metric[NUM_STATES], next_metric[NUM_STATES];
    static uint8_t decisions[CCH_CONV_IN][NUM_STATES];
    for (int st = 0; st < NUM_STATES; ++st)
        metric[st] = (st == 0) ? 0.0f : -1e30f;
    for (int i = 0; i < CCH_CONV_IN; ++i) {
        const float *l = llr + 4 * i;
        for (int st = 0; st < NUM_STATES; ++st)
            next_metric[st] = -1e30f;
        for (int st = 0; st < NUM_STATES; ++st) {
            if (metric[st] < -1e29f)
                continue;
            for (int u = 0; u < 2; ++u) {
                float bm = 0.0f;
                for (int g = 0; g < 4; ++g)
                    bm += conv_out[st][u][g] ? l[g] : -l[g];
                int ns = conv_nxt[st][u];
                float cand = metric[st] + bm;
                if (cand > next_metric[ns]) {
                    next_metric[ns] = cand;
                    decisions[i][ns] = (uint8_t)((st << 1) | u);
                }
            }
        }
        memcpy(metric, next_metric, sizeof(metric));
    }
    /* traceback from state 0 (tail-terminated) */
    uint8_t conv_dec[CCH_CONV_IN];
    int st = 0;
    for (int i = CCH_CONV_IN - 1; i >= 0; --i) {
        uint8_t d = decisions[i][st];
        conv_dec[i] = d & 1;
        st = d >> 1;
    }

    /* CRC check over decoded class-2 bits */
    const uint8_t *class2 = conv_dec + 2 * CLASS1_PER_FRAME;
    uint8_t crc = crc8_bits(class2, 2 * CLASS2_PER_FRAME);
    uint8_t crc_rx = 0;
    for (int i = 0; i < CCH_CRC_BITS; ++i)
        crc_rx = (uint8_t)((crc_rx << 1) |
                           (class2[2 * CLASS2_PER_FRAME + i] & 1));
    int bfi = (crc != crc_rx);

    /* reassemble the two 137-bit frames */
    memset(bits_f1, 0, BITS_PER_FRAME);
    memset(bits_f2, 0, BITS_PER_FRAME);
    for (int f = 0; f < 2; ++f) {
        uint8_t *b = f ? bits_f2 : bits_f1;
        for (int i = 0; i < CLASS2_PER_FRAME; ++i)
            b[order[i]] = class2[f * CLASS2_PER_FRAME + i];
        for (int i = 0; i < CLASS1_PER_FRAME; ++i)
            b[order[CLASS2_PER_FRAME + i]] =
                conv_dec[f * CLASS1_PER_FRAME + i];
        for (int i = 0; i < CLASS0_PER_FRAME; ++i)
            b[order[CLASS2_PER_FRAME + CLASS1_PER_FRAME + i]] =
                linear[f * CLASS0_PER_FRAME + i] > 0.0f ? 1 : 0;
    }
    return bfi;
}
