/* tetra_codec.h — spec-derived TETRA codec (EN 300 395-2/-3 structure).
 *
 * A real, from-the-published-spec implementation of the TETRA voice
 * codec pair the reference invokes as prebuilt Windows executables
 * (reference: tetraear/audio/voice.py:73-244, tools/verify_codec.py):
 *
 *   speech codec  ACELP, 30 ms / 240 samples @ 8 kHz, 4 x 60-sample
 *                 subframes, 137 bits/frame (4.567 kbit/s)
 *   channel codec TCH/S: 2 speech frames (274 bits) -> 432 bits with
 *                 unequal error protection — class 0 (51x2) unprotected,
 *                 class 1 (56x2) RCPC 8/12, class 2 (30x2) + CRC-8 RCPC
 *                 8/18; K=5 rate-1/4 mother code of EN 300 392-2
 *                 8.2.3.1.2 (same generators as tetraear_tpu/ops/
 *                 viterbi.py); (103*i mod 432) block interleaving
 *
 * HONESTY NOTE: the ETSI reference C source and its test vectors cannot
 * be fetched in this offline environment, so bit-exactness against the
 * ETSI binaries is NOT claimed.  What IS implemented for real: LP
 * analysis + LSF quantization, fractional-pitch adaptive codebook,
 * algebraic fixed codebook with analysis-by-synthesis search, gain
 * prediction/quantization, formant postfilter, bad-frame concealment,
 * and the full UEP channel coding chain with soft-decision Viterbi.
 * Encoder and decoder are exact mirrors; the channel pair round-trips
 * bit-exactly and corrects real channel errors (tests/codec/).
 * Measured operating point (round 5, tools/codec_quality.py, 3-seed
 * synthetic speech): streaming corr 0.94 / segSNR 9.5 dB; per-block
 * with the host's 4-block serial warm-up context 0.93 / 9.3 dB.  The
 * round-5 step came from re-centering the fixed-gain quantizer
 * (GC_MEAN_DB 36 -> 48 dB; the old mean saturated the +18 dB delta on
 * 59% of subframes) and re-sizing GP_TABLE around the measured optimal
 * adaptive gains (dense near 1.0).
 *
 * File contracts (must match the reference exe behavior exactly):
 *   scoder   in.pcm  out.serial   240 x int16 LE per frame ->
 *                                 (BFI + 137 bit-words) x int16 LE
 *   sdecoder in.serial out.pcm    inverse of scoder
 *   ccoder   in.serial out.tet    2 speech frames -> 690 x int16 block:
 *                                 word0 = 0x6B21, 432 coded bits as
 *                                 +/-127 soft values at positions
 *                                 [1,115) [116,230) [231,345) [346,436)
 *   cdecoder in.tet  out.serial   soft 690-block -> 2 x (BFI + 137)
 */
#ifndef TETRA_CODEC_H
#define TETRA_CODEC_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- frame geometry ---- */
#define LP_ORDER 10
#define FRAME_N 240            /* 30 ms @ 8 kHz */
#define SUBFRAMES 4
#define SUB_N 60
#define BITS_PER_FRAME 137
#define SERIAL_WORDS (1 + BITS_PER_FRAME)   /* BFI + bits */

/* ---- bit allocation (137 = 26 LSF + 8/5/8/5 pitch + 4*(6 gains
 *      + 15 code) + 1 spare) ---- */
#define LSF_BITS_TOTAL 26
#define PITCH_BITS_ABS 8       /* subframes 0 and 2 */
#define PITCH_BITS_REL 5       /* subframes 1 and 3 */
#define GAIN_BITS 6            /* 3 adaptive + 3 fixed-correction */
#define CODE_BITS 15           /* 3 pulses x 4-bit position + 3 signs */

/* ---- pitch range (GSM-EFR-style 1/3-fractional lower range) ---- */
#define PIT_MIN 20
#define PIT_MAX 143
#define PIT_FR_MAX 85          /* integer-only resolution from here up */

/* ---- channel codec geometry (per 2-frame block) ---- */
#define TCH_S_BLOCK 432
#define CLASS0_PER_FRAME 51
#define CLASS1_PER_FRAME 56
#define CLASS2_PER_FRAME 30
#define CCH_CRC_BITS 8
#define CCH_TAIL_BITS 4
#define CCH_CONV_IN (2 * CLASS1_PER_FRAME + 2 * CLASS2_PER_FRAME \
                     + CCH_CRC_BITS + CCH_TAIL_BITS)       /* 184 */
#define CCH_CLASS1_CODED 168   /* 112 @ 8/12 */
#define CCH_CLASS2_CODED 162   /* 72 @ 8/18  */
#define INTERLEAVE_A 103       /* b(i) = 103*i mod 432 */

/* ---- .tet block format (Write_Tetra_File positions) ---- */
#define TET_BLOCK_SHORTS 690
#define TET_HEADER 0x6B21
#define TET_SOFT_MAG 127

/* ================= speech codec state ================= */

typedef struct {
    /* shared predictor state (encoder runs a local decoder) */
    float lsf_prev_q[LP_ORDER];    /* previous quantized LSF (rad) */
    float energy_hist[4];          /* quantized fixed-gain energies, dB */
    float exc[PIT_MAX + SUB_N + FRAME_N]; /* excitation history + frame */
    int prev_lag;                  /* integer lag memory for relative SFs */
    float gp_prev_q;               /* prev subframe adaptive gain (sharpening) */
    int frame_index;               /* predictors reset at even frames */
    /* encoder-only */
    float speech_hist[60 + FRAME_N];  /* preprocessed speech w/ 60 history */
    float hp_mem[4];               /* preprocess high-pass state */
    float w_err_mem[LP_ORDER];     /* weighted-error filter memory */
    /* decoder-only */
    float synth_mem[LP_ORDER];
    float postf_mem_num[LP_ORDER];
    float postf_mem_den[LP_ORDER];
    float postf_tilt_mem;
    float postf_gain_smooth;
    float lsf_conceal[LP_ORDER];
    float gp_conceal, gc_conceal;
    int bad_frame_count;
    uint32_t prng;
} tetra_celp_state;

void celp_init(tetra_celp_state *st);
/* 240 float samples in [-32768,32767] -> 137 bits (0/1) */
void celp_encode_frame(tetra_celp_state *st, const float *speech,
                       uint8_t bits[BITS_PER_FRAME]);
/* 137 bits (+ bfi flag) -> 240 float samples */
void celp_decode_frame(tetra_celp_state *st,
                       const uint8_t bits[BITS_PER_FRAME], int bfi,
                       float *speech_out);

/* ================= channel codec ================= */

/* 2 x 137 info bits -> 432 hard coded bits (over-the-air order) */
void tch_s_encode(const uint8_t bits_f1[BITS_PER_FRAME],
                  const uint8_t bits_f2[BITS_PER_FRAME],
                  uint8_t coded[TCH_S_BLOCK]);
/* 432 soft bits (>0 <=> 1, magnitude = confidence) -> 2 x 137 + BFI.
 * Returns 0 on CRC pass, 1 on fail (both frames' BFI). */
int tch_s_decode(const float soft[TCH_S_BLOCK],
                 uint8_t bits_f1[BITS_PER_FRAME],
                 uint8_t bits_f2[BITS_PER_FRAME]);

/* sensitivity permutation (exposed for tests): order[0..136] = bit index
 * of the k-th most sensitive bit; first 30 = class 2, next 56 = class 1,
 * last 51 = class 0 */
void tch_s_sensitivity_order(int order[BITS_PER_FRAME]);

/* ================= shared DSP primitives ================= */

void autocorr(const float *x, int n, float *r, int order);
void levinson(const float *r, float *a, int order);      /* a[0]=1 */
void a_to_lsf(const float *a, float *lsf, const float *lsf_prev);
void lsf_to_a(const float *lsf, float *a);
void weight_az(const float *a, float gamma, float *aw);
void syn_filter(const float *a, const float *x, float *y, int n,
                float *mem, int update);
void residu_filter(const float *a, const float *x, float *y, int n,
                   const float *hist);

#ifdef __cplusplus
}
#endif
#endif /* TETRA_CODEC_H */
