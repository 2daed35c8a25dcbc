/* Test-fixture TETRA speech decoder — I/O-contract stand-in.
 *
 * NOT the ETSI ACELP synthesizer (see cdecoder.c note).  Contract:
 *   input:  speech frames of (BFI + 137) int16 LE
 *   output: 240 int16 PCM samples per speech frame (30 ms @ 8 kHz)
 * Synthesis is a deterministic bit-derived tone mix: pitch/energy/harmonic
 * parameters are read from bit groups so different inputs give audibly
 * different non-silent output (the framework rejects near-silent PCM as a
 * decode failure, audio/voice.py parity).
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

#define BITS_PER_SPEECH 137
#define SAMPLES_PER_SPEECH 240

static int bits_val(const int16_t *bits, int start, int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | (bits[start + i] ? 1 : 0);
    return v;
}

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.serial output.synth\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    if (!in) { perror("input"); return 1; }
    FILE *out = fopen(argv[2], "wb");
    if (!out) { perror("output"); fclose(in); return 1; }

    int16_t serial[1 + BITS_PER_SPEECH];
    int frames = 0;
    double phase1 = 0.0, phase2 = 0.0;
    while (fread(serial, sizeof(int16_t), 1 + BITS_PER_SPEECH, in)
           == (size_t)(1 + BITS_PER_SPEECH)) {
        int16_t pcm[SAMPLES_PER_SPEECH];
        if (serial[0] != 0) {                     /* BFI -> muted frame */
            for (int i = 0; i < SAMPLES_PER_SPEECH; ++i) pcm[i] = 0;
        } else {
            const int16_t *bits = serial + 1;
            double f1 = 150.0 + bits_val(bits, 0, 6) * 8.0;    /* 150-654 Hz */
            double f2 = 700.0 + bits_val(bits, 6, 6) * 20.0;
            double amp = 2000.0 + bits_val(bits, 12, 5) * 300.0;
            double mix = bits_val(bits, 17, 3) / 14.0;
            for (int i = 0; i < SAMPLES_PER_SPEECH; ++i) {
                phase1 += 2.0 * M_PI * f1 / 8000.0;
                phase2 += 2.0 * M_PI * f2 / 8000.0;
                double s = (1.0 - mix) * sin(phase1) + mix * sin(phase2);
                pcm[i] = (int16_t)(amp * s);
            }
        }
        fwrite(pcm, sizeof(int16_t), SAMPLES_PER_SPEECH, out);
        ++frames;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "testcodec sdecoder: %d speech frames\n", frames);
    return 0;
}
