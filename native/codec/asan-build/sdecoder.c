/* sdecoder — TETRA speech decoder executable (spec-derived, see
 * tetra_codec.h).  Usage: sdecoder input.serial output.pcm
 *
 * input: (BFI + 137) int16 words per frame (cdecoder/scoder output);
 * output: 240 x int16 LE PCM @ 8 kHz per frame.  BFI frames run the
 * concealment path.  Contract parity: tetraear/audio/voice.py:175-208. */
#include <stdio.h>

#include "serial_io.h"

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.serial output.pcm\n", argv[0]);
        return 2;
    }
    FILE *in = open_or_die(argv[1], "rb");
    if (!in)
        return 1;
    FILE *out = open_or_die(argv[2], "wb");
    if (!out) {
        fclose(in);
        return 1;
    }

    tetra_celp_state st;
    celp_init(&st);

    uint8_t bits[BITS_PER_FRAME];
    int bfi, frames = 0;
    float speech[FRAME_N];
    int16_t pcm[FRAME_N];
    while (read_serial_frame(in, &bfi, bits)) {
        celp_decode_frame(&st, bits, bfi, speech);
        for (int i = 0; i < FRAME_N; ++i) {
            float v = speech[i];
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            pcm[i] = (int16_t)v;
        }
        fwrite(pcm, sizeof(int16_t), FRAME_N, out);
        ++frames;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "sdecoder: %d frames\n", frames);
    return 0;
}
