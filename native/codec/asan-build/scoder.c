/* scoder — TETRA speech encoder executable (spec-derived, see
 * tetra_codec.h).  Usage: scoder input.pcm output.serial
 *
 * input: raw 16-bit LE PCM @ 8 kHz; the trailing partial frame is
 * zero-padded.  Output: (BFI + 137) int16 words per 240-sample frame.
 * Contract parity: reference tools/verify_codec.py drives scoder.exe
 * the same way. */
#include <stdio.h>
#include <string.h>

#include "serial_io.h"

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.pcm output.serial\n", argv[0]);
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

    int16_t pcm[FRAME_N];
    float speech[FRAME_N];
    uint8_t bits[BITS_PER_FRAME];
    size_t got;
    int frames = 0;
    while ((got = fread(pcm, sizeof(int16_t), FRAME_N, in)) > 0) {
        for (size_t i = got; i < FRAME_N; ++i)
            pcm[i] = 0;
        for (int i = 0; i < FRAME_N; ++i)
            speech[i] = (float)pcm[i];
        celp_encode_frame(&st, speech, bits);
        write_serial_frame(out, 0, bits);
        ++frames;
        if (got < FRAME_N)
            break;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "scoder: %d frames\n", frames);
    return 0;
}
