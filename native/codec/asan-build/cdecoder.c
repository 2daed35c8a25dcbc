/* cdecoder — TETRA channel decoder executable (spec-derived, see
 * tetra_channel.c).  Usage: cdecoder input.tet output.serial
 *
 * input: 690-word soft blocks (header 0x6B21; 432 soft bits, sign =
 * bit, magnitude = confidence — the receive chain feeds real demod
 * LLRs here, audio/blocks.py).  Per block: de-interleave, de-puncture,
 * soft Viterbi, CRC-8 -> BFI, emit 2 x (BFI + 137) serial frames.
 * Contract parity: reference tetraear/audio/voice.py:122-173 (output
 * size 552 bytes per block, BFI word first). */
#include <stdio.h>

#include "serial_io.h"

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.tet output.serial\n", argv[0]);
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

    float soft[TCH_S_BLOCK];
    uint8_t f1[BITS_PER_FRAME], f2[BITS_PER_FRAME];
    int blocks = 0, bad = 0, skipped = 0;
    while (read_tet_block(in, soft, &skipped)) {
        int bfi = tch_s_decode(soft, f1, f2);
        write_serial_frame(out, bfi, f1);
        write_serial_frame(out, bfi, f2);
        ++blocks;
        bad += bfi;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "cdecoder: %d blocks (%d bad, %d skipped)\n",
            blocks, bad, skipped);
    return 0;
}
