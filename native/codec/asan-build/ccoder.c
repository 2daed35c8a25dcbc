/* ccoder — TETRA channel encoder executable (spec-derived, see
 * tetra_channel.c).  Usage: ccoder input.serial output.tet
 *
 * input: serial speech frames ((BFI + 137) int16 each); every PAIR of
 * frames is channel-coded into one 690-word .tet block (header 0x6B21,
 * 432 coded bits as +/-127).  A trailing unpaired frame is coded with a
 * silence partner.  Contract parity: reference tools/verify_codec.py
 * drives ccoder.exe serial->tet. */
#include <stdio.h>
#include <string.h>

#include "serial_io.h"

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.serial output.tet\n", argv[0]);
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

    uint8_t f1[BITS_PER_FRAME], f2[BITS_PER_FRAME];
    uint8_t coded[TCH_S_BLOCK];
    int bfi, blocks = 0;
    while (read_serial_frame(in, &bfi, f1)) {
        if (!read_serial_frame(in, &bfi, f2))
            memset(f2, 0, sizeof(f2));
        tch_s_encode(f1, f2, coded);
        write_tet_block(out, coded);
        ++blocks;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "ccoder: %d blocks\n", blocks);
    return 0;
}
