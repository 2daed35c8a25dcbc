/* serial_io.h — shared file-format helpers for the codec executables.
 *
 * Serial stream format (matches the reference exe contract observed at
 * tetraear/audio/voice.py:159-208 and tools/verify_codec.py): per speech
 * frame, (1 + 137) little-endian int16 words — word 0 is the BFI flag
 * (0 good / 1 bad), words 1..137 are the codec bits as 0/1.
 *
 * .tet block format: 690 int16 LE words — word 0 = 0x6B21, the 432
 * coded bits as soft values (sign = bit, magnitude = confidence, +/-127
 * from the hard encoder) at positions [1,115) [116,230) [231,345)
 * [346,436); remaining words 0.
 */
#ifndef SERIAL_IO_H
#define SERIAL_IO_H

#include <stdint.h>
#include <stdio.h>

#include "tetra_codec.h"

static const int TET_RANGES[4][2] = {
    {1, 115}, {116, 230}, {231, 345}, {346, 436}};

static inline int read_serial_frame(FILE *f, int *bfi,
                             uint8_t bits[BITS_PER_FRAME])
{
    int16_t w[SERIAL_WORDS];
    if (fread(w, sizeof(int16_t), SERIAL_WORDS, f) != SERIAL_WORDS)
        return 0;
    *bfi = w[0] != 0;
    for (int i = 0; i < BITS_PER_FRAME; ++i)
        bits[i] = (uint8_t)(w[1 + i] != 0);
    return 1;
}

static inline void write_serial_frame(FILE *f, int bfi,
                               const uint8_t bits[BITS_PER_FRAME])
{
    int16_t w[SERIAL_WORDS];
    w[0] = (int16_t)(bfi ? 1 : 0);
    for (int i = 0; i < BITS_PER_FRAME; ++i)
        w[1 + i] = (int16_t)(bits[i] & 1);
    fwrite(w, sizeof(int16_t), SERIAL_WORDS, f);
}

static inline int read_tet_block(FILE *f, float soft[TCH_S_BLOCK], int *skipped)
{
    int16_t blk[TET_BLOCK_SHORTS];
    for (;;) {
        if (fread(blk, sizeof(int16_t), TET_BLOCK_SHORTS, f)
            != TET_BLOCK_SHORTS)
            return 0;
        if ((uint16_t)blk[0] == TET_HEADER)
            break;
        if (skipped)
            (*skipped)++;
    }
    int k = 0;
    for (int r = 0; r < 4; ++r)
        for (int i = TET_RANGES[r][0]; i < TET_RANGES[r][1] && k < TCH_S_BLOCK;
             ++i)
            soft[k++] = (float)blk[i];
    return 1;
}

static inline void write_tet_block(FILE *f, const uint8_t coded[TCH_S_BLOCK])
{
    int16_t blk[TET_BLOCK_SHORTS] = {0};
    blk[0] = (int16_t)TET_HEADER;
    int k = 0;
    for (int r = 0; r < 4; ++r)
        for (int i = TET_RANGES[r][0]; i < TET_RANGES[r][1] && k < TCH_S_BLOCK;
             ++i, ++k)
            blk[i] = (int16_t)(coded[k] ? TET_SOFT_MAG : -TET_SOFT_MAG);
    fwrite(blk, sizeof(int16_t), TET_BLOCK_SHORTS, f);
}

static inline FILE *open_or_die(const char *path, const char *mode)
{
    FILE *f = fopen(path, mode);
    if (!f) {
        perror(path);
        /* match the reference exes: nonzero exit, no output file */
    }
    return f;
}

#endif /* SERIAL_IO_H */
