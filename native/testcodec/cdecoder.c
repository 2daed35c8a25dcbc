/* Test-fixture TETRA channel decoder — I/O-contract stand-in.
 *
 * NOT the ETSI EN 300 395-2 ACELP codec (whose source cannot be fetched in
 * this no-network environment; build the real one with
 * tools/install_tetra_codec.py from a locally supplied ETSI zip).  This
 * stand-in implements the exact file contract (audio/voice.py:77-99,
 * tools/verify_codec.py) so the subprocess voice path can be exercised end
 * to end:
 *
 *   input:  N frames of 690 int16 LE; word 0 = 0x6B21, words 1.. = soft
 *           bits in -127..127 at the Write_Tetra_File positions
 *   output: per input frame, 2 speech frames of (BFI + 137) int16 LE
 *           (552 bytes): BFI=0, bits hard-decided from the soft values
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define FRAME_SHORTS 690
#define HEADER 0x6B21
#define BITS_PER_SPEECH 137

static const int ranges[4][2] = {{1, 115}, {116, 230}, {231, 345}, {346, 436}};

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s input.tet output.serial\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    if (!in) { perror("input"); return 1; }
    FILE *out = fopen(argv[2], "wb");
    if (!out) { perror("output"); fclose(in); return 1; }

    int16_t frame[FRAME_SHORTS];
    int frames = 0;
    while (fread(frame, sizeof(int16_t), FRAME_SHORTS, in) == FRAME_SHORTS) {
        if ((uint16_t)frame[0] != HEADER) {
            fprintf(stderr, "bad header 0x%04X in frame %d\n",
                    (uint16_t)frame[0], frames);
            continue;
        }
        int16_t soft[432];
        int idx = 0;
        for (int r = 0; r < 4; ++r)
            for (int i = ranges[r][0]; i < ranges[r][1] && idx < 432; ++i)
                soft[idx++] = frame[i];
        for (int sp = 0; sp < 2; ++sp) {
            int16_t serial[1 + BITS_PER_SPEECH];
            serial[0] = 0;  /* BFI */
            for (int b = 0; b < BITS_PER_SPEECH; ++b) {
                int k = sp * BITS_PER_SPEECH + b;
                serial[1 + b] = (k < 432 && soft[k] > 0) ? 1 : 0;
            }
            fwrite(serial, sizeof(int16_t), 1 + BITS_PER_SPEECH, out);
        }
        ++frames;
    }
    fclose(in);
    fclose(out);
    fprintf(stderr, "testcodec cdecoder: %d frames\n", frames);
    return 0;
}
