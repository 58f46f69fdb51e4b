/* MJPEG Huffman scan decoder — the host-serial hot loop of baseline JPEG
 * decode (role of reference mjpegdec.c:859 mjpeg_decode_scan + :467
 * decode_block, re-implemented for the whole-frame-to-tensor model:
 * output is per-component (blocks, 64) int16 zigzag coefficient arrays that
 * the TPU dequant+IDCT pipeline consumes in one batched call).
 *
 * Must stay byte-identical to MJPEGDecoder._huffman_scan_py. */

#include <stdint.h>
#include <string.h>
#include "bitreader.h"

#define MAX_COMPS 4

int mjpeg_decode_scan(
    const unsigned char **segs, const long long *seg_lens, int n_segs,
    const int *comp_meta, int n_comp, /* per comp: h,v,bw,bh,dcbits,acbits */
    const int **dc_vals, const signed char **dc_lens,
    const int **ac_vals, const signed char **ac_lens,
    short **out,
    int mcus_x, int mcus_y, int ns, int restart_interval)
{
    BitReader br;
    int dc_pred[MAX_COMPS];
    long long n_mcus;
    int seg_idx = 0;
    long long mcu;
    long long ri;
    int ci;

    if (n_comp < 1 || n_comp > MAX_COMPS || n_segs < 1)
        return -1;

    if (ns == 1) {
        n_mcus = (long long)comp_meta[2] * comp_meta[3]; /* bw*bh of comp 0 */
    } else {
        n_mcus = (long long)mcus_x * mcus_y;
    }
    ri = restart_interval ? restart_interval : n_mcus;

    br_init(&br, segs[0], seg_lens[0]);
    for (ci = 0; ci < n_comp; ci++)
        dc_pred[ci] = 0;

    for (mcu = 0; mcu < n_mcus; mcu++) {
        if (mcu && mcu % ri == 0) {
            seg_idx++;
            if (seg_idx < n_segs)
                br_init(&br, segs[seg_idx], seg_lens[seg_idx]);
            for (ci = 0; ci < n_comp; ci++)
                dc_pred[ci] = 0;
        }
        for (ci = 0; ci < n_comp; ci++) {
            int h = comp_meta[ci * 6 + 0];
            int v = comp_meta[ci * 6 + 1];
            int bw = comp_meta[ci * 6 + 2];
            int dcbits = comp_meta[ci * 6 + 4];
            int acbits = comp_meta[ci * 6 + 5];
            int nblk = (ns == 1) ? 1 : h * v;
            int bi;
            for (bi = 0; bi < nblk; bi++) {
                short *blk;
                int s, k;
                if (ns == 1) {
                    blk = out[ci] + mcu * 64;
                } else {
                    long long mx = mcu % mcus_x, my = mcu / mcus_x;
                    long long bx = mx * h + (bi % h);
                    long long by = my * v + (bi / h);
                    blk = out[ci] + (by * bw + bx) * 64;
                }
                /* DC */
                s = vlc_read(&br, dc_vals[ci], dc_lens[ci], dcbits);
                if (s < 0 || s > 16)
                    return -2;
                dc_pred[ci] += br_receive_signed(&br, s);
                blk[0] = (short)dc_pred[ci];
                /* AC */
                k = 0;
                while (k < 63) {
                    int rs = vlc_read(&br, ac_vals[ci], ac_lens[ci], acbits);
                    int r, sz;
                    if (rs < 0)
                        return -3;
                    r = rs >> 4;
                    sz = rs & 15;
                    if (sz == 0) {
                        if (r == 15) {
                            k += 16;
                            continue;
                        }
                        break; /* EOB */
                    }
                    k += r + 1;
                    if (k > 63)
                        return -4;
                    blk[k] = (short)br_receive_signed(&br, sz);
                }
                if (br.overread > 8)
                    return -5;
            }
        }
    }
    return 0;
}
