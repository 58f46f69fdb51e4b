/* H.264 CAVLC slice decoder — the host-serial hot loop of H.264 decode
 * (role of reference h264_cavlc.c ff_h264_decode_mb_cavlc :699, tensor
 * output model: fills whole-frame FrameData arrays consumed by the TPU
 * reconstruction program in codecs/h264/device.py).
 *
 * Must stay value-identical to the Python MB loop in codecs/h264/dec.py
 * (subset: I_16x16 + P_L0_16x16/P_Skip, single reference). */

#include <stdint.h>
#include <string.h>
#include "bitreader.h"
#include "h264_cavlc_tables.h"

/* ---- exp-golomb ---- */

static inline int get_ue(BitReader *br)
{
    int zeros = 0;
    while (br_get(br, 1) == 0) {
        zeros++;
        if (zeros > 31)
            return -1;
    }
    if (zeros == 0)
        return 0;
    return (1 << zeros) - 1 + br_get(br, zeros);
}

static inline int get_se(BitReader *br)
{
    int v = get_ue(br);
    if (v < 0)
        return -0x40000000;
    return (v & 1) ? (v + 1) >> 1 : -(v >> 1);
}

/* ---- CAVLC residual (mirror of cavlc.py decode_residual) ---- */

static int nc_class(int nc)
{
    if (nc < 2) return 0;
    if (nc < 4) return 1;
    if (nc < 8) return 2;
    return 3;
}

/* returns total_coeff or -1; levels written in scan order */
static int decode_residual(BitReader *br, int nc, int max_coeff,
                           int *levels)
{
    int v, total_coeff, trailing_ones, i;
    int64_t lv[16];
    int suffix_length, total_zeros, zeros_left, pos;

    memset(levels, 0, max_coeff * sizeof(int));
    if (nc == -1)
        v = vlc_read(br, ctdc_v, ctdc_l, ctdc_bits);
    else {
        int c = nc_class(nc);
        v = vlc_read(br, ct_v[c], ct_l[c], ct_bits[c]);
    }
    if (v < 0)
        return -1;
    total_coeff = v >> 2;
    trailing_ones = v & 3;
    if (total_coeff == 0)
        return 0;
    if (total_coeff > max_coeff)
        return -1;

    for (i = 0; i < trailing_ones; i++)
        lv[i] = br_get(br, 1) ? -1 : 1;

    suffix_length = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
    for (i = trailing_ones; i < total_coeff; i++) {
        int prefix = 0, suffix_size;
        int64_t level_code;
        while (br_get(br, 1) == 0) {
            prefix++;
            if (prefix > 32)
                return -1;
        }
        if (prefix < 15) {
            suffix_size = suffix_length;
            if (prefix == 14 && suffix_length == 0)
                suffix_size = 4;
        } else {
            suffix_size = prefix - 3;
        }
        level_code = (int64_t)(prefix < 15 ? prefix : 15) << suffix_length;
        if (suffix_size > 0)
            level_code += br_get(br, suffix_size);
        if (prefix >= 15 && suffix_length == 0)
            level_code += 15;
        if (prefix >= 16)
            level_code += ((int64_t)1 << (prefix - 3)) - 4096;
        if (i == trailing_ones && trailing_ones < 3)
            level_code += 2;
        if (level_code & 1)
            lv[i] = (-level_code - 1) >> 1;
        else
            lv[i] = (level_code + 2) >> 1;
        if (suffix_length == 0)
            suffix_length = 1;
        if ((lv[i] > 0 ? lv[i] : -lv[i]) > (3 << (suffix_length - 1)) &&
            suffix_length < 6)
            suffix_length++;
    }

    if (total_coeff < max_coeff) {
        if (nc == -1)
            total_zeros = vlc_read(br, ctz_v[total_coeff - 1],
                                   ctz_l[total_coeff - 1],
                                   ctz_bits[total_coeff - 1]);
        else
            total_zeros = vlc_read(br, tz_v[total_coeff - 1],
                                   tz_l[total_coeff - 1],
                                   tz_bits[total_coeff - 1]);
        if (total_zeros < 0)
            return -1;
    } else {
        total_zeros = 0;
    }

    zeros_left = total_zeros;
    pos = total_coeff - 1 + total_zeros;
    for (i = 0; i < total_coeff; i++) {
        int run;
        if (pos >= max_coeff)
            return -1;
        levels[pos] = (int)lv[i];
        if (i < total_coeff - 1) {
            if (zeros_left > 0) {
                int zi = zeros_left < 7 ? zeros_left : 7;
                run = vlc_read(br, run_v[zi - 1], run_l[zi - 1],
                               run_bits_[zi - 1]);
                if (run < 0)
                    return -1;
            } else {
                run = 0;
            }
            zeros_left -= run;
            pos -= 1 + run;
        }
    }
    return total_coeff;
}

/* ---- nC context ---- */

static int get_nc(const int *grid, int w, int bx, int by)
{
    int a = bx > 0 ? grid[by * w + bx - 1] : -1;
    int b = by > 0 ? grid[(by - 1) * w + bx] : -1;
    if (a >= 0 && b >= 0)
        return (a + b + 1) >> 1;
    if (a >= 0)
        return a;
    if (b >= 0)
        return b;
    return 0;
}

/* ---- MV prediction (mirror of mvpred.py) ---- */

static void cand(const int *mv, const unsigned char *intra,
                 const unsigned char *coded, const int *refs, int cur_ref,
                 int mb_w, int x, int y,
                 int *ok, int *same, int *vx, int *vy)
{
    long long i;
    *ok = 0;
    if (x < 0 || y < 0 || x >= mb_w)
        return;
    i = (long long)y * mb_w + x;
    if (!coded[i])
        return;
    *ok = 1;
    if (intra[i]) {
        *same = 0;
        *vx = 0;
        *vy = 0;
    } else {
        *same = refs ? (refs[i] == cur_ref) : 1;
        *vx = mv[2 * i];
        *vy = mv[2 * i + 1];
    }
}

static int med3(int a, int b, int c)
{
    if (a > b) { int t = a; a = b; b = t; }
    if (b > c) { int t = b; b = c; c = t; }
    if (a > b) { int t = a; a = b; b = t; }
    return b;
}

static void pred_mv(const int *mv, const unsigned char *intra,
                    const unsigned char *coded, const int *refs,
                    int cur_ref, int mb_x, int mb_y,
                    int mb_w, int *px, int *py)
{
    int aok, asame, ax, ay, bok, bsame, bx, by, cok, csame, cx, cy;
    cand(mv, intra, coded, refs, cur_ref, mb_w, mb_x - 1, mb_y,
         &aok, &asame, &ax, &ay);
    cand(mv, intra, coded, refs, cur_ref, mb_w, mb_x, mb_y - 1,
         &bok, &bsame, &bx, &by);
    cand(mv, intra, coded, refs, cur_ref, mb_w, mb_x + 1, mb_y - 1,
         &cok, &csame, &cx, &cy);
    if (!cok)
        cand(mv, intra, coded, refs, cur_ref, mb_w, mb_x - 1, mb_y - 1,
             &cok, &csame, &cx, &cy);
    if (!bok && !cok) {
        if (aok) { *px = ax; *py = ay; }
        else { *px = 0; *py = 0; }
        return;
    }
    {
        int nsame = (aok && asame) + (bok && bsame) + (cok && csame);
        if (nsame == 1) {
            if (aok && asame) { *px = ax; *py = ay; return; }
            if (bok && bsame) { *px = bx; *py = by; return; }
            *px = cx; *py = cy; return;
        }
    }
    if (!aok) { ax = 0; ay = 0; }
    if (!bok) { bx = 0; by = 0; }
    if (!cok) { cx = 0; cy = 0; }
    *px = med3(ax, bx, cx);
    *py = med3(ay, by, cy);
}

static void pred_pskip(const int *mv, const unsigned char *intra,
                       const unsigned char *coded, const int *refs,
                       int mb_x, int mb_y, int mb_w, int *px, int *py)
{
    int aok, asame, ax, ay, bok, bsame, bx, by;
    cand(mv, intra, coded, refs, 0, mb_w, mb_x - 1, mb_y,
         &aok, &asame, &ax, &ay);
    cand(mv, intra, coded, refs, 0, mb_w, mb_x, mb_y - 1,
         &bok, &bsame, &bx, &by);
    if (!aok || !bok ||
        (asame && ax == 0 && ay == 0) || (bsame && bx == 0 && by == 0)) {
        *px = 0;
        *py = 0;
        return;
    }
    pred_mv(mv, intra, coded, refs, 0, mb_x, mb_y, mb_w, px, py);
}

/* ---- residual block groups ---- */

static int residual_chroma(BitReader *br, int cbp_chroma, int mb_x, int mb_y,
                           int mb_w, int *chroma_dc, int *chroma_ac,
                           int *nnz_u, int *nnz_v, long long i,
                           short *cvals, int *cidx_arr, int *sctx)
{
    int c, b;
    if (cbp_chroma) {
        for (c = 0; c < 2; c++) {
            int lv[4];
            if (decode_residual(br, -1, 4, lv) < 0)
                return -1;
            memcpy(chroma_dc + (i * 2 + c) * 4, lv, 4 * sizeof(int));
        }
    } else {
        memset(chroma_dc + i * 8, 0, 8 * sizeof(int));
    }
    for (c = 0; c < 2; c++) {
        int *grid = c == 0 ? nnz_u : nnz_v;
        int gw = 2 * mb_w;
        for (b = 0; b < 4; b++) {
            int dx = b & 1, dy = b >> 1;
            int gx = 2 * mb_x + dx, gy = 2 * mb_y + dy;
            if (cbp_chroma == 2) {
                int lv[15], tc;
                int nc = get_nc(grid, gw, gx, gy);
                tc = decode_residual(br, nc, 15, lv);
                if (tc < 0)
                    return -1;
                memcpy(chroma_ac + ((i * 8 + 4 * c + b) * 16 + 1),
                       lv, 15 * sizeof(int));
                if (sctx && tc > 0) {
                    int k = sctx[1]++, q;
                    cidx_arr[k] = (int)(i * 8 + 4 * c + b);
                    cvals[k * 16] = 0;
                    for (q = 0; q < 15; q++)
                        cvals[k * 16 + 1 + q] = (short)lv[q];
                }
                grid[gy * gw + gx] = tc;
            } else {
                grid[gy * gw + gx] = 0;
            }
        }
    }
    return 0;
}

/* params: [0]=mb_w [1]=mb_h [2]=first_mb [3]=slice_type(0 P, 2 I)
 *         [4]=qp_init [5]=bit_offset [6]=num_ref_idx_l0 (0/1 -> single)
 *
 * ctx_in (optional int* of nmb entries): per-MB ref_idx_l0 output for
 * multi-reference slices (NULL for single-ref streams).
 *
 * Sparse residual side-channel (all three may be NULL to disable):
 *   coeffs   -> yvals  (short, cap nmb*16*16): coded luma 4x4 rows
 *   mvs      -> cvals  (short, cap nmb*8*16):  coded chroma 4x4 rows
 *   ctx_out  -> sctx   (int, 2 + 24*nmb): [0]=ycount [1]=ccount,
 *               yidx at +2, cidx at +2+16*nmb.  Counts accumulate
 *               across slices of one frame. */
int h264_cavlc_decode_slice(
    const unsigned char *buf, long long buf_size,
    const int *params, const int *ctx_in,
    short *coeffs_unused, int *mb_meta, short *mvs_unused, int *ctx_out)
{
    /* tensor pointers are passed via mb_meta-relative layout from the
     * adapter (see native/h264_cavlc.py): to keep the cffi signature
     * stable we receive one big int32 block and carve it up. */

    int mb_w = params[0], mb_h = params[1];
    long long nmb = (long long)mb_w * mb_h;
    int slice_type = params[3];
    int qp = params[4];
    int num_ref = params[6] > 1 ? params[6] : 1;
    int *refg = (int *)ctx_in;           /* ref_idx grid (may be NULL) */

    int *intra32 = mb_meta;                       /* (nmb) */
    int *luma_mode = intra32 + nmb;
    int *chroma_mode = luma_mode + nmb;
    int *mv = chroma_mode + nmb;                  /* (nmb,2) */
    int *qp_arr = mv + 2 * nmb;
    int *luma_dc = qp_arr + nmb;                  /* (nmb,16) */
    int *luma_ac = luma_dc + 16 * nmb;            /* (nmb,16,16) */
    int *chroma_dc = luma_ac + 256 * nmb;         /* (nmb,2,4) */
    int *chroma_ac = chroma_dc + 8 * nmb;         /* (nmb,8,16) */
    int *nnz_y = chroma_ac + 128 * nmb;           /* (4mh,4mw) */
    int *nnz_u = nnz_y + 16 * nmb;
    int *nnz_v = nnz_u + 4 * nmb;
    int *coded32 = nnz_v + 4 * nmb;

    short *yvals = coeffs_unused;
    short *cvals = mvs_unused;
    int *sctx = (yvals && cvals) ? ctx_out : 0;
    int *yidx_arr = sctx ? sctx + 2 : 0;
    int *cidx_arr = sctx ? sctx + 2 + 16 * nmb : 0;

    unsigned char intra[65536], coded[65536];
    long long i;
    BitReader br;

    if (nmb > 65536)
        return -9;
    for (i = 0; i < nmb; i++) {
        intra[i] = (unsigned char)intra32[i];
        coded[i] = (unsigned char)coded32[i];
    }

    br_init(&br, buf, buf_size);
    if (params[5] > 0)
        br_get(&br, params[5]);    /* slice header ended mid-byte
                                      (br_get refills; br_skip must not
                                      be used on an empty cache) */
    i = params[2];

    while (i < nmb) {
        int mb_x = (int)(i % mb_w), mb_y = (int)(i / mb_w);
        int mb_type;
        long long bits_left = buf_size * 8 -
            (br.byte_pos * 8 - br.bits_in_cache);
        if (bits_left <= 0)
            break;

        if (slice_type == 0) {
            int skip_run = get_ue(&br);
            if (skip_run < 0)
                return -2;
            while (skip_run-- > 0 && i < nmb) {
                int px, py, r;
                mb_x = (int)(i % mb_w);
                mb_y = (int)(i / mb_w);
                pred_pskip(mv, intra, coded, refg, mb_x, mb_y, mb_w,
                           &px, &py);
                mv[2 * i] = px;
                mv[2 * i + 1] = py;
                qp_arr[i] = qp;
                coded[i] = 1;
                if (refg)
                    refg[i] = 0;         /* P_Skip references picture 0 */
                /* clear nnz + chroma DC: the block may be pooled across
                 * frames, so stale entries must not leak into nC
                 * prediction or the dense chroma-DC tensor */
                for (r = 0; r < 4; r++)
                    memset(nnz_y + ((4 * mb_y + r) * 4 * mb_w + 4 * mb_x),
                           0, 4 * sizeof(int));
                for (r = 0; r < 2; r++) {
                    memset(nnz_u + ((2 * mb_y + r) * 2 * mb_w + 2 * mb_x),
                           0, 2 * sizeof(int));
                    memset(nnz_v + ((2 * mb_y + r) * 2 * mb_w + 2 * mb_x),
                           0, 2 * sizeof(int));
                }
                memset(chroma_dc + i * 8, 0, 8 * sizeof(int));
                i++;
            }
            if (i >= nmb)
                break;
            bits_left = buf_size * 8 - (br.byte_pos * 8 - br.bits_in_cache);
            if (bits_left <= 1)
                break;
            mb_x = (int)(i % mb_w);
            mb_y = (int)(i / mb_w);
        }
        mb_type = get_ue(&br);
        if (mb_type < 0)
            return -2;

        if (slice_type == 0 && mb_type < 5) {
            /* P_L0_16x16 */
            int mvdx, mvdy, px, py, cbp_code, cbp, cbp_luma, cbp_chroma, b;
            int ref = 0;
            if (mb_type != 0)
                return -3;
            if (num_ref > 1) {
                if (num_ref == 2)
                    ref = 1 - br_get(&br, 1);       /* te(v), max 1 */
                else
                    ref = get_ue(&br);
                if (ref < 0 || ref >= num_ref)
                    return -8;
            }
            if (refg)
                refg[i] = ref;
            mvdx = get_se(&br);
            mvdy = get_se(&br);
            pred_mv(mv, intra, coded, refg, ref, mb_x, mb_y, mb_w,
                    &px, &py);
            mv[2 * i] = px + mvdx;
            mv[2 * i + 1] = py + mvdy;
            cbp_code = get_ue(&br);
            if (cbp_code < 0 || cbp_code >= 48)
                return -4;
            cbp = inter_cbp_tab[cbp_code];
            cbp_luma = cbp & 15;
            cbp_chroma = cbp >> 4;
            if (cbp)
                qp += get_se(&br);
            qp_arr[i] = qp;
            for (b = 0; b < 16; b++) {
                int dx = blk_x[b], dy = blk_y[b];
                int gx = 4 * mb_x + dx, gy = 4 * mb_y + dy;
                if (cbp_luma & (1 << (b >> 2))) {
                    int lv[16], tc;
                    int nc = get_nc(nnz_y, 4 * mb_w, gx, gy);
                    tc = decode_residual(&br, nc, 16, lv);
                    if (tc < 0)
                        return -5;
                    memcpy(luma_ac + (i * 16 + b) * 16, lv,
                           16 * sizeof(int));
                    if (sctx && tc > 0) {
                        int k = sctx[0]++, q;
                        yidx_arr[k] = (int)(i * 16 + b);
                        for (q = 0; q < 16; q++)
                            yvals[k * 16 + q] = (short)lv[q];
                    }
                    nnz_y[gy * 4 * mb_w + gx] = tc;
                } else {
                    nnz_y[gy * 4 * mb_w + gx] = 0;
                }
            }
            if (residual_chroma(&br, cbp_chroma, mb_x, mb_y, mb_w,
                                chroma_dc, chroma_ac, nnz_u, nnz_v, i,
                                cvals, cidx_arr, sctx) < 0)
                return -6;
            coded[i] = 1;
        } else {
            int m, pred_mode, cbp_chroma, cbp_luma, b, nc, tc;
            int lv16[16];
            if (slice_type == 0)
                mb_type -= 5;
            if (mb_type == 0 || mb_type == 25)
                return -3;       /* I_4x4 / I_PCM unsupported */
            m = mb_type - 1;
            pred_mode = m % 4;
            cbp_chroma = (m / 4) % 3;
            cbp_luma = (m / 12) * 15;
            intra[i] = 1;
            intra32[i] = 1;
            luma_mode[i] = pred_mode;
            chroma_mode[i] = get_ue(&br);
            qp += get_se(&br);
            qp_arr[i] = qp;
            /* luma DC */
            nc = get_nc(nnz_y, 4 * mb_w, 4 * mb_x, 4 * mb_y);
            tc = decode_residual(&br, nc, 16, lv16);
            if (tc < 0)
                return -5;
            memcpy(luma_dc + i * 16, lv16, 16 * sizeof(int));
            for (b = 0; b < 16; b++) {
                int dx = blk_x[b], dy = blk_y[b];
                int gx = 4 * mb_x + dx, gy = 4 * mb_y + dy;
                if (cbp_luma) {
                    int lv[15];
                    nc = get_nc(nnz_y, 4 * mb_w, gx, gy);
                    tc = decode_residual(&br, nc, 15, lv);
                    if (tc < 0)
                        return -5;
                    memcpy(luma_ac + ((i * 16 + b) * 16 + 1), lv,
                           15 * sizeof(int));
                    if (sctx && tc > 0) {
                        int k = sctx[0]++, q;
                        yidx_arr[k] = (int)(i * 16 + b);
                        yvals[k * 16] = 0;
                        for (q = 0; q < 15; q++)
                            yvals[k * 16 + 1 + q] = (short)lv[q];
                    }
                    nnz_y[gy * 4 * mb_w + gx] = tc;
                } else {
                    nnz_y[gy * 4 * mb_w + gx] = 0;
                }
            }
            if (residual_chroma(&br, cbp_chroma, mb_x, mb_y, mb_w,
                                chroma_dc, chroma_ac, nnz_u, nnz_v, i,
                                cvals, cidx_arr, sctx) < 0)
                return -6;
            coded[i] = 1;
        }
        i++;
        {
            long long bl = buf_size * 8 - (br.byte_pos * 8 - br.bits_in_cache);
            if (bl < 8) {
                /* rbsp stop detection like the Python loop */
                if (bl <= 0)
                    break;
                if (br_peek(&br, (int)bl) == (1u << (bl - 1)))
                    break;
            }
        }
    }

    for (i = 0; i < nmb; i++) {
        coded32[i] = coded[i];
        intra32[i] = intra[i];
    }
    return 0;
}
