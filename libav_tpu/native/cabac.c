/* H.264 CABAC slice decoder — the host-serial hot loop for High-profile
 * streams (role of reference cabac.c ff_init_cabac_decoder :163,
 * cabac_functions.h get_cabac :117, h264_cabac.c ff_h264_decode_mb_cabac
 * :1908; tensor output model: fills whole-frame FrameData arrays + the
 * 4x4 motion grids consumed by the TPU reconstruction program).
 *
 * Must stay value-identical to the Python reference implementation
 * (codecs/h264/cabac.py engine + MB layer, codecs/h264/part.py shared
 * inter walk) — the equivalence is asserted by tests that decode the
 * same stream with and without LIBAV_TPU_NO_NATIVE.
 *
 * Feature set: I/P/B slices, I_4x4/I_8x8/I_16x16 incl. the 8x8
 * transform (cat-5 residuals, transform_size_8x8_flag), all P/B
 * partitions and sub-partitions, P_Skip/B_Skip, spatial direct,
 * multi-reference lists.  Constructs outside the subset (I_PCM,
 * temporal direct, field pictures) return -3 and the caller redoes
 * the access unit on the Python path. */

#include <stdint.h>
#include <string.h>
#include "h264_cabac_tables.h"

#define ERR_INVALID (-1)
#define ERR_UNSUP   (-3)
#define UNAVAIL (-2)
#define NOREF   (-1)

/* ---- arithmetic decoding engine (spec 9.3.3.2; bit-identical syntax
 *      output to cabac.py CabacDecoder, including reads-past-end = 0).
 *
 * Representation: `low` carries the spec offset at fixed scale 2^49
 * PLUS a queue of up-to-47 future input bits below it, terminated by a
 * guard 1-bit.  Renormalization is then just `range <<= sh; low <<= sh`
 * — queued bits migrate into the offset exactly when they become
 * significant — and the only memory traffic is a 6-byte refill every
 * ~47 consumed bits (detected by the guard crossing bit 48).  This is
 * the classic queue-in-low design (the reference's cabac_functions.h
 * uses the same idea at 16-bit scale); the 64-bit low makes refills 3x
 * rarer and frees the per-bin path of all cache bookkeeping. */

#define CB_SCALE 49
#define CB_QMASK (((uint64_t)1 << 48) - 1)

typedef struct cb_CD {
    const uint8_t *d;
    long long n;                /* bytes */
    long long bytepos;          /* next byte to load (zero past end) */
    uint64_t low;               /* offset<<49 | queued bits | guard */
    int range;
    uint8_t st[1024];
} CD;

/* packed-state tables over s = 2*p + mps (MPS flip at p==0 folded into
 * the LPS transition):
 *   cd_lps8[(range & 0xC0)*2 + s]  — LPS subrange, one byte load
 *   cd_mlps[128 + s]               — next state; negative index (s
 *                                    XOR -1 from the branchless select)
 *                                    = the LPS transition */
static uint8_t cd_mps_tr[128], cd_lps_tr[128];
static uint8_t cd_lps8[512], cd_mlps[256];
static volatile int cd_tr_ready = 0;

static void cd_build_trans(void)
{
    int s, q;
    for (s = 0; s < 128; s++) {
        int p = s >> 1, mps = s & 1;
        int pm = p < 62 ? p + 1 : 62;
        int pl = cb_trans_lps[p];
        int ml = p == 0 ? mps ^ 1 : mps;
        cd_mps_tr[s] = (uint8_t)(2 * pm + mps);
        cd_lps_tr[s] = (uint8_t)(2 * pl + ml);
        cd_mlps[128 + s] = cd_mps_tr[s];
        cd_mlps[127 - s] = cd_lps_tr[s];    /* index 128 + (s ^ -1) */
        for (q = 0; q < 4; q++)
            cd_lps8[q * 128 + s] = cb_lps_range[p][q];
    }
    cd_tr_ready = 1;
}

/* next 48 input bits, big-endian, zeros past the end */
static inline uint64_t cd_load48(const uint8_t *d, long long n,
                                 long long bytepos)
{
    if (bytepos + 8 <= n) {
        uint64_t w;
        memcpy(&w, d + bytepos, 8);
#if defined(__GNUC__)
        return __builtin_bswap64(w) >> 16;
#else
        w = ((w & 0xFFULL) << 56) | ((w & 0xFF00ULL) << 40) |
            ((w & 0xFF0000ULL) << 24) | ((w & 0xFF000000ULL) << 8) |
            ((w >> 8) & 0xFF000000ULL) | ((w >> 24) & 0xFF0000ULL) |
            ((w >> 40) & 0xFF00ULL) | (w >> 56);
        return w >> 16;
#endif
    } else {
        uint64_t w = 0;
        int i;
        for (i = 0; i < 6; i++) {
            uint64_t b = bytepos + i < n ? d[bytepos + i] : 0;
            w = (w << 8) | b;
        }
        return w;
    }
}

/* guard (lowest set bit of low) has crossed bit 48 (position 48+i,
 * i in [0,6] — a renorm shifts by at most 7): insert 48 fresh bits
 * right below it and drop the guard to bit i */
static inline void cd_refill(CD *c)
{
    int i = __builtin_ctzll(c->low) - 48;
    c->low += ((cd_load48(c->d, c->n, c->bytepos) << 1) - CB_QMASK) << i;
    c->bytepos += 6;
}

static void cd_init(CD *c, const uint8_t *d, long long n,
                    int slice_is_i, int idc, int qp)
{
    int i;
    uint64_t v = 0;
    if (!cd_tr_ready)
        cd_build_trans();
    const signed char (*tab)[2] = slice_is_i ? cb_init_i : cb_init_pb[idc];
    if (qp < 0) qp = 0;
    if (qp > 51) qp = 51;
    memset(c->st, 0, sizeof(c->st));
    for (i = 0; i < 1024; i++) {
        int pre = ((tab[i][0] * qp) >> 4) + tab[i][1];
        if (pre < 1) pre = 1;
        if (pre > 126) pre = 126;
        c->st[i] = pre <= 63 ? (uint8_t)(2 * (63 - pre))
                             : (uint8_t)(2 * (pre - 64) + 1);
    }
    c->d = d;
    c->n = n;
    c->range = 510;
    /* first 56 bits: the 9 initial offset bits land at 49..57, a
     * 47-bit queue at 2..48, guard at bit 1 */
    for (i = 0; i < 7; i++)
        v = (v << 8) | (i < n ? d[i] : 0);
    c->bytepos = 7;
    c->low = (v << 2) | 2;
}

static inline int cd_dec(CD *c, int ctx)
{
    /* branchless MPS/LPS select: m = -1 on the LPS path; renorm is two
     * shifts (sh = 0 when range is already >= 0x100); the only branch
     * left is the rare guard-crossing refill */
    int s = c->st[ctx];
    int rlps = cd_lps8[2 * (c->range & 0xC0) + s];
    uint64_t rs;
    int m, sh;
    c->range -= rlps;
    rs = (uint64_t)c->range << CB_SCALE;
    m = (int)((int64_t)(rs - c->low - 1) >> 63);    /* -1: LPS, 0: MPS */
    c->low -= rs & (uint64_t)(int64_t)m;
    c->range += (rlps - c->range) & m;
    s ^= m;
    c->st[ctx] = cd_mlps[128 + s];
    sh = __builtin_clz((unsigned)c->range) - 23;
    c->range <<= sh;
    c->low <<= sh;
    if (!(c->low & CB_QMASK))
        cd_refill(c);
    return s & 1;
}

static inline int cd_bypass(CD *c)
{
    uint64_t rs;
    int m;
    c->low += c->low;
    if (!(c->low & CB_QMASK))
        cd_refill(c);
    rs = (uint64_t)c->range << CB_SCALE;
    m = (int)((int64_t)(rs - c->low - 1) >> 63);
    c->low -= rs & (uint64_t)(int64_t)m;
    return m & 1;
}

static int cd_term(CD *c)
{
    c->range -= 2;
    if (c->low >= (uint64_t)c->range << CB_SCALE)
        return 1;
    if (c->range < 0x100) {         /* renorm is a single shift here */
        c->range <<= 1;
        c->low <<= 1;
        if (!(c->low & CB_QMASK))
            cd_refill(c);
    }
    return 0;
}

/* ---- register-local engine for the residual hot loops ----
 * Same arithmetic as cd_dec/cd_bypass, but the (range, low, bytepos)
 * state lives in locals so the compiler keeps it in registers across
 * bins (the role of the reference's x86/cabac.h asm, which pins
 * low/range in registers through get_cabac chains). */
#define CD_LOCALS(c) \
    int l_range = (c)->range; \
    uint64_t l_low = (c)->low; \
    long long l_bytepos = (c)->bytepos; \
    const uint8_t *const l_d = (c)->d; \
    const long long l_n = (c)->n; \
    uint8_t *const l_st = (c)->st

#define CD_SAVE(c) ((c)->range = l_range, (c)->low = l_low, \
    (c)->bytepos = l_bytepos)

#define M_REFILL() do { \
    int i_ = __builtin_ctzll(l_low) - 48; \
    l_low += ((cd_load48(l_d, l_n, l_bytepos) << 1) - CB_QMASK) << i_; \
    l_bytepos += 6; \
} while (0)

#define M_DEC(ctx, out) do { \
    int s_ = l_st[ctx]; \
    int rlps_ = cd_lps8[2 * (l_range & 0xC0) + s_]; \
    uint64_t rs_; int m_, sh_; \
    l_range -= rlps_; \
    rs_ = (uint64_t)l_range << CB_SCALE; \
    m_ = (int)((int64_t)(rs_ - l_low - 1) >> 63); \
    l_low -= rs_ & (uint64_t)(int64_t)m_; \
    l_range += (rlps_ - l_range) & m_; \
    s_ ^= m_; \
    l_st[ctx] = cd_mlps[128 + s_]; \
    (out) = s_ & 1; \
    sh_ = __builtin_clz((unsigned)l_range) - 23; \
    l_range <<= sh_; \
    l_low <<= sh_; \
    if (!(l_low & CB_QMASK)) \
        M_REFILL(); \
} while (0)

#define M_BYPASS(out) do { \
    uint64_t rs_; int m_; \
    l_low += l_low; \
    if (!(l_low & CB_QMASK)) \
        M_REFILL(); \
    rs_ = (uint64_t)l_range << CB_SCALE; \
    m_ = (int)((int64_t)(rs_ - l_low - 1) >> 63); \
    l_low -= rs_ & (uint64_t)(int64_t)m_; \
    (out) = m_ & 1; \
} while (0)

/* ---- residual coding (mirrors cabac.py code_residual, cats 0..4) --- */

static const int sig_base_t[5]  = {105, 120, 134, 149, 152};
static const int last_base_t[5] = {166, 181, 195, 210, 213};
static const int lvl_base_t[5]  = {227, 237, 247, 257, 266};
static const int cbf_base_t[5]  = {85, 89, 93, 97, 101};
static const int lvl1_ctx[8] = {1, 2, 3, 4, 0, 0, 0, 0};
static const int gt1_ctx[8]  = {5, 5, 5, 5, 6, 7, 8, 9};
static const int trans_eq1[8] = {1, 2, 3, 3, 4, 5, 6, 7};
static const int trans_gt1[8] = {4, 4, 4, 4, 5, 6, 7, 7};

/* levels[max_coeff] zeroed by caller; returns total_coeff */
static int residual_block(CD *c, int cat, int *levels, int max_coeff)
{
    int idx[16], nidx = 0, i, node = 0, k, bit;
    int sig_base = sig_base_t[cat], last_base = last_base_t[cat],
        lvl_base = lvl_base_t[cat];
    int broke = 0, phase = 0;
    CD_LOCALS(c);
    /* sig/last scan as a branchless state machine: phase 0 decodes
     * significant_coeff_flag[i], phase 1 last_significant_coeff_flag[i]
     * — identical bin sequence to the nested-if form, but the only
     * data-dependent branch left is the once-per-block last=1 exit
     * (the per-bin `if (sig)` mispredicted ~once per coefficient,
     * which dominated the profile: the bin loop is latency-bound) */
    i = 0;
    for (;;) {
        M_DEC((phase ? last_base : sig_base) + i, bit);
        idx[nidx] = i;
        nidx += bit & (phase ^ 1);
        if (bit & phase) {
            broke = 1;
            break;
        }
        i += (bit ^ 1) | phase;
        phase = bit;
        if (i >= max_coeff - 1)
            break;
    }
    if (!broke)
        idx[nidx++] = max_coeff - 1;

    for (k = nidx - 1; k >= 0; k--) {
        int pos = idx[k], mag;
        M_DEC(lvl_base + lvl1_ctx[node], bit);
        if (!bit) {
            mag = 1;
            node = trans_eq1[node];
        } else {
            int gctx = lvl_base + gt1_ctx[node];
            node = trans_gt1[node];
            mag = 2;
            for (;;) {
                if (mag >= 15)
                    break;
                M_DEC(gctx, bit);
                if (!bit)
                    break;
                mag++;
            }
            if (mag == 15) {
                int j = 0, add = 1;
                for (;;) {
                    M_BYPASS(bit);
                    if (!bit || j >= 30)
                        break;
                    j++;
                }
                while (j) {
                    j--;
                    M_BYPASS(bit);
                    add = add * 2 + bit;
                }
                mag = add + 14;
            }
        }
        M_BYPASS(bit);
        levels[pos] = bit ? -mag : mag;
    }
    CD_SAVE(c);
    return nidx;
}

/* 8x8 zigzag scan (spec 8.5.6 frame scan) */
static const uint8_t scan8x8_t[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};
/* cat-5 ctx increments (spec Table 9-43 / reference h264_cabac.c
 * significant_coeff_flag_offset_8x8[0], cabac.c
 * last_coeff_flag_offset_8x8) */
static const uint8_t sig8_inc_t[63] = {
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12};
static const uint8_t last8_inc_t[63] = {
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8};

/* ctxBlockCat 5: 8x8 luma residual, 64 coeffs in 8x8-zigzag scan order,
 * no coded_block_flag (4:2:0). levels[64] zeroed by caller. */
static int residual_block8(CD *c, int *levels)
{
    int idx[64], nidx = 0, i, node = 0, k, bit;
    int broke = 0, phase = 0;
    CD_LOCALS(c);
    /* same branchless sig/last state machine as residual_block */
    i = 0;
    for (;;) {
        const uint8_t *inc = phase ? last8_inc_t : sig8_inc_t;
        int base = phase ? 417 : 402;
        M_DEC(base + inc[i], bit);
        idx[nidx] = i;
        nidx += bit & (phase ^ 1);
        if (bit & phase) {
            broke = 1;
            break;
        }
        i += (bit ^ 1) | phase;
        phase = bit;
        if (i >= 63)
            break;
    }
    if (!broke)
        idx[nidx++] = 63;
    for (k = nidx - 1; k >= 0; k--) {
        int pos = idx[k], mag;
        M_DEC(426 + lvl1_ctx[node], bit);
        if (!bit) {
            mag = 1;
            node = trans_eq1[node];
        } else {
            int gctx = 426 + gt1_ctx[node];
            node = trans_gt1[node];
            mag = 2;
            for (;;) {
                if (mag >= 15)
                    break;
                M_DEC(gctx, bit);
                if (!bit)
                    break;
                mag++;
            }
            if (mag == 15) {
                int j = 0, add = 1;
                for (;;) {
                    M_BYPASS(bit);
                    if (!bit || j >= 30)
                        break;
                    j++;
                }
                while (j) {
                    j--;
                    M_BYPASS(bit);
                    add = add * 2 + bit;
                }
                mag = add + 14;
            }
        }
        M_BYPASS(bit);
        levels[pos] = bit ? -mag : mag;
    }
    CD_SAVE(c);
    return nidx;
}

/* int16 variants decoding straight into the sparse transport rows the
 * device consumes — same bin sequence as residual_block/_block8, no
 * intermediate int buffers or copy loops (the per-block glue showed up
 * right next to the bin loop in the profile) */

/* shared magnitude+sign tail of one coefficient (locals of the
 * enclosing CD_LOCALS scope; lvl_base/node in scope) */
#define M_LEVEL(out) do { \
    int mag_, bit_; \
    M_DEC(lvl_base + lvl1_ctx[node], bit_); \
    if (!bit_) { \
        mag_ = 1; \
        node = trans_eq1[node]; \
    } else { \
        int gctx_ = lvl_base + gt1_ctx[node]; \
        node = trans_gt1[node]; \
        mag_ = 2; \
        for (;;) { \
            if (mag_ >= 15) \
                break; \
            M_DEC(gctx_, bit_); \
            if (!bit_) \
                break; \
            mag_++; \
        } \
        if (mag_ == 15) { \
            int j_ = 0, add_ = 1; \
            for (;;) { \
                M_BYPASS(bit_); \
                if (!bit_ || j_ >= 30) \
                    break; \
                j_++; \
            } \
            while (j_) { \
                j_--; \
                M_BYPASS(bit_); \
                add_ = add_ * 2 + bit_; \
            } \
            mag_ = add_ + 14; \
        } \
    } \
    M_BYPASS(bit_); \
    (out) = (int16_t)(bit_ ? -mag_ : mag_); \
} while (0)

/* out[max_coeff] zeroed by caller; returns total_coeff */
static int residual_block16(CD *c, int cat, int16_t *out, int max_coeff)
{
    int idx[16], nidx = 0, i, node = 0, k, bit;
    int sig_base = sig_base_t[cat], last_base = last_base_t[cat],
        lvl_base = lvl_base_t[cat];
    int broke = 0, phase = 0;
    CD_LOCALS(c);
    i = 0;
    for (;;) {
        M_DEC((phase ? last_base : sig_base) + i, bit);
        idx[nidx] = i;
        nidx += bit & (phase ^ 1);
        if (bit & phase) {
            broke = 1;
            break;
        }
        i += (bit ^ 1) | phase;
        phase = bit;
        if (i >= max_coeff - 1)
            break;
    }
    if (!broke)
        idx[nidx++] = max_coeff - 1;
    for (k = nidx - 1; k >= 0; k--)
        M_LEVEL(out[idx[k]]);
    CD_SAVE(c);
    return nidx;
}

/* cat-5 8x8 block decoded directly into the de-zigzagged raster rows
 * (out64 = 4 consecutive 16-coeff sparse rows, zeroed by caller) */
static int residual_block8r(CD *c, int16_t *out64)
{
    int idx[64], nidx = 0, i, node = 0, k, bit;
    const int lvl_base = 426;
    int broke = 0, phase = 0;
    CD_LOCALS(c);
    i = 0;
    for (;;) {
        const uint8_t *inc = phase ? last8_inc_t : sig8_inc_t;
        int base = phase ? 417 : 402;
        M_DEC(base + inc[i], bit);
        idx[nidx] = i;
        nidx += bit & (phase ^ 1);
        if (bit & phase) {
            broke = 1;
            break;
        }
        i += (bit ^ 1) | phase;
        phase = bit;
        if (i >= 63)
            break;
    }
    if (!broke)
        idx[nidx++] = 63;
    for (k = nidx - 1; k >= 0; k--)
        M_LEVEL(out64[scan8x8_t[idx[k]]]);
    CD_SAVE(c);
    return nidx;
}

/* ---- mvd UEG3 (mirrors code_ueg3_mvd) ---- */

static int decode_mvd(CD *c, int ctx_base, int amvd, int *err)
{
    int inc = (amvd > 2) + (amvd > 32);
    int m = 1, ctx = ctx_base + 3, bit;
    CD_LOCALS(c);
    M_DEC(ctx_base + inc, bit);
    if (!bit) {
        CD_SAVE(c);
        return 0;
    }
    while (m < 9) {
        M_DEC(ctx, bit);
        if (!bit)
            break;
        if (m < 4)
            ctx++;
        m++;
    }
    if (m >= 9) {
        int k = 3;
        for (;;) {
            M_BYPASS(bit);
            if (!bit)
                break;
            m += 1 << k;
            k++;
            if (k > 24) { *err = 1; CD_SAVE(c); return 0; }
        }
        while (k) {
            k--;
            M_BYPASS(bit);
            m += bit << k;
        }
    }
    M_BYPASS(bit);
    CD_SAVE(c);
    return bit ? -m : m;
}

/* ---- slice/frame state ---- */

typedef struct cb_S {
    CD cd;
    int mb_w, mb_h, nmb, bw, bh;
    int slice_type;             /* 0 P, 1 B, 2 I */
    int cur_slice;
    int nref0, nref1;
    int last_dqp;
    int err;                    /* sticky error */
    /* arena views (all int32) */
    int *intra, *i4, *intra16, *luma_mode, *chroma_mode, *qp, *coded,
        *skip, *direct, *cbp, *mcslice, *mv, *ref_idx, *sel,
        *i4_modes, *luma_dc, *chroma_dc,
        *nnz_y, *nnz_u, *nnz_v,
        *bref, *bmv, *bmvd, *bdirect, *gslice, *i4grid, *flags,
        *t8,                    /* transform_size_8x8 per MB */
        *sctx;                  /* ycount, ccount, yidx[ycap], cidx[...] */
    int ycap;
    int t8mode, d8x8inf;        /* PPS transform_8x8_mode, SPS inference */
    int cx, cy;                 /* current MB coords (loop-maintained) */
    int nb_left, nb_top;        /* current MB neighbors, slice-gated —
                                 * cached once per MB (saves the per-call
                                 * i%mb_w hardware division that showed up
                                 * at ~20% of entropy time in gprof) */
    int16_t *yvals, *cvals;
    const int *col;             /* (ref,mvx,mvy,poc)*bh*bw or NULL */
} S;


/* Z-order 4x4 block offsets within MB (spec 6.4.3) */
static const int blk_x_t[16] = {0,1,0,1,2,3,2,3,0,1,0,1,2,3,2,3};
static const int blk_y_t[16] = {0,0,1,1,0,0,1,1,2,2,3,3,2,2,3,3};

/* ---- grid helpers (mirror part.MotionGrids) ---- */

#define BREF(s, l, y, x)  ((s)->bref[(l) * (s)->bh * (s)->bw + (y) * (s)->bw + (x)])
#define BMV(s, l, y, x, cco) ((s)->bmv[(((l) * (s)->bh * (s)->bw + (y) * (s)->bw + (x)) << 1) + (cco)])
#define BMVD(s, l, y, x, cco) ((s)->bmvd[(((l) * (s)->bh * (s)->bw + (y) * (s)->bw + (x)) << 1) + (cco)])
#define BDIR(s, y, x) ((s)->bdirect[(y) * (s)->bw + (x)])

static void g_set_part(S *s, int lst, int bx, int by, int w4, int h4,
                       int ref, int mvx, int mvy, int mvdx, int mvdy,
                       int dir)
{
    int x, y;
    int ax = mvdx < 0 ? -mvdx : mvdx, ay = mvdy < 0 ? -mvdy : mvdy;
    if (ax > 127) ax = 127;
    if (ay > 127) ay = 127;
    for (y = by; y < by + h4; y++) {
        /* row-pointer form: one address computation per row, and the
         * flat inner stores vectorize */
        int *pr = &BREF(s, lst, y, bx);
        int *pm = &BMV(s, lst, y, bx, 0);
        int *pd = &BMVD(s, lst, y, bx, 0);
        for (x = 0; x < w4; x++) {
            pr[x] = ref;
            pm[2 * x] = mvx;
            pm[2 * x + 1] = mvy;
            pd[2 * x] = ax;
            pd[2 * x + 1] = ay;
        }
        if (dir)
            for (x = 0; x < w4; x++)
                BDIR(s, y, bx + x) = 1;
    }
}

static void g_set_unused(S *s, int lst, int bx, int by, int w4, int h4)
{
    int x, y;
    for (y = by; y < by + h4; y++) {
        int *pr = &BREF(s, lst, y, bx);
        int *pm = &BMV(s, lst, y, bx, 0);
        int *pd = &BMVD(s, lst, y, bx, 0);
        for (x = 0; x < w4; x++)
            pr[x] = NOREF;
        memset(pm, 0, (size_t)w4 * 8);
        memset(pd, 0, (size_t)w4 * 8);
    }
}

static void g_set_intra(S *s, int mb_x, int mb_y)
{
    g_set_unused(s, 0, 4 * mb_x, 4 * mb_y, 4, 4);
    g_set_unused(s, 1, 4 * mb_x, 4 * mb_y, 4, 4);
}

/* fetch -> ref (UNAVAIL if outside/other-slice/undecoded); mv via out */
static int g_fetch(S *s, int lst, int bx, int by, int *mvx, int *mvy)
{
    int mb, r;
    *mvx = *mvy = 0;
    if (bx < 0 || by < 0 || bx >= s->bw || by >= s->bh)
        return UNAVAIL;
    mb = (by >> 2) * s->mb_w + (bx >> 2);
    if (s->gslice[mb] != s->cur_slice)
        return UNAVAIL;
    r = BREF(s, lst, by, bx);
    if (r == UNAVAIL)
        return UNAVAIL;
    *mvx = BMV(s, lst, by, bx, 0);
    *mvy = BMV(s, lst, by, bx, 1);
    return r;
}

static int cb_med3(int a, int b, int c)
{
    int mn = a < b ? a : b, mx = a < b ? b : a;
    if (c < mn) return mn;
    if (c > mx) return mx;
    return c;
}

/* spec 8.4.1.3 (mirrors part.cb_pred_motion); special 1..4 directional */
static void cb_pred_motion(S *s, int lst, int ref, int bx, int by,
                        int w4, int h4, int special, int *px, int *py)
{
    int amx, amy, bmx, bmy, cmx, cmy;
    int ra = g_fetch(s, lst, bx - 1, by, &amx, &amy);
    int rb = g_fetch(s, lst, bx, by - 1, &bmx, &bmy);
    int rc = g_fetch(s, lst, bx + w4, by - 1, &cmx, &cmy);
    int match;
    (void)h4;
    if (rc == UNAVAIL)
        rc = g_fetch(s, lst, bx - 1, by - 1, &cmx, &cmy);
    if (special == 1 && rb == ref) { *px = bmx; *py = bmy; return; }
    if ((special == 2 || special == 3) && ra == ref) {
        *px = amx; *py = amy; return;
    }
    if (special == 4 && rc == ref) { *px = cmx; *py = cmy; return; }

    match = (ra == ref) + (rb == ref) + (rc == ref);
    if (match == 1) {
        if (ra == ref)      { *px = amx; *py = amy; }
        else if (rb == ref) { *px = bmx; *py = bmy; }
        else                { *px = cmx; *py = cmy; }
        return;
    }
    if (match == 0 && rb == UNAVAIL && rc == UNAVAIL && ra != UNAVAIL) {
        *px = amx; *py = amy;
        return;
    }
    *px = cb_med3(amx, bmx, cmx);
    *py = cb_med3(amy, bmy, cmy);
}

/* spec 8.4.1.1 (mirrors part.cb_pred_pskip) */
static void cb_pred_pskip(S *s, int mb_x, int mb_y, int *px, int *py)
{
    int bx = 4 * mb_x, by = 4 * mb_y;
    int amx, amy, bmx, bmy;
    int ra = g_fetch(s, 0, bx - 1, by, &amx, &amy);
    int rb = g_fetch(s, 0, bx, by - 1, &bmx, &bmy);
    *px = *py = 0;
    if (ra == UNAVAIL || rb == UNAVAIL)
        return;
    if ((ra == 0 && amx == 0 && amy == 0) ||
        (rb == 0 && bmx == 0 && bmy == 0))
        return;
    cb_pred_motion(s, 0, 0, bx, by, 4, 4, 0, px, py);
}

static int min_positive(int a, int b)
{
    if (a >= 0 && b >= 0)
        return a < b ? a : b;
    return a > b ? a : b;
}

/* spec 8.4.1.2.2 spatial direct for the whole MB or quad mask
 * (mirrors part.pred_spatial_direct + direct_mb_motion) */
static void direct_mb_motion(S *s, int mb_x, int mb_y, int quads_mask)
{
    int bx0 = 4 * mb_x, by0 = 4 * mb_y;
    int refs[2], mvs[2][2], lst, q;
    int direct_zero;
    for (lst = 0; lst < 2; lst++) {
        int mx, my;
        int ra = g_fetch(s, lst, bx0 - 1, by0, &mx, &my);
        int rb = g_fetch(s, lst, bx0, by0 - 1, &mx, &my);
        int rc = g_fetch(s, lst, bx0 + 4, by0 - 1, &mx, &my);
        if (rc == UNAVAIL)
            rc = g_fetch(s, lst, bx0 - 1, by0 - 1, &mx, &my);
        if (ra < 0) ra = -1;
        if (rb < 0) rb = -1;
        if (rc < 0) rc = -1;
        refs[lst] = min_positive(min_positive(ra, rb), rc);
    }
    direct_zero = refs[0] < 0 && refs[1] < 0;
    if (direct_zero) {
        refs[0] = refs[1] = 0;
        mvs[0][0] = mvs[0][1] = mvs[1][0] = mvs[1][1] = 0;
    } else {
        for (lst = 0; lst < 2; lst++) {
            if (refs[lst] >= 0)
                cb_pred_motion(s, lst, refs[lst], bx0, by0, 4, 4, 0,
                            &mvs[lst][0], &mvs[lst][1]);
            else
                mvs[lst][0] = mvs[lst][1] = 0;
        }
    }
    for (q = 0; q < 4; q++) {
        int qx, qy, dx, dy;
        if (!(quads_mask & (1 << q)))
            continue;
        qx = 2 * (q & 1);
        qy = 2 * (q >> 1);
        for (dy = 0; dy < 2; dy++)
            for (dx = 0; dx < 2; dx++) {
                int lx = qx + dx, ly = qy + dy;
                int cz = 0;
                if (!direct_zero && s->col) {
                    const int *cc = s->col +
                        4 * ((by0 + ly) * s->bw + bx0 + lx);
                    int cr = cc[0], cmx = cc[1], cmy = cc[2];
                    cz = cr == 0 && cmx >= -1 && cmx <= 1 &&
                         cmy >= -1 && cmy <= 1;
                }
                for (lst = 0; lst < 2; lst++) {
                    if (refs[lst] < 0) {
                        g_set_unused(s, lst, bx0 + lx, by0 + ly, 1, 1);
                    } else {
                        int mx = mvs[lst][0], my = mvs[lst][1];
                        if (cz && refs[lst] == 0)
                            mx = my = 0;
                        g_set_part(s, lst, bx0 + lx, by0 + ly, 1, 1,
                                   refs[lst], mx, my, 0, 0, 1);
                    }
                }
            }
        for (dy = 0; dy < 2; dy++)
            for (dx = 0; dx < 2; dx++)
                BDIR(s, by0 + qy + dy, bx0 + qx + dx) = 1;
    }
    s->flags[0] = 1;            /* any_part */
}

/* ---- CABAC MB-layer syntax (mirrors CabacMbLayer ctx derivations) -- */

static inline void mb_neighbors(S *s, int i, int *left, int *top)
{
    (void)i;                    /* always the current MB */
    *left = s->nb_left;
    *top = s->nb_top;
}

static int dec_mb_skip(S *s, int i)
{
    int left, top, inc = 0;
    mb_neighbors(s, i, &left, &top);
    if (left >= 0 && !s->skip[left])
        inc++;
    if (top >= 0 && !s->skip[top])
        inc++;
    if (s->slice_type == 1)
        inc += 13;
    return cd_dec(&s->cd, 11 + inc);
}

static int dec_ref_idx(S *s, int lst, int bx, int by)
{
    int inc = 0, ref = 0, ctx, bit;
    int pos[2][2] = {{bx - 1, by}, {bx, by - 1}};
    int k;
    for (k = 0; k < 2; k++) {
        int nx = pos[k][0], ny = pos[k][1], mb;
        if (nx < 0 || ny < 0 || nx >= s->bw)
            continue;
        mb = (ny >> 2) * s->mb_w + (nx >> 2);
        if (s->gslice[mb] != s->cur_slice)
            continue;
        if (BREF(s, lst, ny, nx) > 0 &&
            !(s->slice_type == 1 && BDIR(s, ny, nx)))
            inc += k ? 2 : 1;
    }
    ctx = inc;
    for (;;) {
        bit = cd_dec(&s->cd, 54 + ctx);
        if (!bit)
            break;
        ref++;
        ctx = (ctx >> 2) + 4;
        if (ref >= 32) { s->err = ERR_INVALID; return 0; }
    }
    return ref;
}

static int amvd_at(S *s, int lst, int bx, int by, int comp)
{
    int tot = 0, k;
    int pos[2][2] = {{bx - 1, by}, {bx, by - 1}};
    for (k = 0; k < 2; k++) {
        int nx = pos[k][0], ny = pos[k][1], mb;
        if (nx < 0 || ny < 0 || nx >= s->bw)
            continue;
        mb = (ny >> 2) * s->mb_w + (nx >> 2);
        if (s->gslice[mb] != s->cur_slice)
            continue;
        if (BREF(s, lst, ny, nx) == UNAVAIL)
            continue;
        tot += BMVD(s, lst, ny, nx, comp);
    }
    return tot;
}

static void dec_motion(S *s, int lst, int bx, int by, int predx, int predy,
                       int *mvx, int *mvy, int *mvdx, int *mvdy)
{
    int e = 0;
    *mvdx = decode_mvd(&s->cd, 40, amvd_at(s, lst, bx, by, 0), &e);
    *mvdy = decode_mvd(&s->cd, 47, amvd_at(s, lst, bx, by, 1), &e);
    if (e)
        s->err = ERR_INVALID;
    *mvx = predx + *mvdx;
    *mvy = predy + *mvdy;
}

static int dec_sub_mb_type_p(S *s)
{
    CD *c = &s->cd;
    if (cd_dec(c, 21))
        return 0;
    if (!cd_dec(c, 22))
        return 1;
    return cd_dec(c, 23) ? 2 : 3;
}

static int dec_sub_mb_type_b(S *s)
{
    CD *c = &s->cd;
    int t = 3;
    if (!cd_dec(c, 36))
        return 0;
    if (!cd_dec(c, 37))
        return 1 + cd_dec(c, 39);
    if (cd_dec(c, 38)) {
        if (cd_dec(c, 39))
            return 11 + cd_dec(c, 39);
        t += 4;
    }
    t += cd_dec(c, 39) << 1;
    t += cd_dec(c, 39);
    return t;
}

static int dec_mb_type_b(S *s, int i)
{
    CD *c = &s->cd;
    int left, top, inc = 0, bits;
    mb_neighbors(s, i, &left, &top);
    if (left >= 0 && !s->direct[left])
        inc++;
    if (top >= 0 && !s->direct[top])
        inc++;
    if (!cd_dec(c, 27 + inc))
        return 0;
    if (!cd_dec(c, 27 + 3))
        return 1 + cd_dec(c, 27 + 5);
    bits = cd_dec(c, 27 + 4) << 3;
    bits |= cd_dec(c, 27 + 5) << 2;
    bits |= cd_dec(c, 27 + 5) << 1;
    bits |= cd_dec(c, 27 + 5);
    if (bits < 8)
        return bits + 3;
    if (bits == 13)
        return 23;              /* intra suffix follows */
    if (bits == 14)
        return 11;
    if (bits == 15)
        return 22;
    return (((bits - 8) << 1) | cd_dec(c, 27 + 5)) + 12;
}

/* intra mb_type suffix; kind 0 = I_NxN, 1 = I_16x16 (cbp_l/cbp_c/mode),
 * err on I_PCM */
static int dec_mb_type_intra(S *s, int i, int *cbp_l, int *cbp_c, int *mode)
{
    CD *c = &s->cd;
    int base, b0, o1, o2, o3;
    if (s->slice_type == 2) {
        int left, top, inc = 0;
        mb_neighbors(s, i, &left, &top);
        if (left >= 0 && s->intra16[left])
            inc++;
        if (top >= 0 && s->intra16[top])
            inc++;
        b0 = cd_dec(c, 3 + inc);
        o1 = 6; o2 = 7; o3 = 9;
        if (b0) {
            if (cd_term(c)) { s->err = ERR_UNSUP; return 0; }
            *cbp_l = 15 * cd_dec(c, o1);
            *cbp_c = 0;
            if (cd_dec(c, o2))
                *cbp_c = 1 + cd_dec(c, 8);
            *mode = 2 * cd_dec(c, o3);
            *mode += cd_dec(c, 10);
            return 1;
        }
        return 0;
    }
    base = s->slice_type == 0 ? 17 : 32;
    b0 = cd_dec(c, base);
    if (!b0)
        return 0;
    if (cd_term(c)) { s->err = ERR_UNSUP; return 0; }
    *cbp_l = 15 * cd_dec(c, base + 1);
    *cbp_c = 0;
    if (cd_dec(c, base + 2))
        *cbp_c = 1 + cd_dec(c, base + 2);
    *mode = 2 * cd_dec(c, base + 3);
    *mode += cd_dec(c, base + 3);
    return 1;
}

static int dec_intra4x4_mode(S *s, int pred)
{
    CD *c = &s->cd;
    int mode;
    if (cd_dec(c, 68))
        return pred;
    mode = cd_dec(c, 69);
    mode += 2 * cd_dec(c, 69);
    mode += 4 * cd_dec(c, 69);
    return mode + (mode >= pred ? 1 : 0);
}

static int dec_chroma_mode(S *s, int i)
{
    CD *c = &s->cd;
    int left, top, inc = 0;
    mb_neighbors(s, i, &left, &top);
    if (left >= 0 && s->intra[left] && s->chroma_mode[left] != 0)
        inc++;
    if (top >= 0 && s->intra[top] && s->chroma_mode[top] != 0)
        inc++;
    if (!cd_dec(c, 64 + inc))
        return 0;
    if (!cd_dec(c, 67))
        return 1;
    if (!cd_dec(c, 67))
        return 2;
    return 3;
}

static int dec_cbp(S *s, int i)
{
    CD *c = &s->cd;
    int left, top, cbp_a, cbp_b, dflt, cbp = 0, ctx, ca, cb, b;
    mb_neighbors(s, i, &left, &top);
    dflt = s->intra[i] ? 0x7CF : 0x00F;
    cbp_a = left >= 0 ? s->cbp[left] : dflt;
    cbp_b = top >= 0 ? s->cbp[top] : dflt;
    ctx = (cbp_a & 0x02 ? 0 : 1) + 2 * (cbp_b & 0x04 ? 0 : 1);
    cbp += cd_dec(c, 73 + ctx);
    ctx = (cbp & 0x01 ? 0 : 1) + 2 * (cbp_b & 0x08 ? 0 : 1);
    cbp += cd_dec(c, 73 + ctx) << 1;
    ctx = (cbp_a & 0x08 ? 0 : 1) + 2 * (cbp & 0x01 ? 0 : 1);
    cbp += cd_dec(c, 73 + ctx) << 2;
    ctx = (cbp & 0x04 ? 0 : 1) + 2 * (cbp & 0x02 ? 0 : 1);
    cbp += cd_dec(c, 73 + ctx) << 3;
    ca = (cbp_a >> 4) & 3;
    cb = (cbp_b >> 4) & 3;
    ctx = (ca > 0 ? 1 : 0) + 2 * (cb > 0 ? 1 : 0);
    b = cd_dec(c, 77 + ctx);
    if (b) {
        int b2;
        ctx = 4 + (ca == 2 ? 1 : 0) + 2 * (cb == 2 ? 1 : 0);
        b2 = cd_dec(c, 77 + ctx);
        cbp |= (1 + b2) << 4;
    }
    return cbp;
}

static int dec_dqp(S *s)
{
    CD *c = &s->cd;
    int inc = s->last_dqp != 0 ? 1 : 0;
    int val, ctx, delta;
    if (cd_dec(c, 60 + inc)) {
        val = 1;
        ctx = 2;
        while (cd_dec(c, 60 + ctx)) {
            ctx = 3;
            val++;
            if (val > 104) { s->err = ERR_INVALID; return 0; }
        }
        delta = (val & 1) ? (val + 1) >> 1 : -((val + 1) >> 1);
    } else {
        delta = 0;
    }
    s->last_dqp = delta;
    return delta;
}

static int apply_dqp(int qp, int d)
{
    qp += d;
    if (qp < 0) qp += 52;
    else if (qp > 51) qp -= 52;
    return qp;
}

/* nnz of neighbor 4x4 for the cbf ctx (mirrors _nnz_at) */
static int nnz_at(S *s, const int *grid, int gw, int bx, int by,
                  int nbr_mb, int i, int cur_intra)
{
    if (bx < 0 || by < 0)
        return cur_intra ? 64 : 0;
    if (nbr_mb != i && nbr_mb < 0)
        return cur_intra ? 64 : 0;
    return grid[by * gw + bx];
}

static int cbf_ctx(S *s, int i, int cat, int blk)
{
    int x = s->cx, y = s->cy;
    int cur_intra = s->intra[i] != 0;
    int left, top, nza, nzb, inc;
    mb_neighbors(s, i, &left, &top);
    if (cat == 0) {
        nza = (left >= 0 ? s->cbp[left] : (cur_intra ? 0x7CF : 0)) & 0x100;
        nzb = (top >= 0 ? s->cbp[top] : (cur_intra ? 0x7CF : 0)) & 0x100;
    } else if (cat == 3) {
        int bit = 0x40 << blk;
        nza = (left >= 0 ? s->cbp[left] : (cur_intra ? 0x7CF : 0)) & bit;
        nzb = (top >= 0 ? s->cbp[top] : (cur_intra ? 0x7CF : 0)) & bit;
    } else if (cat == 1 || cat == 2) {
        int bx = 4 * x + blk_x_t[blk];
        int by = 4 * y + blk_y_t[blk];
        nza = nnz_at(s, s->nnz_y, s->bw, bx - 1, by,
                     (bx % 4 == 0) ? left : i, i, cur_intra);
        nzb = nnz_at(s, s->nnz_y, s->bw, bx, by - 1,
                     (by % 4 == 0) ? top : i, i, cur_intra);
    } else {
        int comp = blk >> 2, b = blk & 3;
        const int *grid = comp == 0 ? s->nnz_u : s->nnz_v;
        int bx = 2 * x + (b & 1);
        int by = 2 * y + (b >> 1);
        nza = nnz_at(s, grid, 2 * s->mb_w, bx - 1, by,
                     (bx % 2 == 0) ? left : i, i, cur_intra);
        nzb = nnz_at(s, grid, 2 * s->mb_w, bx, by - 1,
                     (by % 2 == 0) ? top : i, i, cur_intra);
    }
    inc = (nza > 0 ? 1 : 0) + 2 * (nzb > 0 ? 1 : 0);
    return cbf_base_t[cat] + inc;
}

/* coded_block_flag + residual; returns nnz */
static int residual_cbf(S *s, int i, int cat, int blk, int *levels,
                        int max_coeff)
{
    int nnz;
    if (!cd_dec(&s->cd, cbf_ctx(s, i, cat, blk)))
        return 0;
    nnz = residual_block(&s->cd, cat, levels, max_coeff);
    if (cat == 0)
        s->cbp[i] |= 0x100;
    else if (cat == 3)
        s->cbp[i] |= 0x40 << blk;
    return nnz;
}

/* luma residuals for one MB; cat 1 (I16 AC) or 2 (4x4) */
static void cb_luma_resid(S *s, int i, int mb_x, int mb_y, int cbp_luma,
                       int cat)
{
    int b;
    for (b = 0; b < 16; b++) {
        int gx = 4 * mb_x + blk_x_t[b];
        int gy = 4 * mb_y + blk_y_t[b];
        int nnz = 0;
        if (cbp_luma & (1 << (b >> 2))) {
            /* coded_block_flag = 1 guarantees >= 1 coefficient, so the
             * sparse row can be reserved up front and the residual
             * decoded straight into it */
            if (cd_dec(&s->cd, cbf_ctx(s, i, cat, b))) {
                int yc = s->sctx[0];
                int16_t *row;
                if (yc >= s->ycap) { s->err = ERR_INVALID; return; }
                row = s->yvals + (long long)yc * 16;
                memset(row, 0, 16 * sizeof(int16_t));
                if (cat == 1)
                    nnz = residual_block16(&s->cd, 1, row + 1, 15);
                else
                    nnz = residual_block16(&s->cd, 2, row, 16);
                s->sctx[2 + yc] = i * 16 + b;
                s->sctx[0] = yc + 1;
            }
        }
        s->nnz_y[gy * s->bw + gx] = nnz;
    }
}

static void cb_chroma_resid(S *s, int i, int mb_x, int mb_y, int cbp_chroma)
{
    int cc, b;
    if (cbp_chroma) {
        for (cc = 0; cc < 2; cc++) {
            int lv[4];
            int k;
            memset(lv, 0, sizeof(lv));
            residual_cbf(s, i, 3, cc, lv, 4);
            for (k = 0; k < 4; k++)
                s->chroma_dc[i * 8 + cc * 4 + k] = lv[k];
        }
    }
    for (cc = 0; cc < 2; cc++) {
        int *grid = cc == 0 ? s->nnz_u : s->nnz_v;
        for (b = 0; b < 4; b++) {
            int gx = 2 * mb_x + (b & 1);
            int gy = 2 * mb_y + (b >> 1);
            int nnz = 0;
            if (cbp_chroma == 2) {
                if (cd_dec(&s->cd, cbf_ctx(s, i, 4, 4 * cc + b))) {
                    int ccnt = s->sctx[1];
                    int16_t *row;
                    /* chroma arena is ycap/2 rows in both layouts */
                    if (ccnt >= s->ycap / 2) { s->err = ERR_INVALID; return; }
                    row = s->cvals + (long long)ccnt * 16;
                    memset(row, 0, 16 * sizeof(int16_t));
                    nnz = residual_block16(&s->cd, 4, row + 1, 15);
                    s->sctx[2 + s->ycap + ccnt] = i * 8 + 4 * cc + b;
                    s->sctx[1] = ccnt + 1;
                }
            }
            grid[gy * (2 * s->mb_w) + gx] = nnz;
        }
    }
}

/* transform_size_8x8_flag (ctx 399 + left/top flags) */
static int dec_t8flag(S *s, int i)
{
    int left, top, inc = 0;
    mb_neighbors(s, i, &left, &top);
    if (left >= 0 && s->t8[left])
        inc++;
    if (top >= 0 && s->t8[top])
        inc++;
    return cd_dec(&s->cd, 399 + inc);
}

/* 8x8 luma residuals: one cat-5 block per coded quadrant, de-zigzagged
 * to raster and published as the 4 sparse rows of its Z-order 4x4
 * slots (transport layout shared with the device t8 path) */
static void cb_luma8_resid(S *s, int i, int mb_x, int mb_y, int cbp_luma)
{
    int b, k;
    for (b = 0; b < 4; b++) {
        int gx = 4 * mb_x + 2 * (b & 1);
        int gy = 4 * mb_y + 2 * (b >> 1);
        int nnz = 0;
        if (cbp_luma & (1 << b)) {
            /* 4 consecutive sparse rows = the 64-coeff raster buffer;
             * the cat-5 decode de-zigzags into it directly */
            int yc = s->sctx[0];
            int16_t *rows;
            if (yc + 4 > s->ycap) { s->err = ERR_INVALID; return; }
            rows = s->yvals + (long long)yc * 16;
            memset(rows, 0, 64 * sizeof(int16_t));
            nnz = residual_block8r(&s->cd, rows);
            for (k = 0; k < 4; k++)
                s->sctx[2 + yc + k] = i * 16 + 4 * b + k;
            s->sctx[0] = yc + 4;
        }
        s->nnz_y[gy * s->bw + gx] = nnz;
        s->nnz_y[gy * s->bw + gx + 1] = nnz;
        s->nnz_y[(gy + 1) * s->bw + gx] = nnz;
        s->nnz_y[(gy + 1) * s->bw + gx + 1] = nnz;
    }
}

/* ---- partition tables (mirror part.py) ---- */

/* P_PARTS / B 16x8+8x16 shapes: x,y,w,h in 4x4 units */
static const int p_parts[3][2][4] = {
    {{0, 0, 4, 4}, {0, 0, 0, 0}},
    {{0, 0, 4, 2}, {0, 2, 4, 2}},
    {{0, 0, 2, 4}, {2, 0, 2, 4}},
};
static const int p_nparts[3] = {1, 2, 2};
/* P sub layouts: up to 4 parts of (x,y,w,h) in the 8x8 (2x2 blocks) */
static const int p_sub[4][4][4] = {
    {{0, 0, 2, 2}, {0}, {0}, {0}},
    {{0, 0, 2, 1}, {0, 1, 2, 1}, {0}, {0}},
    {{0, 0, 1, 2}, {1, 0, 1, 2}, {0}, {0}},
    {{0, 0, 1, 1}, {1, 0, 1, 1}, {0, 1, 1, 1}, {1, 1, 1, 1}},
};
static const int p_sub_n[4] = {1, 2, 2, 4};
/* B mb_type 1..21: shape (0=16x16,1=16x8,2=8x16) + predflags */
static const int b_shape[22] = {0, 0, 0, 0, 1, 2, 1, 2, 1, 2, 1, 2,
                                1, 2, 1, 2, 1, 2, 1, 2, 1, 2};
static const int b_pf[22][2] = {
    {0, 0}, {1, 0}, {2, 0}, {3, 0},
    {1, 1}, {1, 1}, {2, 2}, {2, 2}, {1, 2}, {1, 2}, {2, 1}, {2, 1},
    {1, 3}, {1, 3}, {2, 3}, {2, 3}, {3, 1}, {3, 1}, {3, 2}, {3, 2},
    {3, 3}, {3, 3},
};
/* B sub_mb_type 1..12 -> (layout key, predflag) */
static const int b_sub_layout[13] = {0, 0, 0, 0, 1, 2, 1, 2, 1, 2, 3, 3, 3};
static const int b_sub_pf[13]     = {0, 1, 2, 3, 1, 1, 2, 2, 3, 3, 1, 2, 3};

/* ---- shared inter walk (mirrors part.code_inter_mb) ---- */

static int code_inter_mb(S *s, int i, int mb_x, int mb_y, int mb_type,
                         int *t8ok)
{
    int bslice = s->slice_type == 1;
    int bx0 = 4 * mb_x, by0 = 4 * mb_y;
    int nref[2];
    int big[4][6];              /* x,y,w,h,pf,q(-1 none) */
    int nbig = 0, subs[4] = {0, 0, 0, 0}, has_subs = 0;
    int refs[2][4];
    int pending_ref[2][4], pending_mv[2][4][2], pending_on[2][4];
    int lst, k;

    nref[0] = s->nref0;
    nref[1] = s->nref1;
    memset(pending_on, 0, sizeof(pending_on));
    *t8ok = 1;                   /* 16x16/16x8/8x16 partitions */

    if (bslice && mb_type == 0) {
        direct_mb_motion(s, mb_x, mb_y, 0xF);
        *t8ok = s->d8x8inf;
        return 0;
    }
    if (bslice && mb_type == 22) {
        int q, dq_mask = 0;
        for (q = 0; q < 4; q++) {
            subs[q] = dec_sub_mb_type_b(s);
            if (subs[q] == 0)
                dq_mask |= 1 << q;
            if (!((subs[q] == 0 && s->d8x8inf) ||
                  (subs[q] != 0 && b_sub_layout[subs[q]] == 0)))
                *t8ok = 0;
        }
        has_subs = 1;
        for (q = 0; q < 4; q++) {
            big[q][0] = 2 * (q & 1);
            big[q][1] = 2 * (q >> 1);
            big[q][2] = 2;
            big[q][3] = 2;
            big[q][4] = subs[q] == 0 ? 0 : b_sub_pf[subs[q]];
            big[q][5] = q;
        }
        nbig = 4;
        if (dq_mask) {
            int cells[2][2] = {{bx0 + 2, by0}, {bx0 + 2, by0 + 2}};
            int qq[2] = {1, 3}, t;
            direct_mb_motion(s, mb_x, mb_y, dq_mask);
            for (t = 0; t < 2; t++) {
                int cx = cells[t][0], cy = cells[t][1];
                for (lst = 0; lst < 2; lst++) {
                    pending_ref[lst][qq[t]] = BREF(s, lst, cy, cx);
                    pending_mv[lst][qq[t]][0] = BMV(s, lst, cy, cx, 0);
                    pending_mv[lst][qq[t]][1] = BMV(s, lst, cy, cx, 1);
                    pending_on[lst][qq[t]] = 1;
                    BREF(s, lst, cy, cx) = UNAVAIL;
                    BMV(s, lst, cy, cx, 0) = 0;
                    BMV(s, lst, cy, cx, 1) = 0;
                }
            }
        }
    } else if (bslice) {
        int shape = b_shape[mb_type];
        int n = shape == 0 ? 1 : 2;
        for (k = 0; k < n; k++) {
            const int *pp = p_parts[shape][k];
            big[k][0] = pp[0];
            big[k][1] = pp[1];
            big[k][2] = pp[2];
            big[k][3] = pp[3];
            big[k][4] = k == 0 ? b_pf[mb_type][0] : b_pf[mb_type][1];
            big[k][5] = -1;
        }
        big[0][4] = b_pf[mb_type][0];
        if (n == 2)
            big[1][4] = b_pf[mb_type][1];
        nbig = n;
    } else if (mb_type <= 2) {
        for (k = 0; k < p_nparts[mb_type]; k++) {
            const int *pp = p_parts[mb_type][k];
            big[k][0] = pp[0];
            big[k][1] = pp[1];
            big[k][2] = pp[2];
            big[k][3] = pp[3];
            big[k][4] = 1;
            big[k][5] = -1;
        }
        nbig = p_nparts[mb_type];
    } else {                    /* P_8x8 (CABAC has no P_8x8ref0) */
        int q;
        for (q = 0; q < 4; q++) {
            subs[q] = dec_sub_mb_type_p(s);
            if (subs[q] != 0)
                *t8ok = 0;
        }
        has_subs = 1;
        for (q = 0; q < 4; q++) {
            big[q][0] = 2 * (q & 1);
            big[q][1] = 2 * (q >> 1);
            big[q][2] = 2;
            big[q][3] = 2;
            big[q][4] = 1;
            big[q][5] = q;
        }
        nbig = 4;
    }
    if (nbig > 1 || has_subs)
        s->flags[0] = 1;        /* any_part */

    /* ref pass.  The rect pre-write (ref visible, MV pending via the
     * UNAVAIL corner) only exists so LATER partitions of the same MB
     * see consistent neighbor state during their ref-ctx/MV
     * prediction; with a single partition per list nothing reads the
     * MB's own cells before g_set_part fills them, so the double
     * write is skipped for the dominant 16x16 case */
    for (lst = 0; lst < 2; lst++)
        for (k = 0; k < nbig; k++) {
            int x = big[k][0], y = big[k][1], w = big[k][2],
                h = big[k][3], pf = big[k][4];
            int val, xx, yy;
            if (pf == 0)
                continue;
            if (!((pf >> lst) & 1))
                refs[lst][k] = NOREF;
            else if (nref[lst] > 1) {
                int r = dec_ref_idx(s, lst, bx0 + x, by0 + y);
                if (r >= nref[lst])
                    return ERR_INVALID;
                refs[lst][k] = r;
            } else
                refs[lst][k] = 0;
            if (nbig == 1 && !has_subs)
                continue;
            val = refs[lst][k];
            for (yy = by0 + y; yy < by0 + y + h; yy++)
                for (xx = bx0 + x; xx < bx0 + x + w; xx++) {
                    BREF(s, lst, yy, xx) = val;
                    BMV(s, lst, yy, xx, 0) = 0;
                    BMV(s, lst, yy, xx, 1) = 0;
                }
            BREF(s, lst, by0 + y, bx0 + x) = UNAVAIL;
        }

    /* MV pass */
    for (lst = 0; lst < 2; lst++)
        for (k = 0; k < nbig; k++) {
            int x = big[k][0], y = big[k][1], w = big[k][2],
                h = big[k][3], pf = big[k][4], q = big[k][5];
            int ref;
            if (pf == 0) {
                if (pending_on[lst][q]) {
                    BREF(s, lst, by0 + y, bx0 + x) = pending_ref[lst][q];
                    BMV(s, lst, by0 + y, bx0 + x, 0) =
                        pending_mv[lst][q][0];
                    BMV(s, lst, by0 + y, bx0 + x, 1) =
                        pending_mv[lst][q][1];
                    pending_on[lst][q] = 0;
                }
                continue;
            }
            ref = refs[lst][k];
            if (!((pf >> lst) & 1)) {
                g_set_unused(s, lst, bx0 + x, by0 + y, w, h);
                continue;
            }
            BREF(s, lst, by0 + y, bx0 + x) = ref;
            if (q < 0) {
                int special = 0, px, py, mvx, mvy, mvdx, mvdy;
                if (w == 4 && h == 2)
                    special = 1 + k;
                else if (w == 2 && h == 4)
                    special = 3 + k;
                cb_pred_motion(s, lst, ref, bx0 + x, by0 + y, w, h,
                            special, &px, &py);
                dec_motion(s, lst, bx0 + x, by0 + y, px, py,
                           &mvx, &mvy, &mvdx, &mvdy);
                g_set_part(s, lst, bx0 + x, by0 + y, w, h, ref,
                           mvx, mvy, mvdx, mvdy, 0);
                if (w == 4 && h == 4) {
                    if (lst == 0) {
                        s->mv[2 * i] = mvx;
                        s->mv[2 * i + 1] = mvy;
                        s->ref_idx[i] = ref;
                    }
                }
            } else {
                int layout = bslice ? b_sub_layout[subs[q]] : subs[q];
                int j;
                for (j = 0; j < p_sub_n[layout]; j++) {
                    int sx = p_sub[layout][j][0], sy = p_sub[layout][j][1];
                    int sw = p_sub[layout][j][2], sh = p_sub[layout][j][3];
                    int px, py, mvx, mvy, mvdx, mvdy;
                    cb_pred_motion(s, lst, ref, bx0 + x + sx, by0 + y + sy,
                                sw, sh, 0, &px, &py);
                    dec_motion(s, lst, bx0 + x + sx, by0 + y + sy, px, py,
                               &mvx, &mvy, &mvdx, &mvdy);
                    g_set_part(s, lst, bx0 + x + sx, by0 + y + sy, sw, sh,
                               ref, mvx, mvy, mvdx, mvdy, 0);
                }
            }
        }
    if (bslice) {
        if (mb_type >= 1 && mb_type <= 3)
            s->sel[i] = mb_type - 1;
        if (mb_type > 3 || refs[0][0] > 0 || refs[1][0] > 0 ||
            (nbig > 1 && (refs[0][1] > 0 || refs[1][1] > 0)))
            s->flags[0] = 1;
    }
    return 0;
}

/* ---- per-MB decode ---- */

static int i4_cell(S *s, int gx, int gy)
{
    int mb;
    if (gx < 0 || gy < 0)
        return -1;
    mb = (gy >> 2) * s->mb_w + (gx >> 2);
    if (s->mcslice[mb] != s->cur_slice)
        return -1;               /* other slice: unavailable (6.4.9) */
    return s->i4grid[gy * s->bw + gx];
}

static int pred_i4_mode(S *s, int gx, int gy)
{
    int a = i4_cell(s, gx - 1, gy);
    int b = i4_cell(s, gx, gy - 1);
    int m = a < b ? a : b;
    return m < 0 ? 2 : m;
}

static void set_i4grid(S *s, int mb_x, int mb_y, int v)
{
    int x, y;
    for (y = 4 * mb_y; y < 4 * mb_y + 4; y++)
        for (x = 4 * mb_x; x < 4 * mb_x + 4; x++)
            s->i4grid[y * s->bw + x] = v;
}

static int decode_intra_mb(S *s, int i, int mb_x, int mb_y, int *qp)
{
    int cbp_l = 0, cbp_c = 0, mode = 0, kind, cbp, b;
    s->intra[i] = 1;
    g_set_intra(s, mb_x, mb_y);
    kind = dec_mb_type_intra(s, i, &cbp_l, &cbp_c, &mode);
    if (s->err)
        return s->err;
    if (kind == 0) {            /* I_NxN: I_4x4 or I_8x8 */
        int t8 = 0;
        if (s->t8mode) {
            t8 = dec_t8flag(s, i);
            s->t8[i] = t8;
        }
        s->i4[i] = 1;
        if (t8) {
            for (b = 0; b < 4; b++) {
                int gx = 4 * mb_x + 2 * (b & 1);
                int gy = 4 * mb_y + 2 * (b >> 1);
                int pm = pred_i4_mode(s, gx, gy);
                int m8 = dec_intra4x4_mode(s, pm);
                int k;
                for (k = 0; k < 4; k++)
                    s->i4_modes[i * 16 + 4 * b + k] = m8;
                s->i4grid[gy * s->bw + gx] = m8;
                s->i4grid[gy * s->bw + gx + 1] = m8;
                s->i4grid[(gy + 1) * s->bw + gx] = m8;
                s->i4grid[(gy + 1) * s->bw + gx + 1] = m8;
            }
        } else {
            for (b = 0; b < 16; b++) {
                int gx = 4 * mb_x + blk_x_t[b];
                int gy = 4 * mb_y + blk_y_t[b];
                int pm = pred_i4_mode(s, gx, gy);
                int m4 = dec_intra4x4_mode(s, pm);
                s->i4_modes[i * 16 + b] = m4;
                s->i4grid[gy * s->bw + gx] = m4;
            }
        }
        s->chroma_mode[i] = dec_chroma_mode(s, i);
        cbp = dec_cbp(s, i);
        s->cbp[i] = cbp;
        if (cbp)
            *qp = apply_dqp(*qp, dec_dqp(s));
        else
            s->last_dqp = 0;
        s->qp[i] = *qp;
        s->coded[i] = 1;
        if (t8)
            cb_luma8_resid(s, i, mb_x, mb_y, cbp & 15);
        else
            cb_luma_resid(s, i, mb_x, mb_y, cbp & 15, 2);
        cb_chroma_resid(s, i, mb_x, mb_y, cbp >> 4);
        return 0;
    }
    s->intra16[i] = 1;
    s->luma_mode[i] = mode;
    set_i4grid(s, mb_x, mb_y, 2);
    s->chroma_mode[i] = dec_chroma_mode(s, i);
    s->cbp[i] = cbp_l | (cbp_c << 4);
    *qp = apply_dqp(*qp, dec_dqp(s));
    s->qp[i] = *qp;
    {
        int lv[16], k;
        memset(lv, 0, sizeof(lv));
        residual_cbf(s, i, 0, 0, lv, 16);
        for (k = 0; k < 16; k++)
            s->luma_dc[i * 16 + k] = lv[k];
    }
    s->coded[i] = 1;
    cb_luma_resid(s, i, mb_x, mb_y, cbp_l, 1);
    cb_chroma_resid(s, i, mb_x, mb_y, cbp_c);
    return 0;
}

static int decode_inter_tail(S *s, int i, int mb_x, int mb_y, int *qp,
                             int t8ok)
{
    int cbp = dec_cbp(s, i);
    int t8 = 0;
    s->cbp[i] = cbp;
    if (s->t8mode && (cbp & 15) && t8ok) {
        t8 = dec_t8flag(s, i);
        s->t8[i] = t8;
    }
    if (cbp)
        *qp = apply_dqp(*qp, dec_dqp(s));
    else
        s->last_dqp = 0;
    s->qp[i] = *qp;
    s->coded[i] = 1;
    set_i4grid(s, mb_x, mb_y, 2);
    if (t8)
        cb_luma8_resid(s, i, mb_x, mb_y, cbp & 15);
    else
        cb_luma_resid(s, i, mb_x, mb_y, cbp & 15, 2);
    cb_chroma_resid(s, i, mb_x, mb_y, cbp >> 4);
    return 0;
}

static void cb_skip_mb(S *s, int i, int mb_x, int mb_y, int qp)
{
    if (s->slice_type == 1) {
        direct_mb_motion(s, mb_x, mb_y, 0xF);
    } else {
        int mx, my;
        cb_pred_pskip(s, mb_x, mb_y, &mx, &my);
        g_set_part(s, 0, 4 * mb_x, 4 * mb_y, 4, 4, 0, mx, my, 0, 0, 0);
        g_set_unused(s, 1, 4 * mb_x, 4 * mb_y, 4, 4);
        s->mv[2 * i] = mx;
        s->mv[2 * i + 1] = my;
        s->ref_idx[i] = 0;
    }
    s->qp[i] = qp;
    s->coded[i] = 1;
    set_i4grid(s, mb_x, mb_y, 2);
}

/* ---- entry point ----
 * params: [mb_w, mb_h, first_mb, slice_type, qp, cabac_init_idc,
 *          nref0, nref1, cur_slice, reset, has_col]
 * ctx_in: packed colocated motion (ref,mvx,mvy,poc) per 4x4 block or NULL
 * coeffs: int16 [nmb*16*16 yvals | nmb*8*16 cvals]
 * mb_meta: the int32 arena (layout mirrored in h264_cabac_host.py)
 * mvs/ctx_out: unused (NULL) */
int h264_cabac_decode_slice(
    const unsigned char *buf, long long buf_size,
    const int *params, const int *ctx_in,
    short *coeffs, int *mb_meta, short *mvs, int *ctx_out)
{
    S s;
    int *a = mb_meta;
    int nmb, i, qp, rc;
    (void)mvs;

    memset(&s, 0, sizeof(s));
    s.mb_w = params[0];
    s.mb_h = params[1];
    s.slice_type = params[3];
    s.nref0 = params[6];
    s.nref1 = params[7];
    s.cur_slice = params[8];
    s.nmb = nmb = s.mb_w * s.mb_h;
    s.bw = 4 * s.mb_w;
    s.bh = 4 * s.mb_h;
    qp = params[4];

    /* arena layout (must match h264_cabac_host.py) */
    s.intra = a;            a += nmb;
    s.i4 = a;               a += nmb;
    s.intra16 = a;          a += nmb;
    s.luma_mode = a;        a += nmb;
    s.chroma_mode = a;      a += nmb;
    s.qp = a;               a += nmb;
    s.coded = a;            a += nmb;
    s.skip = a;             a += nmb;
    s.direct = a;           a += nmb;
    s.cbp = a;              a += nmb;
    s.mcslice = a;          a += nmb;
    s.mv = a;               a += 2 * nmb;
    s.ref_idx = a;          a += nmb;
    s.sel = a;              a += nmb;
    s.i4_modes = a;         a += 16 * nmb;
    s.luma_dc = a;          a += 16 * nmb;
    s.chroma_dc = a;        a += 8 * nmb;
    s.nnz_y = a;            a += 16 * nmb;
    s.nnz_u = a;            a += 4 * nmb;
    s.nnz_v = a;            a += 4 * nmb;
    s.bref = a;             a += 2 * 16 * nmb;
    s.bmv = a;              a += 2 * 16 * nmb * 2;
    s.bmvd = a;             a += 2 * 16 * nmb * 2;
    s.bdirect = a;          a += 16 * nmb;
    s.gslice = a;           a += nmb;
    s.i4grid = a;           a += 16 * nmb;
    s.t8 = a;               a += nmb;
    s.flags = a;            a += 4;
    s.sctx = a;             /* 2 + 16nmb + 8nmb */
    s.ycap = 16 * nmb;
    s.yvals = coeffs;
    s.col = params[10] ? ctx_in : 0;
    s.t8mode = params[12];
    s.d8x8inf = params[13];
    if (ctx_out) {
        /* parallel slice decode: per-slice sparse output buffers
         * (ctx_out = private sctx, coeffs sized by params[11]) */
        s.sctx = ctx_out;
        s.ycap = params[11];
        s.sctx[0] = 0;
        s.sctx[1] = 0;
    }
    s.cvals = coeffs + (long long)s.ycap * 16;

    if (params[9]) {            /* first slice of the frame: reset */
        memset(s.intra, 0, (size_t)(11 * nmb) * 4);   /* intra..cbp,mcslice */
        for (i = 0; i < nmb; i++)
            s.mcslice[i] = -1;
        memset(s.mv, 0, (size_t)(2 * nmb) * 4);
        memset(s.ref_idx, 0, (size_t)nmb * 4);
        memset(s.sel, 0, (size_t)nmb * 4);
        for (i = 0; i < 16 * nmb; i++)
            s.i4_modes[i] = 2;
        memset(s.luma_dc, 0, (size_t)(16 * nmb) * 4);
        memset(s.chroma_dc, 0, (size_t)(8 * nmb) * 4);
        memset(s.nnz_y, 0, (size_t)(24 * nmb) * 4);
        for (i = 0; i < 2 * 16 * nmb; i++)
            s.bref[i] = UNAVAIL;
        /* bmv/bmvd/bdirect/i4grid carry no frame-start reset (~5MB of
         * memset): every decoded MB writes all its cells before any
         * read, and every read path (g_fetch, amvd_at, i4_cell) is
         * gated on gslice/mcslice matching the current slice.  Python
         * consumers mask through bref (reset above) and the per-MB
         * arrays.  Unreached MBs of corrupt streams land in the
         * concealment path, which keys off mcslice == -1. */
        for (i = 0; i < nmb; i++)
            s.gslice[i] = -1;
        memset(s.t8, 0, (size_t)nmb * 4);
        s.flags[0] = 0;
        s.sctx[0] = 0;
        s.sctx[1] = 0;
    }

    cd_init(&s.cd, buf, buf_size, s.slice_type == 2, params[5], qp);

    i = params[2];              /* first_mb */
    {
    int mb_x = i % s.mb_w, mb_y = i / s.mb_w;
    while (i < nmb) {
        s.mcslice[i] = s.cur_slice;
        s.gslice[i] = s.cur_slice;
        s.cx = mb_x;
        s.cy = mb_y;
        {
            int l_ = mb_x > 0 ? i - 1 : -1;
            int t_ = mb_y > 0 ? i - s.mb_w : -1;
            if (l_ >= 0 && s.mcslice[l_] != s.cur_slice) l_ = -1;
            if (t_ >= 0 && s.mcslice[t_] != s.cur_slice) t_ = -1;
            s.nb_left = l_;
            s.nb_top = t_;
        }
        if (s.slice_type == 1) {
            if (dec_mb_skip(&s, i)) {
                cb_skip_mb(&s, i, mb_x, mb_y, qp);
                s.skip[i] = 1;
                s.direct[i] = 1;
                s.last_dqp = 0;
            } else {
                int btype = dec_mb_type_b(&s, i);
                if (btype == 23) {
                    rc = decode_intra_mb(&s, i, mb_x, mb_y, &qp);
                    if (rc) return rc;
                } else {
                    int t8ok = 0;
                    s.direct[i] = btype == 0;
                    rc = code_inter_mb(&s, i, mb_x, mb_y, btype, &t8ok);
                    if (rc) return rc;
                    if (s.err) return s.err;
                    decode_inter_tail(&s, i, mb_x, mb_y, &qp, t8ok);
                }
            }
        } else if (s.slice_type == 0) {
            if (dec_mb_skip(&s, i)) {
                cb_skip_mb(&s, i, mb_x, mb_y, qp);
                s.skip[i] = 1;
                s.last_dqp = 0;
            } else if (cd_dec(&s.cd, 14)) {     /* intra */
                rc = decode_intra_mb(&s, i, mb_x, mb_y, &qp);
                if (rc) return rc;
            } else {
                int ptype;
                if (cd_dec(&s.cd, 15) == 0)
                    ptype = 3 * cd_dec(&s.cd, 16);
                else
                    ptype = 2 - cd_dec(&s.cd, 17);
                int t8ok = 0;
                rc = code_inter_mb(&s, i, mb_x, mb_y, ptype, &t8ok);
                if (rc) return rc;
                if (s.err) return s.err;
                decode_inter_tail(&s, i, mb_x, mb_y, &qp, t8ok);
            }
        } else {
            rc = decode_intra_mb(&s, i, mb_x, mb_y, &qp);
            if (rc) return rc;
        }
        if (s.err)
            return s.err;
        i++;
        if (++mb_x == s.mb_w) {
            mb_x = 0;
            mb_y++;
        }
        if (cd_term(&s.cd))
            break;
    }
    }
    return 0;
}

/* Pack the colocated-motion export for a just-decoded reference frame
 * in one pass (replaces the 4-pass numpy where/astype chain in
 * dec.py _col_motion, ~1.4ms/frame -> ~0.2ms): per 4x4 cell emit
 * (ref, mvx, mvy, refpoc) selecting list 0 when its ref is valid,
 * else list 1, else intra (-1, 0, 0, 0).  bref: [2][ncell] int32,
 * bmv: [2][ncell][2] int32, l0pocs/l1pocs: poc lookup tables with a
 * trailing 0 sentinel. */
void h264_col_pack(const int *bref, const int *bmv,
                   const int *l0pocs, int n0,
                   const int *l1pocs, int n1,
                   long long ncell, int *out)
{
    long long i;
    for (i = 0; i < ncell; i++) {
        int r0 = bref[i], r1 = bref[ncell + i];
        int use0 = r0 >= 0;
        const int *mv = use0 ? bmv + 2 * i : bmv + 2 * (ncell + i);
        int ref = use0 ? r0 : (r1 >= 0 ? r1 : -1);
        int poc;
        if (use0) {
            int k = r0 < n0 - 1 ? r0 : n0 - 1;
            poc = l0pocs[k];
        } else if (r1 >= 0) {
            int k = r1 < n1 - 1 ? r1 : n1 - 1;
            poc = l1pocs[k];
        } else {
            poc = 0;
        }
        out[4 * i]     = ref;
        out[4 * i + 1] = mv[0];
        out[4 * i + 2] = mv[1];
        out[4 * i + 3] = poc;
    }
}

/* Pack the block-granular device transport straight from the arena
 * grids in one pass (replaces the per-frame numpy where/clip/astype
 * chain in dec.py _reconstruct — host-glue AND upload bytes both
 * shrink to the final dtypes).  Layout mirrors the consumer
 * (device.py recon kw): bmv int16 (bh,bw,2), bref/bsel/pid int8.
 * want_b: also emit list-1 motion; want_pid: deblock picture ids from
 * the l0pid/l1pid tables; want_nnz: clip the nnz grid to int8.
 * bmv1 is zero-filled when deblock needs it without a B slice. */
void h264_export_blocks(
    const int *bref, const int *bmv, const int *nnz_y, long long ncell,
    int nrefs, int nrefs1,
    const int *l0pid, int nl0, const int *l1pid, int nl1,
    int want_b, int want_pid, int want_nnz, int zero_bmv1,
    short *bmv0, signed char *bref0, signed char *bsel,
    short *bmv1, signed char *bref1,
    signed char *pid0, signed char *pid1, signed char *nnz8)
{
    long long i;
    for (i = 0; i < ncell; i++) {
        int r0 = bref[i], r1 = bref[ncell + i];
        int use0 = r0 >= 0, use1 = r1 >= 0;
        int c0 = r0 < 0 ? 0 : (r0 >= nrefs ? nrefs - 1 : r0);
        bmv0[2 * i] = (short)bmv[2 * i];
        bmv0[2 * i + 1] = (short)bmv[2 * i + 1];
        bref0[i] = (signed char)c0;
        bsel[i] = (signed char)(use0 && use1 ? 2 : (use1 ? 1 : 0));
        if (want_b) {
            int c1 = r1 < 0 ? 0 : (r1 >= nrefs1 ? nrefs1 - 1 : r1);
            bmv1[2 * i] = (short)bmv[2 * (ncell + i)];
            bmv1[2 * i + 1] = (short)bmv[2 * (ncell + i) + 1];
            bref1[i] = (signed char)c1;
        } else if (zero_bmv1) {
            bmv1[2 * i] = 0;
            bmv1[2 * i + 1] = 0;
        }
        if (want_pid) {
            int k0 = r0 < 0 ? 0 : (r0 >= nl0 ? nl0 - 1 : r0);
            int k1 = r1 < 0 ? 0 : (r1 >= nl1 ? nl1 - 1 : r1);
            pid0[i] = (signed char)(use0 ? l0pid[k0] : -1);
            pid1[i] = (signed char)(use1 ? l1pid[k1] : -1);
        }
    }
    if (want_nnz)
        for (i = 0; i < ncell; i++) {
            int v = nnz_y[i];
            nnz8[i] = (signed char)(v < 0 ? 0 : (v > 127 ? 127 : v));
        }
}
