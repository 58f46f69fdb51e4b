/* MSB-first bit reader with 64-bit cache — the C twin of
 * libav_tpu/bitstream/getbits.py (design per reference get_bits.h:113
 * OPEN_READER/UPDATE_CACHE, re-written for 64-bit cache).
 * Reads past the end return zero bits; overread is tracked so callers can
 * reject corrupt streams. */
#ifndef LIBAV_TPU_BITREADER_H
#define LIBAV_TPU_BITREADER_H

#include <stdint.h>
#include <stddef.h>

typedef struct {
    const uint8_t *buf;
    int64_t size;        /* bytes */
    int64_t byte_pos;    /* next byte to load into cache */
    uint64_t cache;      /* top bits are next to be consumed */
    int bits_in_cache;
    int64_t overread;    /* bytes of zero padding consumed */
} BitReader;

static inline void br_init(BitReader *br, const uint8_t *buf, int64_t size)
{
    br->buf = buf;
    br->size = size;
    br->byte_pos = 0;
    br->cache = 0;
    br->bits_in_cache = 0;
    br->overread = 0;
}

static inline void br_refill(BitReader *br)
{
    while (br->bits_in_cache <= 56) {
        uint8_t b = 0;
        if (br->byte_pos < br->size)
            b = br->buf[br->byte_pos];
        else
            br->overread++;
        br->byte_pos++;
        br->cache |= (uint64_t)b << (56 - br->bits_in_cache);
        br->bits_in_cache += 8;
    }
}

static inline uint32_t br_peek(BitReader *br, int n)
{
    if (br->bits_in_cache < n)
        br_refill(br);
    return (uint32_t)(br->cache >> (64 - n));
}

static inline void br_skip(BitReader *br, int n)
{
    br->cache <<= n;
    br->bits_in_cache -= n;
}

static inline uint32_t br_get(BitReader *br, int n)
{
    uint32_t v;
    if (n == 0)
        return 0;
    v = br_peek(br, n);
    br_skip(br, n);
    return v;
}

/* JPEG receive-and-extend (T.81 F.2.2.1) */
static inline int br_receive_signed(BitReader *br, int n)
{
    int v;
    if (n == 0)
        return 0;
    v = (int)br_get(br, n);
    if (v < (1 << (n - 1)))
        v -= (1 << n) - 1;
    return v;
}

/* Two-level flattened VLC decode, table layout from
 * libav_tpu/bitstream/vlc.py (_flatten): lens[i] > 0 => symbol vals[i] of
 * that many bits; lens[i] < 0 => subtable at absolute offset vals[i]
 * indexed by -lens[i] further bits; lens[i] == 0 => invalid. */
static inline int vlc_read(BitReader *br, const int *vals,
                           const signed char *lens, int bits)
{
    uint32_t idx = br_peek(br, bits);
    int l = lens[idx];
    if (l > 0) {
        br_skip(br, l);
        return vals[idx];
    }
    if (l == 0)
        return -1;
    br_skip(br, bits);
    {
        int off = vals[idx];
        uint32_t idx2 = br_peek(br, -l);
        int l2 = lens[off + idx2];
        if (l2 <= 0)
            return -1;
        br_skip(br, l2);
        return vals[off + idx2];
    }
}

#endif
