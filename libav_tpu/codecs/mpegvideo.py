"""Shared mpegvideo device reconstruction (reference: the mpegvideo
framework libavcodec/mpegvideo.c ff_mpv_decode_mb :1700 +
mpegvideo_motion.c — SURVEY.md §2.2 'The mpegvideo framework').

One jitted whole-frame program parameterized by quantizer kind:
  'mpeg1' — ISO 11172-2 dequant with oddification mismatch control
  'mpeg2' — ISO 13818-2 dequant with coeff-63 LSB mismatch control
  'h263'  — H.263/MPEG-4 (2|L|+1)*q dequant with DC scaler

Used by both decoders and encoders (the encoder reconstructs its reference
frames through the *same* program, guaranteeing a closed prediction loop).
"""

from __future__ import annotations

import functools

import numpy as np

from libav_tpu.ops.quant import alternate_scan, zigzag_scan


@functools.lru_cache(maxsize=64)
def recon_jit(mb_w: int, mb_h: int, quant_kind: str, alt_scan: bool,
              inter_frame: bool, rounding: int = 0):
    import jax
    import jax.numpy as jnp

    from libav_tpu.ops import idct as idct_ops, quant as quant_ops
    from libav_tpu.ops.mc import EDGE, avg_pred, mc_hpel, chroma_mv_div2

    nmb = mb_w * mb_h
    scan = alternate_scan() if alt_scan else zigzag_scan()
    pos = np.empty(64, dtype=np.int64)
    pos[np.asarray(scan)] = np.arange(64)
    H, W = mb_h * 16, mb_w * 16

    mbx = (np.arange(nmb, dtype=np.int32) % mb_w)
    mby = (np.arange(nmb, dtype=np.int32) // mb_w)
    # block 0..5 luma flag per (nmb*6,) layout
    luma_blk = np.tile(np.array([1, 1, 1, 1, 0, 0], dtype=bool), nmb)

    def dequant(c, qs, intra_b, intra_q, inter_q):
        if quant_kind == "mpeg1":
            deq_i = quant_ops.mpeg1_dequant_intra(c, qs, intra_q)
            deq_p = quant_ops.mpeg1_dequant_inter(c, qs, inter_q)
            return jnp.where(intra_b[:, None], deq_i, deq_p)
        if quant_kind == "mpeg2":
            deq_i = quant_ops.mpeg2_dequant_intra(c, qs, intra_q)
            deq_p = quant_ops.mpeg2_dequant_inter(c, qs, inter_q)
            return jnp.where(intra_b[:, None], deq_i, deq_p)
        # h263 / mpeg4 short header quant
        lum = jnp.asarray(luma_blk)
        dcs_l = jnp.where(qs < 5, 8, jnp.where(qs < 9, 2 * qs,
                          jnp.where(qs < 25, qs + 8, 2 * qs - 16)))
        dcs_c = jnp.where(qs < 5, 8, jnp.where(qs < 25, (qs + 13) // 2,
                                               qs - 6))
        dcs = jnp.where(lum, dcs_l, dcs_c)
        deq_i = quant_ops.h263_dequant(c, qs, dcs, True)
        deq_p = quant_ops.h263_dequant(c, qs, dcs, False)
        return jnp.where(intra_b[:, None], deq_i, deq_p)

    def fn(coeffs, qscale, intra, use_fwd, use_bwd, mv_fwd, mv_bwd,
           intra_q, inter_q, r0y, r0u, r0v, r1y, r1u, r1v):
        c = coeffs.reshape(nmb * 6, 64).astype(jnp.int32)
        qs = jnp.repeat(qscale, 6)
        intra_b = jnp.repeat(intra, 6)

        deq = dequant(c, qs, intra_b, intra_q, inter_q)
        blocks = deq[:, pos].reshape(nmb * 6, 8, 8)
        if quant_kind == "mpeg2":
            blocks = quant_ops.mpeg2_mismatch_control(blocks)
        resid = idct_ops.idct8x8_int(blocks).reshape(nmb, 6, 8, 8)

        if inter_frame:
            xs = jnp.asarray(mbx * 16)
            ys = jnp.asarray(mby * 16)
            rnd = 1 - rounding
            fy = mc_hpel(r0y, xs, ys, mv_fwd[:, 0], mv_fwd[:, 1], 16, rnd)
            by = mc_hpel(r1y, xs, ys, mv_bwd[:, 0], mv_bwd[:, 1], 16, rnd)
            cxs = jnp.asarray(mbx * 8)
            cys = jnp.asarray(mby * 8)
            cmf = chroma_mv_div2(mv_fwd)
            cmb = chroma_mv_div2(mv_bwd)
            fu = mc_hpel(r0u, cxs, cys, cmf[:, 0], cmf[:, 1], 8, rnd)
            fv = mc_hpel(r0v, cxs, cys, cmf[:, 0], cmf[:, 1], 8, rnd)
            bu = mc_hpel(r1u, cxs, cys, cmb[:, 0], cmb[:, 1], 8, rnd)
            bv = mc_hpel(r1v, cxs, cys, cmb[:, 0], cmb[:, 1], 8, rnd)

            both = (use_fwd & use_bwd)[:, None, None]
            f_only = (use_fwd & ~use_bwd)[:, None, None]
            b_only = (~use_fwd & use_bwd)[:, None, None]

            def combine(pf, pb):
                return jnp.where(both, avg_pred(pf, pb),
                                 jnp.where(f_only, pf,
                                           jnp.where(b_only, pb, 0)))

            im = intra[:, None, None]
            pred_y = jnp.where(im, 0, combine(fy, by))
            pred_u = jnp.where(im, 0, combine(fu, bu))
            pred_v = jnp.where(im, 0, combine(fv, bv))
        else:
            pred_y = jnp.zeros((nmb, 16, 16), jnp.int32)
            pred_u = jnp.zeros((nmb, 8, 8), jnp.int32)
            pred_v = jnp.zeros((nmb, 8, 8), jnp.int32)

        luma_res = (resid[:, :4].reshape(nmb, 2, 2, 8, 8)
                    .transpose(0, 1, 3, 2, 4).reshape(nmb, 16, 16))
        yblk = jnp.clip(pred_y + luma_res, 0, 255).astype(jnp.uint8)
        ublk = jnp.clip(pred_u + resid[:, 4], 0, 255).astype(jnp.uint8)
        vblk = jnp.clip(pred_v + resid[:, 5], 0, 255).astype(jnp.uint8)

        yplane = (yblk.reshape(mb_h, mb_w, 16, 16)
                  .transpose(0, 2, 1, 3).reshape(H, W))
        uplane = (ublk.reshape(mb_h, mb_w, 8, 8)
                  .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))
        vplane = (vblk.reshape(mb_h, mb_w, 8, 8)
                  .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))

        pad = lambda p: jnp.pad(p, EDGE, mode="edge")
        return (yplane, uplane, vplane), (pad(yplane), pad(uplane),
                                          pad(vplane))

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def zero_pad_refs(mb_w: int, mb_h: int):
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE
    H, W = mb_h * 16, mb_w * 16
    y = jnp.full((H + 2 * EDGE, W + 2 * EDGE), 128, dtype=jnp.uint8)
    c = jnp.full((H // 2 + 2 * EDGE, W // 2 + 2 * EDGE), 128, dtype=jnp.uint8)
    return (y, c, c)
