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
              inter_frame: bool, rounding: int = 0,
              interlaced: bool = False, qpel: bool = False,
              dual: bool = False, any_4mv: bool = False):
    """interlaced=True compiles the MPEG-2 frame-picture interlace
    variant (reference: mpegvideo_motion.c mpv_motion field paths +
    mpegvideo.c dct_type handling): extra per-MB inputs select 16x8
    field motion compensation (two field vectors + field selects per
    direction) and field DCT residual interleave."""
    import jax
    import jax.numpy as jnp

    from libav_tpu.ops import idct as idct_ops, quant as quant_ops
    from libav_tpu.ops.mc import (EDGE, avg_pred, mc_hpel, chroma_mv_div2,
                                  chroma_mv_4mv_hpel, chroma_mv_4mv_qpel,
                                  chroma_mv_h263, chroma_mv_qpel,
                                  mc_hpel_tiled8, mc_qpel_mpeg4,
                                  mc_qpel_mpeg4_tiled8)
    if quant_kind in ("h263", "h263sh", "wmv1", "mpeg4", "mpeg4mq"):
        # H.263/MPEG-4 derive chroma MVs with the rounding table
        # (motion_est.h:96), not MPEG-1/2 truncation
        chroma_mv_div2 = chroma_mv_h263

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
        # h263 / mpeg4 quant: DC scaler table (ISO 14496-2 tab 7-2)
        lum = jnp.asarray(luma_blk)
        dcs_l = jnp.where(qs < 5, 8, jnp.where(qs < 9, 2 * qs,
                          jnp.where(qs < 25, qs + 8, 2 * qs - 16)))
        dcs_c = jnp.where(qs < 5, 8, jnp.where(qs < 25, (qs + 13) // 2,
                                               qs - 6))
        dcs = jnp.where(lum, dcs_l, dcs_c)
        if quant_kind == "h263sh":
            # real H.263 (short header): fixed DC scaler 8
            # (ituh263dec.c INTRADC 8-bit FLC, dequant level*8)
            dcs = jnp.full_like(dcs, 8)
        if quant_kind == "wmv1":
            # WMV1/msmpeg4v4 DC scale tables (msmpeg4data.c:1795)
            from libav_tpu.codecs import msmpeg4_tables as _MT
            ytab = jnp.asarray(_MT.WMV1_Y_DC_SCALE, jnp.int32)
            ctab = jnp.asarray(_MT.WMV1_C_DC_SCALE, jnp.int32)
            dcs = jnp.where(lum, ytab[jnp.clip(qs, 0, 31)],
                            ctab[jnp.clip(qs, 0, 31)])
        if quant_kind == "mpeg4mq":
            # MPEG-4 quant_type=1 (matrix quant, bitexact mismatch)
            deq_i = quant_ops.mpeg4_mq_dequant_intra(c, qs, intra_q, dcs)
            deq_p = quant_ops.mpeg4_mq_dequant_inter(c, qs, inter_q)
            return jnp.where(intra_b[:, None], deq_i, deq_p)
        deq_i = quant_ops.h263_dequant(c, qs, dcs, True)
        deq_p = quant_ops.h263_dequant(c, qs, dcs, False)
        return jnp.where(intra_b[:, None], deq_i, deq_p)

    def field_planes(plane):
        """padded frame plane -> (top, bottom) padded field planes
        (vertical EDGE re-padded in field coordinates)."""
        core = plane[EDGE:plane.shape[0] - EDGE]
        pads = ((EDGE, EDGE), (0, 0))
        return (jnp.pad(core[0::2], pads, mode="edge"),
                jnp.pad(core[1::2], pads, mode="edge"))

    def field_pred(ry, ru, rv, mv2, sel, rnd):
        """16x8-per-field MC: mv2 (nmb,2,2) field vectors (vertical in
        half-sample field units), sel (nmb,2) source field. Returns
        interleaved (nmb,16,16) luma + (nmb,8,8) chroma predictions."""
        yt, yb = field_planes(ry)
        ut, ub = field_planes(ru)
        vt, vb = field_planes(rv)
        xs = jnp.asarray(mbx * 16)
        ysf = jnp.asarray(mby * 8)
        cxs = jnp.asarray(mbx * 8)
        cysf = jnp.asarray(mby * 4)
        outs_y, outs_u, outs_v = [], [], []
        for f in range(2):          # destination field
            mvx, mvy = mv2[:, f, 0], mv2[:, f, 1]
            s = sel[:, f][:, None, None]
            py = jnp.where(s == 0,
                           mc_hpel(yt, xs, ysf, mvx, mvy, 16, rnd),
                           mc_hpel(yb, xs, ysf, mvx, mvy, 16, rnd))[:, :8]
            cmv = chroma_mv_div2(mv2[:, f])
            pu = jnp.where(s == 0,
                           mc_hpel(ut, cxs, cysf, cmv[:, 0], cmv[:, 1],
                                   8, rnd),
                           mc_hpel(ub, cxs, cysf, cmv[:, 0], cmv[:, 1],
                                   8, rnd))[:, :4]
            pv = jnp.where(s == 0,
                           mc_hpel(vt, cxs, cysf, cmv[:, 0], cmv[:, 1],
                                   8, rnd),
                           mc_hpel(vb, cxs, cysf, cmv[:, 0], cmv[:, 1],
                                   8, rnd))[:, :4]
            outs_y.append(py)
            outs_u.append(pu)
            outs_v.append(pv)
        y = jnp.zeros((nmb, 16, 16), jnp.int32)
        y = y.at[:, 0::2].set(outs_y[0]).at[:, 1::2].set(outs_y[1])
        u = jnp.zeros((nmb, 8, 8), jnp.int32)
        u = u.at[:, 0::2].set(outs_u[0]).at[:, 1::2].set(outs_u[1])
        v = jnp.zeros((nmb, 8, 8), jnp.int32)
        v = v.at[:, 0::2].set(outs_v[0]).at[:, 1::2].set(outs_v[1])
        return y, u, v

    def fn(coeffs, qscale, intra, use_fwd, use_bwd, mv_fwd, mv_bwd,
           intra_q, inter_q, r0y, r0u, r0v, r1y, r1u, r1v,
           field_mc=None, dct_field=None, mvf2=None, mvb2=None,
           sel_f=None, sel_b=None, dp=None, mv_dp2=None, sel_dp=None,
           use4=None, mv4f=None, mv4b=None):
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
            if qpel:
                # MPEG-4 quarter-sample mode: MVs arrive in quarter-pel
                # units (spec 14496-2 7.6.2.2; qpeldsp.c filters)
                fy = mc_qpel_mpeg4(r0y, xs, ys, mv_fwd[:, 0],
                                   mv_fwd[:, 1], no_rnd=rounding)
                by = mc_qpel_mpeg4(r1y, xs, ys, mv_bwd[:, 0],
                                   mv_bwd[:, 1], no_rnd=rounding)
                if any_4mv:
                    # MV_TYPE_8X8 (4MV / qpel direct): four 8x8 qpel
                    # blocks — the 8-wide reflection boundaries change
                    # the samples vs one 16x16 block
                    m4 = use4[:, None, None]
                    fy = jnp.where(m4, mc_qpel_mpeg4_tiled8(
                        r0y, xs, ys, mv4f, no_rnd=rounding), fy)
                    by = jnp.where(m4, mc_qpel_mpeg4_tiled8(
                        r1y, xs, ys, mv4b, no_rnd=rounding), by)
            else:
                fy = mc_hpel(r0y, xs, ys, mv_fwd[:, 0], mv_fwd[:, 1],
                             16, rnd)
                by = mc_hpel(r1y, xs, ys, mv_bwd[:, 0], mv_bwd[:, 1],
                             16, rnd)
                if any_4mv:
                    m4 = use4[:, None, None]
                    fy = jnp.where(m4, mc_hpel_tiled8(r0y, xs, ys,
                                                      mv4f, rnd), fy)
                    by = jnp.where(m4, mc_hpel_tiled8(r1y, xs, ys,
                                                      mv4b, rnd), by)
            cxs = jnp.asarray(mbx * 8)
            cys = jnp.asarray(mby * 8)
            if qpel:
                cmf = chroma_mv_qpel(mv_fwd)
                cmb = chroma_mv_qpel(mv_bwd)
                if any_4mv:
                    c4 = use4[:, None]
                    cmf = jnp.where(c4, chroma_mv_4mv_qpel(mv4f), cmf)
                    cmb = jnp.where(c4, chroma_mv_4mv_qpel(mv4b), cmb)
            else:
                cmf = chroma_mv_div2(mv_fwd)
                cmb = chroma_mv_div2(mv_bwd)
                if any_4mv:
                    c4 = use4[:, None]
                    cmf = jnp.where(c4, chroma_mv_4mv_hpel(mv4f), cmf)
                    cmb = jnp.where(c4, chroma_mv_4mv_hpel(mv4b), cmb)
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

            if interlaced:
                ffy, ffu, ffv = field_pred(r0y, r0u, r0v, mvf2, sel_f, rnd)
                bfy, bfu, bfv = field_pred(r1y, r1u, r1v, mvb2, sel_b, rnd)
                fm = field_mc[:, None, None]
                fy = jnp.where(fm, ffy, fy)
                fu = jnp.where(fm, ffu, fu)
                fv = jnp.where(fm, ffv, fv)
                by = jnp.where(fm, bfy, by)
                bu = jnp.where(fm, bfu, bu)
                bv = jnp.where(fm, bfv, bv)
                if dual:
                    # frame-picture dual prime: average the same-parity
                    # field prediction with the cross-parity one from
                    # the derived vectors (13818-2 7.6.3.6)
                    oy, ou, ov = field_pred(r0y, r0u, r0v, mv_dp2,
                                            sel_dp, rnd)
                    dpm = dp[:, None, None]
                    fy = jnp.where(dpm, avg_pred(fy, oy), fy)
                    fu = jnp.where(dpm, avg_pred(fu, ou), fu)
                    fv = jnp.where(dpm, avg_pred(fv, ov), fv)

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
        if interlaced:
            # field DCT: blocks 0/1 hold the top-field lines, 2/3 the
            # bottom-field lines (ISO 13818-2 figure 6-13)
            fr = jnp.zeros((nmb, 16, 16), jnp.int32)
            top = jnp.concatenate([resid[:, 0], resid[:, 1]], axis=2)
            bot = jnp.concatenate([resid[:, 2], resid[:, 3]], axis=2)
            fr = fr.at[:, 0::2].set(top).at[:, 1::2].set(bot)
            luma_res = jnp.where(dct_field[:, None, None], fr, luma_res)
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


@functools.lru_cache(maxsize=32)
def recon_field_jit(mb_w: int, mb_h_f: int, alt_scan: bool,
                    inter_frame: bool, dual: bool = False):
    """MPEG-2 FIELD-PICTURE reconstruction (ISO 13818-2 7.6.2; reference
    mpegvideo_motion.c mpeg_motion with field_based picture): the coded
    picture is one field of mb_w x mb_h_f macroblocks. References arrive
    as padded FIELD plane triples per parity: (f0t, f0b) forward /
    most-recent, (f1t, f1b) backward. Per MB, two (vector, field_select)
    rows cover the upper/lower 16x8 halves (whole-field MC duplicates
    the row); dual=True adds the dual-prime inputs whose two rows are
    averaged whole-field predictions instead."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import idct as idct_ops, quant as quant_ops
    from libav_tpu.ops.mc import EDGE, avg_pred, mc_hpel, chroma_mv_div2

    nmb = mb_w * mb_h_f
    scan = alternate_scan() if alt_scan else zigzag_scan()
    pos = np.empty(64, dtype=np.int64)
    pos[np.asarray(scan)] = np.arange(64)
    H, W = mb_h_f * 16, mb_w * 16

    mbx = (np.arange(nmb, dtype=np.int32) % mb_w)
    mby = (np.arange(nmb, dtype=np.int32) // mb_w)

    def fn(coeffs, qscale, intra, use_fwd, use_bwd,
           mvf2, sel_f, mvb2, sel_b, intra_q, inter_q,
           f0ty, f0tu, f0tv, f0by, f0bu, f0bv,
           f1ty, f1tu, f1tv, f1by, f1bu, f1bv,
           dp=None, mv_dp2=None, sel_dp=None):
        c = coeffs.reshape(nmb * 6, 64).astype(jnp.int32)
        qs = jnp.repeat(qscale, 6)
        intra_b = jnp.repeat(intra, 6)
        deq_i = quant_ops.mpeg2_dequant_intra(c, qs, intra_q)
        deq_p = quant_ops.mpeg2_dequant_inter(c, qs, inter_q)
        deq = jnp.where(intra_b[:, None], deq_i, deq_p)
        blocks = deq[:, pos].reshape(nmb * 6, 8, 8)
        blocks = quant_ops.mpeg2_mismatch_control(blocks)
        resid = idct_ops.idct8x8_int(blocks).reshape(nmb, 6, 8, 8)

        if inter_frame:
            xs = jnp.asarray(mbx * 16)
            ys = jnp.asarray(mby * 16)
            cxs = jnp.asarray(mbx * 8)
            cys = jnp.asarray(mby * 8)

            def whole(planes_t, planes_b, mv, sel):
                """16-row field MC from top/bottom ref fields."""
                mvx, mvy = mv[:, 0], mv[:, 1]
                s = sel[:, None, None]
                py = jnp.where(
                    s == 0,
                    mc_hpel(planes_t[0], xs, ys, mvx, mvy, 16, 1),
                    mc_hpel(planes_b[0], xs, ys, mvx, mvy, 16, 1))
                cmv = chroma_mv_div2(mv)
                pu = jnp.where(
                    s == 0,
                    mc_hpel(planes_t[1], cxs, cys, cmv[:, 0], cmv[:, 1],
                            8, 1),
                    mc_hpel(planes_b[1], cxs, cys, cmv[:, 0], cmv[:, 1],
                            8, 1))
                pv = jnp.where(
                    s == 0,
                    mc_hpel(planes_t[2], cxs, cys, cmv[:, 0], cmv[:, 1],
                            8, 1),
                    mc_hpel(planes_b[2], cxs, cys, cmv[:, 0], cmv[:, 1],
                            8, 1))
                return py, pu, pv

            def halves(pt, pb, mv2, sel):
                """upper/lower 16x8 halves from the two vector rows."""
                y0, u0, v0 = whole(pt, pb, mv2[:, 0], sel[:, 0])
                y1, u1, v1 = whole(pt, pb, mv2[:, 1], sel[:, 1])
                y = jnp.concatenate([y0[:, :8], y1[:, 8:]], axis=1)
                u = jnp.concatenate([u0[:, :4], u1[:, 4:]], axis=1)
                v = jnp.concatenate([v0[:, :4], v1[:, 4:]], axis=1)
                return y, u, v

            f_t = (f0ty, f0tu, f0tv)
            f_b = (f0by, f0bu, f0bv)
            b_t = (f1ty, f1tu, f1tv)
            b_b = (f1by, f1bu, f1bv)
            fy, fu, fv = halves(f_t, f_b, mvf2, sel_f)
            by, bu, bv = halves(b_t, b_b, mvb2, sel_b)
            if dual:
                ay, au, av = whole(f_t, f_b, mvf2[:, 0], sel_f[:, 0])
                oy, ou, ov = whole(f_t, f_b, mv_dp2[:, 0], sel_dp[:, 0])
                dpm = dp[:, None, None]
                fy = jnp.where(dpm, avg_pred(ay, oy), fy)
                fu = jnp.where(dpm, avg_pred(au, ou), fu)
                fv = jnp.where(dpm, avg_pred(av, ov), fv)

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
        yplane = (yblk.reshape(mb_h_f, mb_w, 16, 16)
                  .transpose(0, 2, 1, 3).reshape(H, W))
        uplane = (ublk.reshape(mb_h_f, mb_w, 8, 8)
                  .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))
        vplane = (vblk.reshape(mb_h_f, mb_w, 8, 8)
                  .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))
        pad = lambda p: jnp.pad(p, EDGE, mode="edge")
        return (yplane, uplane, vplane), (pad(yplane), pad(uplane),
                                          pad(vplane))

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def fields_of_frame_jit(mb_w: int, mb_h: int):
    """Padded frame planes -> ((top y,u,v), (bottom y,u,v)) padded field
    planes (one dispatch)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE

    def fn(y, u, v):
        def split(p):
            core = p[EDGE:p.shape[0] - EDGE, EDGE:p.shape[1] - EDGE]
            pads = ((EDGE, EDGE), (EDGE, EDGE))
            return (jnp.pad(core[0::2], pads, mode="edge"),
                    jnp.pad(core[1::2], pads, mode="edge"))
        yt, yb = split(y)
        ut, ub = split(u)
        vt, vb = split(v)
        return (yt, ut, vt), (yb, ub, vb)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def weave_fields_jit(mb_w: int, mb_h: int):
    """(top, bottom) unpadded field planes -> frame planes + padded
    frame planes (for the reference DPB)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE

    def fn(ty, tu, tv, by, bu, bv):
        def weave(t, b):
            out = jnp.zeros((t.shape[0] * 2, t.shape[1]), t.dtype)
            return out.at[0::2].set(t).at[1::2].set(b)
        y = weave(ty, by)
        u = weave(tu, bu)
        v = weave(tv, bv)
        pad = lambda p: jnp.pad(p, EDGE, mode="edge")
        return (y, u, v), (pad(y), pad(u), pad(v))

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def encode_field_stress_jit(mb_w: int, mb_h_f: int, parity: int,
                            search_range: int = 15,
                            pattern: str = "full"):
    """P FIELD picture encode, conformance-generator flavor: per-MB mode
    cycles through whole-field MC (same parity), whole-field MC
    (opposite parity), 16x8 MC (upper same / lower opposite) and dual
    prime (dmv = 0) — every field_motion_type decode path of ISO
    13818-2 7.6.2/7.6.3.6. One field ME supplies the vector for every
    mode. Returns (levels, mv) in field geometry."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct as fdct_ops
    from libav_tpu.ops.mc import avg_pred, mc_hpel, chroma_mv_div2
    from libav_tpu.ops.me import _search_jit, _hpel_refine_jit

    nmb = mb_w * mb_h_f
    zz = zigzag_scan()
    mbx = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    mby = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)
    if pattern == "same":
        mode_pat = np.zeros(nmb, dtype=np.int64)
    elif pattern == "opp":
        mode_pat = np.ones(nmb, dtype=np.int64)
    elif pattern == "whole":
        mode_pat = (np.arange(nmb) + np.arange(nmb) // mb_w) % 2
    elif pattern == "h16":
        mode_pat = ((np.arange(nmb) + np.arange(nmb) // mb_w) % 2) * 2
    elif pattern == "dponly":
        mode_pat = ((np.arange(nmb) + np.arange(nmb) // mb_w) % 2) * 3
    else:
        mode_pat = (np.arange(nmb) + np.arange(nmb) // mb_w) % 4
    # dual prime only on interior MBs: the reference decoder SKIPS any
    # motion compensation whose source window leaves the picture
    # (mpegvideo_motion.c "MPEG motion vector out of boundary"), so a
    # conforming stream must keep the derived cross-parity vector in
    # bounds; interior MBs leave a full-MB margin
    bx = np.arange(nmb) % mb_w
    by = np.arange(nmb) // mb_w
    interior = (bx > 0) & (bx < mb_w - 1) & (by > 0) & (by < mb_h_f - 1)
    mode_pat = np.where((mode_pat == 3) & ~interior, 0, mode_pat)

    def blockify(plane, bs):
        bh, bw = plane.shape[0] // bs, plane.shape[1] // bs
        return (plane.reshape(bh, bs, bw, bs).transpose(0, 2, 1, 3)
                .reshape(bh * bw, bs, bs))

    def mb_blocks(y, u, v):
        yb = blockify(y, 8).reshape(mb_h_f, 2, mb_w, 2, 8, 8)
        yb = yb.transpose(0, 2, 1, 3, 4, 5).reshape(nmb, 4, 8, 8)
        ub = blockify(u, 8)[:, None]
        vb = blockify(v, 8)[:, None]
        return jnp.concatenate([yb, ub, vb], axis=1).astype(jnp.int32)

    H, W = mb_h_f * 16, mb_w * 16

    def planes_of(py, pu, pv):
        return ((py.reshape(mb_h_f, mb_w, 16, 16)
                 .transpose(0, 2, 1, 3).reshape(H, W)),
                (pu.reshape(mb_h_f, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)),
                (pv.reshape(mb_h_f, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)))

    def fn(src_y, src_u, src_v, qscale, inter_qmat_zz,
           sty, stu, stv, sby, sbu, sbv):
        # (sty..) = top-parity ref field planes, (sby..) = bottom
        cy = src_y.astype(jnp.int32)
        cur_mbs = (cy.reshape(mb_h_f, 16, mb_w, 16)
                   .transpose(0, 2, 1, 3).reshape(nmb, 16, 16))
        blocks = mb_blocks(cy, src_u.astype(jnp.int32),
                           src_v.astype(jnp.int32))
        same = (sty, stu, stv) if parity == 0 else (sby, sbu, sbv)
        opp = (sby, sbu, sbv) if parity == 0 else (sty, stu, stv)

        fmv, _ = _search_jit(mb_w, mb_h_f, search_range, True)(
            cur_mbs, same[0])
        mv, _ = _hpel_refine_jit(mb_w, mb_h_f, True)(cur_mbs, same[0],
                                                     fmv)

        def mc6(planes, m):
            py = mc_hpel(planes[0], mbx, mby, m[:, 0], m[:, 1], 16, 1)
            cmv = chroma_mv_div2(m)
            pu = mc_hpel(planes[1], mbx // 2, mby // 2, cmv[:, 0],
                         cmv[:, 1], 8, 1)
            pv = mc_hpel(planes[2], mbx // 2, mby // 2, cmv[:, 0],
                         cmv[:, 1], 8, 1)
            return py, pu, pv

        ps = mc6(same, mv)
        po = mc6(opp, mv)
        # dual prime opposite-parity derived vector (dmv = 0)
        dx = ((mv[:, 0] + (mv[:, 0] > 0)) >> 1)
        dy = ((mv[:, 1] + (mv[:, 1] > 0)) >> 1) + (-1 if parity == 0
                                                   else 1)
        pdp_o = mc6(opp, jnp.stack([dx, dy], axis=1))
        pat = jnp.asarray(mode_pat)[:, None, None]

        def pick(a, b, c, d):
            return jnp.where(pat == 0, a,
                             jnp.where(pat == 1, b,
                                       jnp.where(pat == 2, c, d)))

        outs = []
        for k in range(3):
            h16 = jnp.concatenate(
                [ps[k][:, :ps[k].shape[1] // 2],
                 po[k][:, po[k].shape[1] // 2:]], axis=1)
            dp = avg_pred(ps[k], pdp_o[k])
            outs.append(pick(ps[k], po[k], h16, dp))
        pred_y, pred_u, pred_v = outs

        resid = blocks - mb_blocks(*planes_of(pred_y, pred_u, pred_v))
        coeffs8 = fdct_ops.fdct8x8_int(resid.reshape(nmb * 6, 8, 8))
        czz = coeffs8.reshape(nmb * 6, 64)[:, zz]
        qs6 = jnp.repeat(qscale, 6)
        q = jnp.maximum((qs6[:, None] * inter_qmat_zz[None, :]) // 2, 1)
        lv = jnp.sign(czz) * (jnp.abs(czz) // q)
        levels = jnp.clip(lv, -2047, 2047)
        return levels.reshape(nmb, 6, 64), mv

    return jax.jit(fn), mode_pat


@functools.lru_cache(maxsize=32)
def encode_b_jit(mb_w: int, mb_h: int, quant_kind: str = "mpeg1",
                 search_range: int = 15):
    """B-picture encode program (reference: mpegvideo_enc.c
    estimate_b_frame_motion path — ME against both anchors, per-MB
    fwd/bwd/bi decision, FDCT + inter quant).

    Returns (levels (nmb,6,64) zigzag, mv_fwd, mv_bwd, use_fwd, use_bwd);
    bi-prediction sets both use flags."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct as fdct_ops
    from libav_tpu.ops.mc import avg_pred, mc_hpel, chroma_mv_div2
    from libav_tpu.ops.me import _search_jit, _hpel_refine_jit

    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    zz = zigzag_scan()
    mbx = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    mby = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)

    def blockify(plane, bs):
        bh, bw = plane.shape[0] // bs, plane.shape[1] // bs
        return (plane.reshape(bh, bs, bw, bs).transpose(0, 2, 1, 3)
                .reshape(bh * bw, bs, bs))

    def mb_blocks(y, u, v):
        yb = blockify(y, 8).reshape(mb_h, 2, mb_w, 2, 8, 8)
        yb = yb.transpose(0, 2, 1, 3, 4, 5).reshape(nmb, 4, 8, 8)
        ub = blockify(u, 8)[:, None]
        vb = blockify(v, 8)[:, None]
        return jnp.concatenate([yb, ub, vb], axis=1).astype(jnp.int32)

    def planes_of(pred_y, pred_u, pred_v):
        return ((pred_y.reshape(mb_h, mb_w, 16, 16)
                 .transpose(0, 2, 1, 3).reshape(H, W)),
                (pred_u.reshape(mb_h, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)),
                (pred_v.reshape(mb_h, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)))

    def fn(cur_y, cur_u, cur_v, qscale, inter_qmat_zz,
           r0y, r0u, r0v, r1y, r1u, r1v):
        cy = cur_y.astype(jnp.int32)
        cur_mbs = (cy.reshape(mb_h, 16, mb_w, 16)
                   .transpose(0, 2, 1, 3).reshape(nmb, 16, 16))
        blocks = mb_blocks(cy, cur_u.astype(jnp.int32),
                           cur_v.astype(jnp.int32))

        def me(ref_y):
            bounded = quant_kind in ("mpeg1", "mpeg2")
            fmv, _ = _search_jit(mb_w, mb_h, search_range,
                                 bounded)(cur_mbs, ref_y)
            return _hpel_refine_jit(mb_w, mb_h, bounded)(cur_mbs, ref_y,
                                                         fmv)

        mvf, sadf = me(r0y)
        mvb, sadb = me(r1y)

        def mc6(ry, ru, rv, mv):
            py = mc_hpel(ry, mbx, mby, mv[:, 0], mv[:, 1], 16)
            cmv = chroma_mv_div2(mv)
            pu = mc_hpel(ru, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
            pv = mc_hpel(rv, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
            return py, pu, pv

        fy, fu, fv = mc6(r0y, r0u, r0v, mvf)
        by, bu, bv = mc6(r1y, r1u, r1v, mvb)
        biy = avg_pred(fy, by)
        sadbi = jnp.abs(cur_mbs - biy).sum(axis=(1, 2))

        # per-MB mode: 0=fwd, 1=bwd, 2=bi (small bi bias: two MV costs)
        costs = jnp.stack([sadf, sadb, sadbi + 64], axis=1)
        mode = jnp.argmin(costs, axis=1)
        use_fwd = mode != 1
        use_bwd = mode != 0
        m = mode[:, None, None]
        pred_y = jnp.where(m == 0, fy, jnp.where(m == 1, by, biy))
        pred_u = jnp.where(m == 0, fu, jnp.where(m == 1, bu,
                                                 avg_pred(fu, bu)))
        pred_v = jnp.where(m == 0, fv, jnp.where(m == 1, bv,
                                                 avg_pred(fv, bv)))

        resid = blocks - mb_blocks(*planes_of(pred_y, pred_u, pred_v))
        coeffs8 = fdct_ops.fdct8x8_int(resid.reshape(nmb * 6, 8, 8))
        czz = coeffs8.reshape(nmb * 6, 64)[:, zz]
        qs6 = jnp.repeat(qscale, 6)
        q = qs6[:, None] * inter_qmat_zz[None, :]
        if quant_kind == "mpeg2":
            q = jnp.maximum(q // 2, 1)
        lv = jnp.sign(czz) * (jnp.abs(czz) // q)
        lim = 2047 if quant_kind == "mpeg2" else 255
        levels = jnp.clip(lv, -lim, lim)
        return (levels.reshape(nmb, 6, 64), mvf, mvb, use_fwd, use_bwd)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def zero_pad_refs(mb_w: int, mb_h: int):
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE
    H, W = mb_h * 16, mb_w * 16
    y = jnp.full((H + 2 * EDGE, W + 2 * EDGE), 128, dtype=jnp.uint8)
    c = jnp.full((H // 2 + 2 * EDGE, W // 2 + 2 * EDGE), 128, dtype=jnp.uint8)
    return (y, c, c)


@functools.lru_cache(maxsize=16)
def encode_b_h263_jit(mb_w: int, mb_h: int, quant_kind: str = "h263",
                      search_range: int = 12):
    """B-picture device encode (reference: the B branch of
    mpegvideo_enc.c encode_mb): forward + backward half-pel ME, per-MB
    fwd/bwd/bi mode decision by SAD, residual FDCT + inter quant.
    Returns (levels zigzag (nmb,6,64), mv_f, mv_b, sel 0=fwd 1=bwd
    2=bi, sad of the chosen mode)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct as fdct_ops
    from libav_tpu.ops.mc import mc_hpel, chroma_mv_h263
    from libav_tpu.ops.me import _search_jit, _hpel_refine_jit

    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    zz = zigzag_scan()
    mbx = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    mby = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)

    def blockify(plane, bs):
        bh, bw = plane.shape[0] // bs, plane.shape[1] // bs
        return (plane.reshape(bh, bs, bw, bs).transpose(0, 2, 1, 3)
                .reshape(bh * bw, bs, bs))

    def mb_blocks(y, u, v):
        yb = blockify(y, 8).reshape(mb_h, 2, mb_w, 2, 8, 8)
        yb = yb.transpose(0, 2, 1, 3, 4, 5).reshape(nmb, 4, 8, 8)
        ub = blockify(u, 8)[:, None]
        vb = blockify(v, 8)[:, None]
        return jnp.concatenate([yb, ub, vb], axis=1).astype(jnp.int32)

    def pred_planes(ry, ru, rv, mv):
        py = mc_hpel(ry, mbx, mby, mv[:, 0], mv[:, 1], 16)
        cmv = chroma_mv_h263(mv)
        pu = mc_hpel(ru, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
        pv = mc_hpel(rv, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
        return py, pu, pv

    def fn(cur_y, cur_u, cur_v, qscale, intra_qmat_zz, inter_qmat_zz,
           r0y, r0u, r0v, r1y, r1u, r1v):
        cy = cur_y.astype(jnp.int32)
        blocks = mb_blocks(cy, cur_u.astype(jnp.int32),
                           cur_v.astype(jnp.int32))
        cur_mbs = (cy.reshape(mb_h, 16, mb_w, 16)
                   .transpose(0, 2, 1, 3).reshape(nmb, 16, 16))
        fmv0, _ = _search_jit(mb_w, mb_h, search_range)(cur_mbs, r0y)
        mv_f, sad_f = _hpel_refine_jit(mb_w, mb_h)(cur_mbs, r0y, fmv0)
        bmv0, _ = _search_jit(mb_w, mb_h, search_range)(cur_mbs, r1y)
        mv_b, sad_b = _hpel_refine_jit(mb_w, mb_h)(cur_mbs, r1y, bmv0)

        pf = pred_planes(r0y, r0u, r0v, mv_f)
        pb_ = pred_planes(r1y, r1u, r1v, mv_b)
        bi_y = (pf[0] + pb_[0] + 1) >> 1
        sad_bi = jnp.abs(cur_mbs - bi_y).sum(axis=(1, 2))
        # small bias toward bi (it spends two MV fields)
        sel = jnp.where(sad_bi + 128 < jnp.minimum(sad_f, sad_b), 2,
                        jnp.where(sad_b < sad_f, 1, 0))
        sad = jnp.where(sel == 2, sad_bi,
                        jnp.where(sel == 1, sad_b, sad_f))

        def plane_of(k, size):
            a = pf[k]
            b = pb_[k]
            bi = (a + b + 1) >> 1
            p = jnp.where((sel == 2)[:, None, None], bi,
                          jnp.where((sel == 1)[:, None, None], b, a))
            return (p.reshape(mb_h, mb_w, size, size)
                    .transpose(0, 2, 1, 3)
                    .reshape(mb_h * size, mb_w * size))

        pred_blocks = mb_blocks(plane_of(0, 16), plane_of(1, 8),
                                plane_of(2, 8))
        resid = blocks - pred_blocks
        coeffs8 = fdct_ops.fdct8x8_int(resid.reshape(nmb * 6, 8, 8))
        czz = coeffs8.reshape(nmb * 6, 64)[:, zz]
        qs6 = jnp.repeat(qscale, 6)
        if quant_kind == "mpeg4mq":
            q = jnp.maximum(qs6[:, None] * inter_qmat_zz[None, :], 1)
            lv = jnp.sign(czz) * (jnp.abs(czz) // q)
            levels = jnp.clip(lv, -2047, 2047)
        else:
            q16 = 16 * qs6
            lv = jnp.sign(czz) * (jnp.abs(czz) // q16[:, None])
            levels = jnp.clip(lv, -255, 255)
        return (levels.reshape(nmb, 6, 64), mv_f, mv_b, sel, sad)

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def encode_jit(mb_w: int, mb_h: int, inter: bool, quant_kind: str = "mpeg1",
               search_range: int = 15, want_coeffs: bool = False,
               mbcmp: str = "sad"):
    """Device encode program: pixels (+ref) -> quantized levels (zigzag
    order), MVs (half-pel), intra decisions (reference: the device half of
    mpegvideo_enc.c encode_picture :3393 — ME, prediction, FDCT, quant).

    quant_kind 'mpeg1': qmat-weighted quant, intra DC in pixel units.
    quant_kind 'h263' (MPEG-4 quant_type=0): uniform (2q) quant, intra DC
    by DC scaler (ISO 14496-2 table 7-2).
    """
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct as fdct_ops
    from libav_tpu.ops.mc import mc_hpel, chroma_mv_div2
    from libav_tpu.ops.me import _search_jit, _hpel_refine_jit

    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    zz = zigzag_scan()
    # closure constants stay numpy (see ops/me.py note on tracer leaks)
    mbx = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    mby = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)
    luma_blk = np.tile(np.array([1, 1, 1, 1, 0, 0], dtype=bool), nmb)

    def blockify(plane, bs):
        bh, bw = plane.shape[0] // bs, plane.shape[1] // bs
        return (plane.reshape(bh, bs, bw, bs).transpose(0, 2, 1, 3)
                .reshape(bh * bw, bs, bs))

    def mb_blocks(y, u, v):
        yb = blockify(y, 8).reshape(mb_h, 2, mb_w, 2, 8, 8)
        yb = yb.transpose(0, 2, 1, 3, 4, 5).reshape(nmb, 4, 8, 8)
        ub = blockify(u, 8)[:, None]
        vb = blockify(v, 8)[:, None]
        return jnp.concatenate([yb, ub, vb], axis=1).astype(jnp.int32)

    def quantize_mpeg(coeffs8, qs6, qmat, intra_b):
        # MPEG-2 dequant carries one more fractional bit (>>4 / >>5 vs
        # MPEG-1's >>3 / >>4), so its effective divisor is halved
        q = qs6[:, None] * qmat[None, :]
        if quant_kind == "mpeg2":
            q = jnp.maximum(q // 2, 1)
        if intra_b:
            lv = jnp.sign(coeffs8) * ((jnp.abs(coeffs8) + q // 2) // q)
        else:
            lv = jnp.sign(coeffs8) * (jnp.abs(coeffs8) // q)
        lim = 255 if quant_kind == "mpeg1" else 2047
        return jnp.clip(lv, -lim, lim)

    def fn(cur_y, cur_u, cur_v, qscale, intra_qmat_zz, inter_qmat_zz,
           r0y, r0u, r0v):
        cy = cur_y.astype(jnp.int32)
        blocks = mb_blocks(cy, cur_u.astype(jnp.int32),
                           cur_v.astype(jnp.int32))

        if inter:
            cur_mbs = (cy.reshape(mb_h, 16, mb_w, 16)
                       .transpose(0, 2, 1, 3).reshape(nmb, 16, 16))
            bounded = quant_kind in ("mpeg1", "mpeg2")
            fmv, _ = _search_jit(mb_w, mb_h, search_range,
                                 bounded)(cur_mbs, r0y)
            mv, sad = _hpel_refine_jit(mb_w, mb_h, bounded)(cur_mbs, r0y,
                                                            fmv)
            mb_mean = cur_mbs.mean(axis=(1, 2), keepdims=True)
            if mbcmp == "satd":
                # Hadamard-domain decision (reference: -mbcmp satd,
                # me_cmp.c hadamard8_diff via ops/mecmp einsum kernels)
                from libav_tpu.ops.mecmp import hadamard_matrix
                h8 = jnp.asarray(hadamard_matrix(8))

                def satd16(a, b):
                    d = (a - b).astype(jnp.int32)
                    q = (d.reshape(-1, 2, 8, 2, 8)
                         .transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8))
                    t = jnp.einsum("ij,njk,lk->nil", h8, q, h8)
                    return (jnp.abs(t).sum(axis=(1, 2))
                            .reshape(-1, 4).sum(axis=1))
                pred16 = mc_hpel(r0y, mbx, mby, mv[:, 0],
                                 mv[:, 1], 16)
                intra_cost = satd16(cur_mbs, mb_mean)
                inter_cost = satd16(cur_mbs, pred16)
                use_intra = intra_cost + 256 < inter_cost
            else:
                intra_cost = jnp.abs(cur_mbs - mb_mean).sum(axis=(1, 2))
                use_intra = intra_cost.astype(jnp.int32) + 256 < sad
            pred_y = mc_hpel(r0y, mbx, mby, mv[:, 0], mv[:, 1], 16)
            cmv = chroma_mv_div2(mv)
            pred_u = mc_hpel(r0u, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
            pred_v = mc_hpel(r0v, mbx // 2, mby // 2, cmv[:, 0], cmv[:, 1], 8)
            pred_blocks = mb_blocks(
                (pred_y.reshape(mb_h, mb_w, 16, 16)
                 .transpose(0, 2, 1, 3).reshape(H, W)),
                (pred_u.reshape(mb_h, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)),
                (pred_v.reshape(mb_h, mb_w, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)))
            resid = blocks - pred_blocks
            src = jnp.where(use_intra[:, None, None, None], blocks, resid)
        else:
            mv = jnp.zeros((nmb, 2), dtype=jnp.int32)
            use_intra = jnp.ones((nmb,), dtype=bool)
            src = blocks

        coeffs8 = fdct_ops.fdct8x8_int(src.reshape(nmb * 6, 8, 8))
        czz = coeffs8.reshape(nmb * 6, 64)[:, zz]
        qs6 = jnp.repeat(qscale, 6)
        intra6 = jnp.repeat(use_intra, 6)
        dc8 = coeffs8.reshape(nmb * 6, 64)[:, 0]

        if quant_kind in ("h263", "mpeg4mq"):
            if quant_kind == "h263":
                q16 = 16 * qs6
                lv = jnp.sign(czz) * (jnp.abs(czz) // q16[:, None])
                levels = jnp.clip(lv, -255, 255)
            else:
                # MPEG-4 quant_type=1: matrix-weighted steps, same
                # >>3/>>4 fractional scale as MPEG-1 so quantize_mpeg
                # inverts the mpeg4_mq dequant pair
                lv_i = quantize_mpeg(czz, qs6, intra_qmat_zz, True)
                lv_p = quantize_mpeg(czz, qs6, inter_qmat_zz, False)
                levels = jnp.clip(
                    jnp.where(intra6[:, None], lv_i, lv_p), -2047, 2047)
            # intra DC by DC scaler (true DCT scale = coeffs8/8)
            dcs_l = jnp.where(qs6 < 5, 8, jnp.where(qs6 < 9, 2 * qs6,
                              jnp.where(qs6 < 25, qs6 + 8, 2 * qs6 - 16)))
            dcs_c = jnp.where(qs6 < 5, 8,
                              jnp.where(qs6 < 25, (qs6 + 13) // 2, qs6 - 6))
            dcs = jnp.where(luma_blk, dcs_l, dcs_c)
            qdc = 8 * dcs
            dc_lvl = jnp.sign(dc8) * ((jnp.abs(dc8) + qdc // 2) // qdc)
            levels = levels.at[:, 0].set(
                jnp.where(intra6, dc_lvl, levels[:, 0]))
        else:
            lv_i = quantize_mpeg(czz, qs6, intra_qmat_zz, True)
            lv_p = quantize_mpeg(czz, qs6, inter_qmat_zz, False)
            levels = jnp.where(intra6[:, None], lv_i, lv_p)
            dc_pix = jnp.clip((dc8 + 32) >> 6, 0, 255)
            if quant_kind == "mpeg2":
                # mpeg2 dequant passes DC through in IDCT units
                # (pixel * 8 at intra_dc_precision 0)
                dc_pix = dc_pix * 8
            levels = levels.at[:, 0].set(
                jnp.where(intra6, dc_pix, levels[:, 0]))
        if want_coeffs:
            return levels.reshape(nmb, 6, 64), mv, use_intra, \
                czz.reshape(nmb, 6, 64)
        return levels.reshape(nmb, 6, 64), mv, use_intra

    return jax.jit(fn)
