"""H.264 device reconstruction program (the 'device half' of the hwaccel
split — reference: h264_mb.c ff_h264_hl_decode_mb :798 restructured as
whole-frame batched stages).

Stages per frame:
  1. residual: dequant + 4x4 IDCT for all macroblocks at once (luma DC
     Hadamard for I_16x16, 2x2 chroma DC) — no dependencies.
  2. inter prediction: quarter-pel luma + eighth-pel chroma MC for all
     MBs at once — depends only on the reference frame.
  3. assembly: a lax.scan over anti-diagonal MB wavefronts; each step
     predicts its MBs' intra modes from already-reconstructed neighbor
     pixels, selects intra/inter, adds residual, clamps, and scatters the
     wave into the frame with one batched index update. Wave slots are
     padded to a fixed width so every step has static shapes; padded
     slots write into a scratch margin.

This replaces the reference's per-MB serial loop: the serial depth is
mb_w + mb_h - 1 wavefront steps instead of mb_w * mb_h macroblocks.
"""

from __future__ import annotations

import functools

import numpy as np

from libav_tpu.codecs.h264.cavlc import SCAN4x4

# chroma QP mapping (spec table 8-15 upper row), index by clipped qp
CHROMA_QP = np.array(
    list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                       36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39],
    dtype=np.int32)

# 4x4 luma block index -> (blkX, blkY) in 4x4 units (spec 6.4.3)
_BLK_XY = np.array([(2 * ((i >> 2) & 1) + (i & 1),
                     2 * (i >> 3) + ((i >> 1) & 1)) for i in range(16)],
                   dtype=np.int32)

from libav_tpu.ops.h264transform import _V, _pos_class  # noqa: E402


def _dequant_tables():
    """(52, 4, 4) dequant scale per qp."""
    out = np.zeros((52, 4, 4), dtype=np.int32)
    cls = _pos_class()
    for qp in range(52):
        out[qp] = _V[qp % 6][cls] << (qp // 6)
    return out


def _unpack_wmat(wmat):
    """wmat: None (flat) or hashable ((6 x 16-tuple), (2 x 64-tuple)) ->
    (W4 (6,4,4), W8 (2,8,8)) raster numpy arrays."""
    from libav_tpu.codecs.h264 import sets
    if wmat is None:
        return (np.broadcast_to(sets.FLAT_4x4.reshape(4, 4),
                                (6, 4, 4)).copy(),
                np.broadcast_to(sets.FLAT_8x8.reshape(8, 8),
                                (2, 8, 8)).copy())
    m4, m8 = wmat
    return (np.array([np.array(m, np.int32).reshape(4, 4) for m in m4]),
            np.array([np.array(m, np.int32).reshape(8, 8) for m in m8]))


@functools.lru_cache(maxsize=16)
def recon_h264_jit(mb_w: int, mb_h: int, any_intra: bool = True,
                   nrefs: int = 1, any_i4: bool = False,
                   bpred: bool = False, part: bool = False,
                   nrefs1: int = 1, weighted=None, wmat=None,
                   cqpo=(0, 0), any_t8: bool = False,
                   any_i8: bool = False, any_ipcm: bool = False,
                   any_cdy: bool = False):
    """any_intra=False compiles the fast path for all-inter frames: no
    wavefront scan (inter prediction has no intra-frame dependencies),
    just one batched assemble — the common case for P frames. nrefs>1
    compiles the multi-reference variant: ry/ru/rv arrive as (nrefs,...)
    stacks and a per-MB ref_idx input selects each MB's plane
    (reference: h264_refs.c list0 + per-MB ref_idx_l0). any_i4 compiles
    the I_4x4 variant: the MB wavefront becomes x+2y (above-right MB
    must precede, spec 6.4.9 mbAddrD) and each wavefront step runs the
    16 intra-4x4 sub-blocks in Z order against a local patch."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import h264mc, h264pred
    from libav_tpu.ops.mc import EDGE

    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    mbx_all = (np.arange(nmb) % mb_w).astype(np.int32)
    mby_all = (np.arange(nmb) // mb_w).astype(np.int32)

    # scan -> raster positions for 4x4 blocks
    pos4 = np.empty(16, dtype=np.int64)
    pos4[np.asarray(SCAN4x4)] = np.arange(16)

    dq_tab = _dequant_tables()              # (52,4,4)
    v0 = _V[:, 0]                           # for DC scaling

    # wavefront tables (x+2y when intra-4x4 needs the above-right MB)
    wave_of = (lambda x, y: x + 2 * y) if any_i4 else (lambda x, y: x + y)
    n_waves = wave_of(mb_w - 1, mb_h - 1) + 1
    waves = [[] for _ in range(n_waves)]
    for y in range(mb_h):
        for x in range(mb_w):
            waves[wave_of(x, y)].append(y * mb_w + x)
    maxw = max(len(wv) for wv in waves)
    wave_idx = np.zeros((n_waves, maxw), dtype=np.int32)
    wave_mask = np.zeros((n_waves, maxw), dtype=bool)
    for w, wv in enumerate(waves):
        for slot, i in enumerate(wv):
            wave_idx[w, slot] = i
            wave_mask[w, slot] = True

    # in-MB top-right availability of each Z-order 4x4 block (spec 6.4.9:
    # the block above-right must precede in decoding order)
    zidx = {tuple(_BLK_XY[b]): b for b in range(16)}
    tr_in_mb = np.zeros(16, bool)
    for b in range(16):
        bx4, by4 = _BLK_XY[b]
        if by4 > 0 and bx4 < 3:
            tr_in_mb[b] = zidx[(bx4 + 1, by4 - 1)] < b

    blk_x = _BLK_XY[:, 0]
    blk_y = _BLK_XY[:, 1]

    W4, W8 = _unpack_wmat(wmat)
    flat_w = wmat is None
    cls4 = _pos_class()
    v4 = _V[:, cls4]                       # (6,4,4) normAdjust4x4 per m
    from libav_tpu.ops.h264transform import _V8, _pos_class8
    v8 = _V8[:, _pos_class8()]             # (6,8,8)
    # LevelScale tables: per (list, m, pos)
    ls4_tab = (W4[:, None] * v4[None]).astype(np.int32)     # (6,6,4,4)
    ls8_tab = (W8[:, None] * v8[None]).astype(np.int32)     # (2,6,8,8)

    def _deq_ac4(c, ls, q6):
        """General 4x4 AC dequant (spec 8.5.12.1): c,ls broadcastable,
        q6 per MB (shaped for broadcast). Flat lists reduce exactly to
        the legacy (c * v) << q6."""
        up = (c * ls) << jnp.maximum(q6 - 4, 0)
        dn = (c * ls + (1 << jnp.clip(3 - q6, 0, 3))) >> \
            jnp.clip(4 - q6, 0, 4)
        return jnp.where(q6 >= 4, up, dn)

    def residual_stage(intra, intra16, qp, luma_dc, luma_ac, chroma_dc,
                       chroma_ac, t8=None):
        """-> resid_y (nmb,16,16), resid_u/v (nmb,8,8) int32"""
        qp = jnp.clip(qp.astype(jnp.int32), 0, 51)
        chroma_dc = chroma_dc.astype(jnp.int32)
        m6 = qp % 6
        q6 = qp // 6
        qpc_u = jnp.asarray(CHROMA_QP)[jnp.clip(qp + cqpo[0], 0, 51)]
        qpc_v = jnp.asarray(CHROMA_QP)[jnp.clip(qp + cqpo[1], 0, 51)]
        it = intra.astype(jnp.int32)

        # ---- luma 4x4 ----
        ac = luma_ac[:, :, pos4].reshape(nmb, 16, 4, 4).astype(jnp.int32)
        ls_y = jnp.asarray(ls4_tab)[jnp.where(it == 1, 0, 3), m6]
        ac = _deq_ac4(ac, ls_y[:, None], q6[:, None, None, None])
        # I_16x16 DC: hadamard over the (4,4) DC grid (spec 8.5.10)
        dcs = luma_dc[:, pos4].reshape(nmb, 4, 4).astype(jnp.int32)
        Hm = jnp.asarray([[1, 1, 1, 1], [1, 1, -1, -1],
                          [1, -1, -1, 1], [1, -1, 1, -1]], dtype=jnp.int32)
        f = jnp.einsum("ki,bij,lj->bkl", Hm, dcs, Hm,
                       preferred_element_type=jnp.int32)
        ls0 = jnp.asarray(ls4_tab)[0, m6, 0, 0][:, None, None]
        sh = (q6 - 6)[:, None, None]
        dc_deq = jnp.where(sh >= 0,
                           (f * ls0) << jnp.maximum(sh, 0),
                           (f * ls0 + (1 << jnp.clip(-sh - 1, 0, 5)))
                           >> jnp.clip(-sh, 0, 6))
        # place DC into block position 0 for intra16 MBs
        dc_per_block = dc_deq[:, blk_y, blk_x]     # (nmb, 16)
        ac = ac.reshape(nmb, 16, 16)
        ac = ac.at[:, :, 0].set(
            jnp.where(intra16[:, None], dc_per_block, ac[:, :, 0]))
        blocks = ac.reshape(nmb * 16, 4, 4)
        from libav_tpu.ops.h264transform import idct4x4, idct8x8_h264
        r = idct4x4(blocks).reshape(nmb, 16, 4, 4)
        resid_y = jnp.zeros((nmb, 16, 16), jnp.int32)
        for b in range(16):
            bx, by = int(blk_x[b]), int(blk_y[b])
            resid_y = resid_y.at[:, by * 4:by * 4 + 4,
                                 bx * 4:bx * 4 + 4].set(r[:, b])

        if any_t8:
            # 8x8 transform MBs: each quadrant's 64 raster coefficients
            # travel in the 4 yvals rows of its Z-order 4x4 slots
            # (blk 4b..4b+3); dequant 8.5.13 + exact idct8 8.5.12.2
            c8 = (luma_ac.reshape(nmb, 4, 64).astype(jnp.int32)
                  .reshape(nmb, 4, 8, 8))
            ls8 = jnp.asarray(ls8_tab)[jnp.where(it == 1, 0, 1), m6]
            q6b = q6[:, None, None, None]
            up = (c8 * ls8[:, None]) << jnp.maximum(q6b - 6, 0)
            dn = (c8 * ls8[:, None] +
                  (1 << jnp.clip(5 - q6b, 0, 5))) >> jnp.clip(6 - q6b,
                                                              0, 6)
            d8 = jnp.where(q6b >= 6, up, dn)
            r8 = idct8x8_h264(d8.reshape(nmb * 4, 8, 8)).reshape(
                nmb, 4, 8, 8)
            res8 = jnp.zeros((nmb, 16, 16), jnp.int32)
            for b in range(4):
                bx, by = (b & 1) * 8, (b >> 1) * 8
                res8 = res8.at[:, by:by + 8, bx:bx + 8].set(r8[:, b])
            resid_y = jnp.where(t8[:, None, None], res8, resid_y)

        # ---- chroma ----
        a = chroma_dc[:, :, 0]
        b_ = chroma_dc[:, :, 1]
        c = chroma_dc[:, :, 2]
        d = chroma_dc[:, :, 3]
        f00 = a + b_ + c + d
        f01 = a - b_ + c - d
        f10 = a + b_ - c - d
        f11 = a - b_ - c + d
        dc_c = jnp.stack([f00, f01, f10, f11], axis=-1)   # (nmb,2,4)
        outs = []
        cac = chroma_ac[:, :, pos4].reshape(nmb, 8, 4, 4).astype(jnp.int32)
        for comp, qpc in ((0, qpc_u), (1, qpc_v)):
            mc6 = qpc % 6
            qc6 = qpc // 6
            lsc = jnp.asarray(ls4_tab)[
                jnp.where(it == 1, 1 + comp, 4 + comp), mc6]
            cc = _deq_ac4(cac[:, 4 * comp:4 * comp + 4], lsc[:, None],
                          qc6[:, None, None, None]).reshape(nmb, 4, 16)
            ls0c = jnp.asarray(ls4_tab)[
                jnp.where(it == 1, 1 + comp, 4 + comp), mc6, 0, 0]
            dcd = ((dc_c[:, comp] * ls0c[:, None])
                   << qc6[:, None]) >> 5                    # spec 8.5.11
            cc = cc.at[:, :, 0].set(dcd)
            rc = idct4x4(cc.reshape(nmb * 4, 4, 4)).reshape(nmb, 4, 4, 4)
            resid_c = jnp.zeros((nmb, 8, 8), jnp.int32)
            for b in range(4):
                bx, by = b & 1, b >> 1
                resid_c = resid_c.at[:, by * 4:by * 4 + 4,
                                     bx * 4:bx * 4 + 4].set(rc[:, b])
            outs.append(resid_c)
        return resid_y, outs[0], outs[1]

    # 4x4-block lattice for partitioned frames (part=True): one MC
    # gather per 4x4 block, per list, at block-granular mv/ref
    bw4, bh4 = 4 * mb_w, 4 * mb_h
    blk_bx = (np.arange(bw4 * bh4) % bw4).astype(np.int32)
    blk_by = (np.arange(bw4 * bh4) // bw4).astype(np.int32)

    def part_mc_list(refs_y, refs_u, refs_v, bmv, bref, n):
        import jax.numpy as jnp
        from libav_tpu.ops import h264mc
        mvf = bmv.reshape(-1, 2).astype(jnp.int32)
        rix = bref.reshape(-1).astype(jnp.int32) if n > 1 else None
        py = h264mc.qpel_mc(refs_y, jnp.asarray(blk_bx * 4),
                            jnp.asarray(blk_by * 4),
                            mvf[:, 0], mvf[:, 1], 4, rix)
        pu = h264mc.chroma_mc(refs_u, jnp.asarray(blk_bx * 2),
                              jnp.asarray(blk_by * 2),
                              mvf[:, 0], mvf[:, 1], 2, rix)
        pv = h264mc.chroma_mc(refs_v, jnp.asarray(blk_bx * 2),
                              jnp.asarray(blk_by * 2),
                              mvf[:, 0], mvf[:, 1], 2, rix)
        return py, pu, pv

    def blocks_to_mb_tiles(p, s):
        """(bh4*bw4, s, s) -> (nmb, 16s/4, 16s/4) MB tiles."""
        import jax.numpy as jnp
        plane = (p.reshape(bh4, bw4, s, s).transpose(0, 2, 1, 3)
                 .reshape(bh4 * s, bw4 * s))
        t = 4 * s
        return (plane.reshape(mb_h, t, mb_w, t).transpose(0, 2, 1, 3)
                .reshape(nmb, t, t))

    def fn(intra, luma_mode, chroma_mode, mv, qp,
           luma_dc, luma_ac, chroma_dc, chroma_ac,
           ry, ru, rv, ref_idx=None, i4=None, i4_modes=None,
           mv1=None, sel=None, ry1=None, ru1=None, rv1=None,
           bmv0=None, bref0=None, bsel=None, bmv1=None, bref1=None,
           wtab0=None, wtab1=None, w0tab=None, row_top=None, t8=None,
           ipcm=None, ipcm_y=None, ipcm_u=None, ipcm_v=None,
           cdy=None):
        # multi-reference stacks arrive as tuples of planes and are
        # stacked INSIDE the program: one dispatch per frame instead of
        # one eager stack op per plane (the axon tunnel makes every
        # eager dispatch a ~ms round trip)
        if isinstance(ry, (tuple, list)):
            ry, ru, rv = jnp.stack(ry), jnp.stack(ru), jnp.stack(rv)
        if isinstance(ry1, (tuple, list)):
            ry1, ru1, rv1 = (jnp.stack(ry1), jnp.stack(ru1),
                             jnp.stack(rv1))
        intra16 = (intra & ~i4) if any_i4 else intra
        if any_t8:
            intra16 = intra16 & ~t8
        resid_y, resid_u, resid_v = residual_stage(
            intra, intra16, qp, luma_dc, luma_ac, chroma_dc, chroma_ac,
            t8=t8)

        xs = jnp.asarray(mbx_all * 16)
        ys = jnp.asarray(mby_all * 16)
        cxs = jnp.asarray(mbx_all * 8)
        cys = jnp.asarray(mby_all * 8)
        if part:
            # block-granular inter prediction (16 4x4 blocks per MB,
            # each with its own mv/ref/list selection)
            p0y, p0u, p0v = part_mc_list(ry, ru, rv, bmv0, bref0, nrefs)
            r0 = bref0.reshape(-1).astype(jnp.int32)
            if bpred:
                p1y, p1u, p1v = part_mc_list(ry1, ru1, rv1, bmv1, bref1,
                                             nrefs1)
                r1 = bref1.reshape(-1).astype(jnp.int32)
                s = bsel.reshape(-1).astype(jnp.int32)
                sy = s[:, None, None]
            if weighted is not None and weighted[0] == "e":
                # explicit weighted prediction (spec 8.4.2.3.3)
                dy_, dc_ = weighted[1], weighted[2]

                def wuni(p, w, o, d):
                    w = w[:, None, None]
                    o = o[:, None, None]
                    v = ((p * w + (1 << (d - 1))) >> d) + o if d \
                        else p * w + o
                    return jnp.clip(v, 0, 255)

                def wbi(p0, w0, o0, p1, w1, o1, d):
                    v = ((p0 * w0[:, None, None] + p1 * w1[:, None, None]
                          + (1 << d)) >> (d + 1)) + \
                        ((o0 + o1 + 1) >> 1)[:, None, None]
                    return jnp.clip(v, 0, 255)

                outs = []
                for pl, (q0, q1) in enumerate(
                        ((p0y, p1y if bpred else None),
                         (p0u, p1u if bpred else None),
                         (p0v, p1v if bpred else None))):
                    d = dy_ if pl == 0 else dc_
                    w0 = wtab0[r0, pl, 0]
                    o0 = wtab0[r0, pl, 1]
                    u0 = wuni(q0, w0, o0, d)
                    if bpred:
                        w1 = wtab1[r1, pl, 0]
                        o1 = wtab1[r1, pl, 1]
                        u1 = wuni(q1, w1, o1, d)
                        bi = wbi(q0, w0, o0, q1, w1, o1, d)
                        outs.append(jnp.where(sy == 0, u0,
                                              jnp.where(sy == 1, u1, bi)))
                    else:
                        outs.append(u0)
                p0y, p0u, p0v = outs
            elif weighted == "i" and bpred:
                # implicit bipred weights (8.4.2.3.2), logWD=5; uni-pred
                # stays unweighted
                w0 = w0tab[r0, r1][:, None, None]
                w1 = 64 - w0

                def ibi(p0, p1):
                    return jnp.clip((p0 * w0 + p1 * w1 + 32) >> 6, 0, 255)

                p0y = jnp.where(sy == 0, p0y,
                                jnp.where(sy == 1, p1y, ibi(p0y, p1y)))
                p0u = jnp.where(sy == 0, p0u,
                                jnp.where(sy == 1, p1u, ibi(p0u, p1u)))
                p0v = jnp.where(sy == 0, p0v,
                                jnp.where(sy == 1, p1v, ibi(p0v, p1v)))
            elif bpred:
                p0y = jnp.where(sy == 0, p0y,
                                jnp.where(sy == 1, p1y,
                                          (p0y + p1y + 1) >> 1))
                p0u = jnp.where(sy == 0, p0u,
                                jnp.where(sy == 1, p1u,
                                          (p0u + p1u + 1) >> 1))
                p0v = jnp.where(sy == 0, p0v,
                                jnp.where(sy == 1, p1v,
                                          (p0v + p1v + 1) >> 1))
            pred_inter_y = blocks_to_mb_tiles(p0y, 4)
            pred_inter_u = blocks_to_mb_tiles(p0u, 2)
            pred_inter_v = blocks_to_mb_tiles(p0v, 2)
        else:
            # inter prediction for all MBs
            mv32 = mv.astype(jnp.int32)
            ridx = ref_idx.astype(jnp.int32) if nrefs > 1 else None
            pred_inter_y = h264mc.qpel_mc(ry, xs, ys, mv32[:, 0],
                                          mv32[:, 1], 16, ridx)
            # PAFF cross-parity chroma offset (spec 8.4.1.4.1;
            # reference h264_mb.c mc_dir_part my += 2*(parity diff))
            cmvy = mv32[:, 1] + cdy.astype(jnp.int32) if any_cdy \
                else mv32[:, 1]
            pred_inter_u = h264mc.chroma_mc(ru, cxs, cys, mv32[:, 0],
                                            cmvy, 8, ridx)
            pred_inter_v = h264mc.chroma_mc(rv, cxs, cys, mv32[:, 0],
                                            cmvy, 8, ridx)
        if bpred and not part:
            # B slice: list-1 prediction + per-MB selection 0=L0 1=L1
            # 2=Bi (average, spec 8.4.2.3 default non-weighted)
            mv1_32 = mv1.astype(jnp.int32)
            p1y = h264mc.qpel_mc(ry1, xs, ys, mv1_32[:, 0], mv1_32[:, 1],
                                 16)
            p1u = h264mc.chroma_mc(ru1, cxs, cys, mv1_32[:, 0],
                                   mv1_32[:, 1], 8)
            p1v = h264mc.chroma_mc(rv1, cxs, cys, mv1_32[:, 0],
                                   mv1_32[:, 1], 8)
            s = sel.astype(jnp.int32)[:, None, None]
            pred_inter_y = jnp.where(
                s == 0, pred_inter_y,
                jnp.where(s == 1, p1y, (pred_inter_y + p1y + 1) >> 1))
            pred_inter_u = jnp.where(
                s == 0, pred_inter_u,
                jnp.where(s == 1, p1u, (pred_inter_u + p1u + 1) >> 1))
            pred_inter_v = jnp.where(
                s == 0, pred_inter_v,
                jnp.where(s == 1, p1v, (pred_inter_v + p1v + 1) >> 1))

        if not any_intra:
            # fast path: every MB is inter — assemble without the scan
            oy = jnp.clip(pred_inter_y + resid_y, 0, 255).astype(jnp.uint8)
            ou = jnp.clip(pred_inter_u + resid_u, 0, 255).astype(jnp.uint8)
            ov = jnp.clip(pred_inter_v + resid_v, 0, 255).astype(jnp.uint8)
            yplane = (oy.reshape(mb_h, mb_w, 16, 16)
                      .transpose(0, 2, 1, 3).reshape(H, W))
            uplane = (ou.reshape(mb_h, mb_w, 8, 8)
                      .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))
            vplane = (ov.reshape(mb_h, mb_w, 8, 8)
                      .transpose(0, 2, 1, 3).reshape(H // 2, W // 2))
            pad = lambda p: jnp.pad(p, EDGE, mode="edge")
            return (yplane, uplane, vplane), (pad(yplane), pad(uplane),
                                              pad(vplane))

        # frame buffers with 1px top/left border + 16px scratch margin
        fy = jnp.full((1 + H + 16, 1 + W + 16), 128, jnp.int32)
        fu = jnp.full((1 + H // 2 + 8, 1 + W // 2 + 8), 128, jnp.int32)
        fv = jnp.full((1 + H // 2 + 8, 1 + W // 2 + 8), 128, jnp.int32)

        widx = jnp.asarray(wave_idx)
        wmask = jnp.asarray(wave_mask)
        r16 = np.arange(16)
        r8 = np.arange(8)

        def step(carry, wave):
            fy, fu, fv = carry
            idx, mask = wave                   # (maxw,), (maxw,)
            bx = jnp.asarray(mbx_all)[idx]
            by = jnp.asarray(mby_all)[idx]
            # padded slots target the scratch margin
            bx = jnp.where(mask, bx, mb_w)
            by = jnp.where(mask, by, 0)
            y0 = by * 16 + 1
            x0 = bx * 16 + 1
            cy0 = by * 8 + 1
            cx0 = bx * 8 + 1

            # neighbors
            top = fy[y0[:, None] - 1, x0[:, None] + r16]        # (maxw,16)
            left = fy[y0[:, None] + r16, x0[:, None] - 1]
            tl = fy[y0 - 1, x0 - 1]
            # intra availability honors slice boundaries: row_top[y]
            # is False on the first MB row of each slice (spec 6.4.9;
            # slices are row-aligned here)
            at = (by > 0) if row_top is None else \
                jnp.asarray(row_top)[jnp.clip(by, 0, mb_h - 1)]
            al = bx > 0
            ctop_u = fu[cy0[:, None] - 1, cx0[:, None] + r8]
            cleft_u = fu[cy0[:, None] + r8, cx0[:, None] - 1]
            ctl_u = fu[cy0 - 1, cx0 - 1]
            ctop_v = fv[cy0[:, None] - 1, cx0[:, None] + r8]
            cleft_v = fv[cy0[:, None] + r8, cx0[:, None] - 1]
            ctl_v = fv[cy0 - 1, cx0 - 1]

            lm = luma_mode[idx]
            cm = chroma_mode[idx]
            ipred_y = h264pred.pred16x16(lm, top, left, tl, at, al)
            ipred_u = h264pred.pred8x8_chroma(cm, ctop_u, cleft_u, ctl_u,
                                              at, al)
            ipred_v = h264pred.pred8x8_chroma(cm, ctop_v, cleft_v, ctl_v,
                                              at, al)

            isin = intra[idx][:, None, None]
            py = jnp.where(isin, ipred_y, pred_inter_y[idx])
            pu = jnp.where(isin, ipred_u, pred_inter_u[idx])
            pv = jnp.where(isin, ipred_v, pred_inter_v[idx])

            oy = jnp.clip(py + resid_y[idx], 0, 255)
            ou = jnp.clip(pu + resid_u[idx], 0, 255)
            ov = jnp.clip(pv + resid_v[idx], 0, 255)

            if any_i4:
                # I_4x4: 16 sub-blocks in Z order against a local patch
                # (residual added per block — prediction reads the
                # reconstructed previous blocks, spec 8.3.1)
                tr8 = fy[y0[:, None] - 1, x0[:, None] + 16 + r8]
                patch = jnp.zeros((maxw, 17, 25), jnp.int32)
                patch = patch.at[:, 0, 0].set(tl)
                patch = patch.at[:, 0, 1:17].set(top)
                patch = patch.at[:, 0, 17:25].set(tr8)
                patch = patch.at[:, 1:17, 0].set(left)
                atr_frame = at & (bx < mb_w - 1)
                rtrue = jnp.ones((maxw,), bool)
                for b in range(16):
                    bx4, by4 = int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])
                    px0, py0 = 1 + 4 * bx4, 1 + 4 * by4
                    t4 = patch[:, py0 - 1, px0:px0 + 4]
                    l4v = patch[:, py0:py0 + 4, px0 - 1]
                    tlv = patch[:, py0 - 1, px0 - 1]
                    tr4 = patch[:, py0 - 1, px0 + 4:px0 + 8]
                    if by4 > 0:
                        tr_ok = rtrue if tr_in_mb[b] else ~rtrue
                    elif bx4 == 3:
                        tr_ok = atr_frame
                    else:
                        tr_ok = at
                    tr4 = jnp.where(tr_ok[:, None], tr4, t4[:, 3:4])
                    t8v = jnp.concatenate([t4, tr4], axis=1)
                    av_t = at if by4 == 0 else rtrue
                    av_l = al if bx4 == 0 else rtrue
                    md = i4_modes[idx, b].astype(jnp.int32)
                    p4 = h264pred.pred4x4(md, t8v, l4v, tlv, av_t, av_l)
                    blkres = resid_y[idx, 4 * by4:4 * by4 + 4,
                                     4 * bx4:4 * bx4 + 4]
                    rec = jnp.clip(p4 + blkres, 0, 255)
                    patch = patch.at[:, py0:py0 + 4, px0:px0 + 4].set(rec)
                is_i4 = i4[idx][:, None, None]
                if any_i8:
                    # I_8x8 (i4 & t8): 4 quadrants in Z order against
                    # the same patch; pred8x8_luma applies the spec
                    # 8.3.2.2.1 reference filtering internally. The i4
                    # pass above already wrote this MB's patch with
                    # garbage (its mode slots hold 8x8 modes) — each
                    # quadrant is overwritten before any later read.
                    rtrue = jnp.ones((maxw,), bool)
                    atr_q1 = at & (bx < mb_w - 1)
                    quad_av = [(at, al, at & al, at),
                               (at, rtrue, at, atr_q1),
                               (rtrue, al, al, rtrue),
                               (rtrue, rtrue, rtrue, ~rtrue)]
                    is8v = (i4 & t8)[idx]
                    for b in range(4):
                        qx, qy = (b & 1) * 8, (b >> 1) * 8
                        px0, py0 = 1 + qx, 1 + qy
                        top16 = patch[:, py0 - 1, px0:px0 + 16]
                        left8 = patch[:, py0:py0 + 8, px0 - 1]
                        tl8 = patch[:, py0 - 1, px0 - 1]
                        aq = quad_av[b]
                        md8 = i4_modes[idx, 4 * b].astype(jnp.int32)
                        p8 = h264pred.pred8x8_luma(
                            md8, top16, left8, tl8, *aq)
                        rec = jnp.clip(
                            p8 + resid_y[idx, qy:qy + 8, qx:qx + 8],
                            0, 255)
                        # only I_8x8 MBs take the 8x8 recon — same-wave
                        # I_4x4 MBs keep their already-correct patch
                        rec = jnp.where(is8v[:, None, None], rec,
                                        patch[:, py0:py0 + 8,
                                              px0:px0 + 8])
                        patch = patch.at[:, py0:py0 + 8,
                                         px0:px0 + 8].set(rec)
                    is_i8 = is8v[:, None, None]
                    oy = jnp.where(is_i8 | is_i4,
                                   patch[:, 1:17, 1:17], oy)
                else:
                    oy = jnp.where(is_i4, patch[:, 1:17, 1:17], oy)

            if any_ipcm:
                # I_PCM overlay (spec 8.3.5): the raw samples replace
                # the whole MB inside the wavefront, so later intra
                # neighbors read them from the frame buffer
                pm = ipcm[idx][:, None, None]
                oy = jnp.where(pm, ipcm_y[idx].astype(jnp.int32), oy)
                ou = jnp.where(pm, ipcm_u[idx].astype(jnp.int32), ou)
                ov = jnp.where(pm, ipcm_v[idx].astype(jnp.int32), ov)

            fy = fy.at[y0[:, None, None] + r16[None, :, None],
                       x0[:, None, None] + r16[None, None, :]].set(oy)
            fu = fu.at[cy0[:, None, None] + r8[None, :, None],
                       cx0[:, None, None] + r8[None, None, :]].set(ou)
            fv = fv.at[cy0[:, None, None] + r8[None, :, None],
                       cx0[:, None, None] + r8[None, None, :]].set(ov)
            return (fy, fu, fv), None

        (fy, fu, fv), _ = jax.lax.scan(step, (fy, fu, fv), (widx, wmask))

        yplane = fy[1:1 + H, 1:1 + W].astype(jnp.uint8)
        uplane = fu[1:1 + H // 2, 1:1 + W // 2].astype(jnp.uint8)
        vplane = fv[1:1 + H // 2, 1:1 + W // 2].astype(jnp.uint8)
        pad = lambda p: jnp.pad(p, EDGE, mode="edge")
        return (yplane, uplane, vplane), (pad(yplane), pad(uplane),
                                          pad(vplane))

    return jax.jit(fn)


def sparse_caps(mb_w: int, mb_h: int, ny: int, nc: int):
    """Pick the (ycap, ccap) bucket pair for a frame with ny coded luma
    4x4 blocks and nc coded chroma blocks.  Buckets are tied to one
    coarse level so at most 4 sparse program variants exist per frame
    geometry (compile-count bound)."""
    nmb = mb_w * mb_h
    ytot, ctot = nmb * 16, nmb * 8
    for div in (32, 8, 2):
        ycap = max(64, ytot // div)
        ccap = max(32, ctot // div)
        if ny <= ycap and nc <= ccap:
            return ycap, ccap
    return ytot, ctot


@functools.lru_cache(maxsize=64)
def recon_h264_sparse_jit(mb_w: int, mb_h: int, any_intra: bool,
                          ycap: int, ccap: int, crop=None,
                          deblock: bool = False, nrefs: int = 1,
                          db_offsets=(0, 0), any_i4: bool = False,
                          bpred: bool = False, part: bool = False,
                          nrefs1: int = 1, weighted=None, wmat=None,
                          cqpo=(0, 0), any_t8: bool = False,
                          any_i8: bool = False, any_ipcm: bool = False,
                          field: bool = False, any_cdy: bool = False,
                          any_ydc: bool = True, any_cdc: bool = True):
    """Sparse-residual variant of recon_h264_jit: the host sends only the
    coded 4x4 blocks (values + flat block indices, zero-padded to the
    bucket capacity with the index sentinel pointing at a scratch row);
    the dense coefficient tensors are scattered together on device.  At
    realistic QPs most blocks are uncoded, so this cuts the host->HBM
    upload ~5x (the transport is the bottleneck, not compute)."""
    import jax
    import jax.numpy as jnp

    nmb = mb_w * mb_h
    dense_fn = recon_h264_jit(mb_w, mb_h, any_intra, nrefs, any_i4, bpred,
                              part, nrefs1, weighted, wmat, cqpo, any_t8,
                              any_i8, any_ipcm, any_cdy)

    def fn(intra, luma_mode, chroma_mode, mv, qp, luma_dc,
           yvals, yidx, cvals, cidx, chroma_dc, ry, ru, rv, nnz=None,
           ref_idx=None, i4=None, i4_modes=None,
           mv1=None, sel=None, ry1=None, ru1=None, rv1=None,
           bmv0=None, bref0=None, bsel=None, bmv1=None, bref1=None,
           pid0=None, pid1=None, wtab0=None, wtab1=None, w0tab=None,
           row_top=None, t8=None, ipcm=None, ipcm_y=None, ipcm_u=None,
           ipcm_v=None, cdy=None):
        luma_ac = (jnp.zeros((nmb * 16 + 1, 16), jnp.int16)
                   .at[yidx].set(yvals)[:nmb * 16].reshape(nmb, 16, 16))
        chroma_ac = (jnp.zeros((nmb * 8 + 1, 16), jnp.int16)
                     .at[cidx].set(cvals)[:nmb * 8].reshape(nmb, 8, 16))
        # all-zero DC tensors are rebuilt on device instead of uploaded
        # (saves ~400KB/frame of host->HBM transfer on P/B frames)
        if not any_ydc:
            luma_dc = jnp.zeros((nmb, 16), jnp.int16)
        if not any_cdc:
            chroma_dc = jnp.zeros((nmb, 2, 4), jnp.int16)
        planes, padded = dense_fn(intra, luma_mode, chroma_mode, mv, qp,
                                  luma_dc, luma_ac, chroma_dc, chroma_ac,
                                  ry, ru, rv, ref_idx=ref_idx, i4=i4,
                                  i4_modes=i4_modes, mv1=mv1, sel=sel,
                                  ry1=ry1, ru1=ru1, rv1=rv1,
                                  bmv0=bmv0, bref0=bref0, bsel=bsel,
                                  bmv1=bmv1, bref1=bref1, wtab0=wtab0,
                                  wtab1=wtab1, w0tab=w0tab,
                                  row_top=row_top, t8=t8, ipcm=ipcm,
                                  ipcm_y=ipcm_y, ipcm_u=ipcm_u,
                                  ipcm_v=ipcm_v, cdy=cdy)
        if deblock:
            from libav_tpu.ops.h264deblock import deblock_frame_exact_jit
            from libav_tpu.ops.mc import EDGE
            db = deblock_frame_exact_jit(mb_w, mb_h, db_offsets[0],
                                         db_offsets[1], part=part,
                                         cqpo=cqpo, any_t8=any_t8,
                                         field=field)
            dbkw = {"t8": t8} if any_t8 else {}
            if part:
                yp, up, vp = db(
                    planes[0].astype(jnp.int32),
                    planes[1].astype(jnp.int32),
                    planes[2].astype(jnp.int32), intra, qp, nnz,
                    bmv0, pid0, bmv1, pid1, **dbkw)
            else:
                yp, up, vp = db(
                    planes[0].astype(jnp.int32),
                    planes[1].astype(jnp.int32),
                    planes[2].astype(jnp.int32), intra, qp, nnz, mv,
                    **dbkw)
            yp = yp.astype(jnp.uint8)
            up = up.astype(jnp.uint8)
            vp = vp.astype(jnp.uint8)
            planes = (yp, up, vp)
            pad = lambda p: jnp.pad(p, EDGE, mode="edge")
            padded = (pad(yp), pad(up), pad(vp))
        if crop is not None:
            # crop inside the program: one dispatch per frame instead of
            # recon + 3 host-side lazy slices
            cl, cr, ct, cb, W, H = crop
            planes = (planes[0][2 * ct:2 * ct + H, 2 * cl:2 * cl + W],
                      planes[1][ct:ct + (H + 1) // 2,
                                cl:cl + (W + 1) // 2],
                      planes[2][ct:ct + (H + 1) // 2,
                                cl:cl + (W + 1) // 2])
        return planes, padded

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def recon_h264_deblock_jit(mb_w: int, mb_h: int, any_intra: bool = True,
                           any_i4: bool = False, any_t8: bool = False,
                           any_i8: bool = False, any_ipcm: bool = False,
                           field: bool = False, cdy: int = 0):
    """Dense-input recon + in-loop deblocking (the encoder's closed-loop
    reference path when deblocking is enabled; the decoder uses the
    sparse variant with deblock=True)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE

    dense_fn = recon_h264_jit(mb_w, mb_h, any_intra, 1, any_i4,
                              any_t8=any_t8, any_i8=any_i8,
                              any_ipcm=any_ipcm, any_cdy=bool(cdy))

    def fn(intra, luma_mode, chroma_mode, mv, qp, luma_dc, luma_ac,
           chroma_dc, chroma_ac, nnz, ry, ru, rv, i4=None, i4_modes=None,
           t8=None, ipcm=None, ipcm_y=None, ipcm_u=None, ipcm_v=None):
        cdy_arr = (jnp.full(mb_w * mb_h, cdy, jnp.int32)
                   if cdy else None)
        planes, _ = dense_fn(intra, luma_mode, chroma_mode, mv, qp,
                             luma_dc, luma_ac, chroma_dc, chroma_ac,
                             ry, ru, rv, i4=i4, i4_modes=i4_modes, t8=t8,
                             ipcm=ipcm, ipcm_y=ipcm_y, ipcm_u=ipcm_u,
                             ipcm_v=ipcm_v, cdy=cdy_arr)
        from libav_tpu.ops.h264deblock import deblock_frame_exact_jit
        kw = {"t8": t8} if any_t8 else {}
        yp, up, vp = deblock_frame_exact_jit(mb_w, mb_h,
                                             any_t8=any_t8,
                                             field=field)(
            planes[0].astype(jnp.int32), planes[1].astype(jnp.int32),
            planes[2].astype(jnp.int32), intra, qp, nnz, mv, **kw)
        yp = yp.astype(jnp.uint8)
        up = up.astype(jnp.uint8)
        vp = vp.astype(jnp.uint8)
        pad = lambda p: jnp.pad(p, EDGE, mode="edge")
        return (yp, up, vp), (pad(yp), pad(up), pad(vp))

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def zero_refs_h264(mb_w: int, mb_h: int):
    import jax.numpy as jnp
    from libav_tpu.ops.mc import EDGE
    H, W = mb_h * 16, mb_w * 16
    y = jnp.full((H + 2 * EDGE, W + 2 * EDGE), 128, dtype=jnp.uint8)
    c = jnp.full((H // 2 + 2 * EDGE, W // 2 + 2 * EDGE), 128,
                 dtype=jnp.uint8)
    return (y, c, c)
