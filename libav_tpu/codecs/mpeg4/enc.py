"""MPEG-4 part 2 simple-profile encoder (reference:
libavcodec/mpeg4videoenc.c: header writer ff_mpeg4_encode_picture_header,
MB layer mpeg4_encode_mb; driver shared with mpegvideo_enc.c — SURVEY §3.3).

Device: ME + prediction + FDCT + H.263-quant via codecs/mpegvideo.encode_jit
('h263' kind) and reference reconstruction via recon_jit ('h263').
Host: VOS/VOL/VOP headers, MCBPC/CBPY, gradient DC prediction, median MV
prediction, 3D run-level VLC with ESC3 fallback.

Emits: rectangular VOL; quant_type 0 or 1 (MPEG matrices); intra AC
prediction; B-VOPs (fwd/bwd/bi + modb direct + colocated-skip
inheritance, anchor-first reordering); quarter-sample P-VOPs (fcode 2,
closed loop through the decoder's 8-tap qpel MC); GMC/sprite
warping; resync markers + data partitioning; trellis RD quantization;
adaptive quantization (masking models -> INTER_Q/INTRA_Q dquant
chains via ratecontrol.adaptive_qscale_field).
Not yet: qpel B-VOPs (rejected at open); 4MV emission (INTER4V is
decode-only — the unit tests hand-assemble such VOPs).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from libav_tpu.avutil.error import AVError, EINVAL
from libav_tpu.avutil.frame import Frame, Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.bitstream import PutBits
from libav_tpu.codecs.api import Encoder, MediaType, register_codec
from libav_tpu.codecs.mpeg4 import tables as T
from libav_tpu.codecs.mpegvideo import (encode_b_h263_jit, encode_jit,
                                        recon_jit, zero_pad_refs)
from libav_tpu.ops.quant import (alternate_horizontal_scan,
                                 alternate_scan, mpeg4_dc_scaler,
                                 zigzag_scan)
from libav_tpu.codecs.mpeg4.dec import (_ac_cell, _pred_ac, _rdiv,
                                        _store_ac)

@functools.lru_cache(maxsize=8)
def _gmc_resid_jit(mb_w: int, mb_h: int):
    """Levels for GMC MBs: src - warped prediction, FDCT, h263 inter
    quant (mirror of the inter branch of mpegvideo.encode_jit without
    ME — GMC prediction is the zero-motion warp)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct as fdct_ops
    from libav_tpu.ops.mc import EDGE
    from libav_tpu.ops.quant import zigzag_scan

    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    zz = zigzag_scan()

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

    def fn(cy, cu, cv, wy, wu, wv, qscale):
        cur = mb_blocks(cy.astype(jnp.int32), cu.astype(jnp.int32),
                        cv.astype(jnp.int32))
        pred = mb_blocks(
            wy[EDGE:EDGE + H, EDGE:EDGE + W].astype(jnp.int32),
            wu[EDGE:EDGE + H // 2, EDGE:EDGE + W // 2].astype(jnp.int32),
            wv[EDGE:EDGE + H // 2, EDGE:EDGE + W // 2].astype(jnp.int32))
        resid = cur - pred
        coeffs8 = fdct_ops.fdct8x8_int(resid.reshape(nmb * 6, 8, 8))
        czz = coeffs8.reshape(nmb * 6, 64)[:, zz]
        q16 = 16 * jnp.repeat(qscale, 6)
        lv = jnp.sign(czz) * (jnp.abs(czz) // q16[:, None])
        return jnp.clip(lv, -255, 255).reshape(nmb, 6, 64)

    return jax.jit(fn)


VOS_STARTCODE = b"\x00\x00\x01\xB0"
VISOBJ_STARTCODE = b"\x00\x00\x01\xB5"
VO_STARTCODE = b"\x00\x00\x01\x00"
VOL_STARTCODE = b"\x00\x00\x01\x20"
VOP_STARTCODE = b"\x00\x00\x01\xB6"

PICT_I, PICT_P, PICT_B, PICT_S = 0, 1, 2, 3


def encode_mv_component(pb: PutBits, delta: int, fcode: int = 1):
    """ISO 14496-2 §7.6.3 MV coding; fcode=1 => no residual bits."""
    rng = 32 << (fcode - 1)
    if delta < -rng:
        delta += 2 * rng
    elif delta >= rng:
        delta -= 2 * rng
    if fcode == 1:
        a = abs(delta)
        code, bits = T.MVTAB[a]
        pb.put_bits(bits, code)
        if a:
            pb.put_bits(1, 1 if delta < 0 else 0)
        return
    if delta == 0:
        code, bits = T.MVTAB[0]
        pb.put_bits(bits, code)
        return
    shift = fcode - 1
    a = abs(delta)
    mc = ((a - 1) >> shift) + 1
    residual = a - 1 - ((mc - 1) << shift)
    code, bits = T.MVTAB[mc]
    pb.put_bits(bits, code)
    pb.put_bits(1, 1 if delta < 0 else 0)
    pb.put_bits(shift, residual)


def encode_dc(pb: PutBits, diff: int, luma: bool):
    """Intra DC differential (14496-2 §7.4.1 tables B-13/14)."""
    size = abs(diff).bit_length()
    code, bits = (T.DC_LUM if luma else T.DC_CHROM)[size]
    pb.put_bits(bits, code)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        pb.put_bits(size, v)
        if size > 8:
            pb.put_bits(1, 1)   # marker bit


def encode_block_rl(pb: PutBits, levels: np.ndarray, start: int,
                    intra: bool):
    """3D (last, run, level) coding with ESC type-3 fallback."""
    m = T.rl_encode_map(intra)
    nz = [(k, int(levels[k])) for k in range(start, 64) if levels[k]]
    for i, (k, lvl) in enumerate(nz):
        prev_k = nz[i - 1][0] if i else start - 1
        run = k - prev_k - 1
        last = 1 if i == len(nz) - 1 else 0
        a = abs(lvl)
        key = (last, run, a)
        if key in m:
            code, bits = m[key]
            pb.put_bits(bits, code)
            pb.put_bits(1, 1 if lvl < 0 else 0)
        else:
            # ESC3: escape + '11' + last(1) run(6) marker level(12s) marker
            ec, eb = (T.INTRA_VLC if intra else T.INTER_VLC)[T.ESC_INDEX]
            pb.put_bits(eb, ec)
            pb.put_bits(2, 0b11)
            pb.put_bits(1, last)
            pb.put_bits(6, run)
            pb.put_bits(1, 1)
            pb.put_sbits(12, lvl)
            pb.put_bits(1, 1)


@register_codec
class MPEG4Encoder(Encoder):
    NAME = "mpeg4"
    TYPE = MediaType.VIDEO
    LONG_NAME = "MPEG-4 part 2 (TPU ME/DCT/quant)"

    OPTIONS = Encoder.OPTIONS + [
        Option("qscale", "fixed quantizer 1-31", "int", 6, 1, 31),
        Option("gop_size", "GOP length", "int", 12, 1, 600),
        Option("acpred", "intra AC prediction (ac_pred_flag=1: "
               "left/top AC predictors + alternate scans)", "int",
               0, 0, 1),
        Option("mpegq", "MPEG quant (VOL quant_type=1: default "
               "matrix-weighted quantisation)", "int", 0, 0, 1),
        Option("b_frames", "max B-VOPs between anchors", "int", 0, 0, 2),
        Option("bdirect", "emit direct mode (modb=1, zero delta-MV) on "
               "every Nth coded B MB (0 = off)", "int", 7, 0, 64),
        Option("qpel", "quarter-sample mode (VOL quarter_sample=1, "
               "8-tap MC; P-VOPs)", "int", 0, 0, 1),
        Option("gmc", "global motion compensation: S(GMC)-VOPs with N "
               "sprite warping points (0 = off)", "int", 0, 0, 3),
        Option("gmc_acc", "sprite_warping_accuracy (0=1/2 .. 3=1/16 "
               "pel)", "int", 3, 0, 3),
        Option("gmc_sel", "mcsel choice: 0=checkerboard of inter MBs, "
               "1=all inter MBs", "int", 0, 0, 1),
        Option("trellis", "rate-distortion optimal quantization of "
               "inter blocks (codecs/trellis.py)", "int", 0, 0, 1),
        Option("trellis_lambda", "trellis RD lambda scale x100", "int",
               25, 1, 400),
        Option("mbcmp", "macroblock decision metric: sad or satd "
               "(Hadamard einsum, ops/mecmp.py)", "string", "sad"),
        Option("ps", "video packet size in bytes: resync markers + "
               "slice-aware prediction resets (0 = off)", "int",
               0, 0, 1 << 20),
        Option("data_partitioning", "partition I/P VOPs into "
               "mcbpc+DC/MV, ac_pred+cbpy, texture with DC/motion "
               "markers", "int", 0, 0, 1),
        # adaptive quantization (reference: ratecontrol.c:703
        # adaptive_quantization; mpegvideo_enc.c:341 adaptive_quant =
        # lumi_masking || ...).  Any nonzero masking enables per-MB
        # qscale with INTER_Q/INTRA_Q dquant coding on I/P VOPs.
        Option("lumi_masking", "bright-region masking strength",
               "float", 0.0, -10.0, 10.0),
        Option("dark_masking", "dark-region masking strength",
               "float", 0.0, -10.0, 10.0),
        Option("tcplx_masking", "temporal complexity masking",
               "float", 0.0, -10.0, 10.0),
        Option("scplx_masking", "spatial complexity masking",
               "float", 0.0, -10.0, 10.0),
        Option("p_masking", "inter-MB masking", "float", 0.0,
               -10.0, 10.0),
        Option("border_masking", "frame-border masking strength",
               "float", 0.0, -10.0, 10.0),
        Option("mb_qmin", "per-MB quantizer floor", "int", 2, 1, 31),
        Option("mb_qmax", "per-MB quantizer ceiling", "int", 31, 1, 31),
    ]
    CAPABILITIES = ("delay",)

    F_CODE = 1

    def _init(self):
        if self.width <= 0 or self.height <= 0:
            raise AVError(EINVAL, "mpeg4: width/height required")
        self.mb_w = (self.width + 15) >> 4
        self.mb_h = (self.height + 15) >> 4
        if self.qpel and self.b_frames:
            raise AVError(EINVAL, "mpeg4: qpel B-VOPs not supported")
        if self.gmc and (self.qpel or self.mpegq):
            raise AVError(EINVAL, "mpeg4: gmc with qpel/mpegq not "
                          "supported by this encoder")
        self._fcode = 2 if self.qpel else 1
        self._gmc_n = 0
        self._frame_idx = 0
        self._refs = None
        self._refs_prev = None
        self._pending = []           # buffered display frames (B runs)
        self._enc_time_base = 0      # decoder's time_base mirror (secs)
        self._prev_anchor_secs = 0
        self._col_skip = None
        self._col_mv = None
        fr = self.params.framerate
        self._fr = fr if fr else Rational(25, 1)
        self._time_res = max(self._fr.num, 1)
        self._time_inc_bits = max(1, (self._time_res - 1).bit_length())
        self._dummy_q = np.ones(64, dtype=np.int32)
        if self.mpegq:
            from libav_tpu.ops.quant import zigzag_scan
            zz = np.asarray(zigzag_scan())
            self._qi = np.array(T.DEFAULT_INTRA_MATRIX,
                                np.int32)[zz]
            self._qp = np.array(T.DEFAULT_INTER_MATRIX,
                                np.int32)[zz]
        else:
            self._qi = self._qp = self._dummy_q

    # ------------------------------------------------------------------ #

    def _encode(self, frame: Frame) -> List[Packet]:
        disp = self._frame_idx
        self._frame_idx += 1
        is_i = (disp % self.gop_size) == 0 or self._refs is None
        if not is_i and self.b_frames and \
                len(self._pending) < self.b_frames and \
                (disp + 1) % self.gop_size != 0:
            self._pending.append((frame, disp))
            return []
        pkts = [self._code_anchor(frame, disp, is_i)]
        for bf, bd in self._pending:
            pkts.append(self._code_b(bf, bd))
        self._pending = []
        return pkts

    def _drain(self) -> List[Packet]:
        if not self._pending:
            return []
        last_f, last_d = self._pending[-1]
        rest = self._pending[:-1]
        self._pending = []
        pkts = [self._code_anchor(last_f, last_d, False)]
        for bf, bd in rest:
            pkts.append(self._code_b(bf, bd))
        return pkts

    @property
    def _adaptive_quant(self) -> bool:
        return bool((self.lumi_masking or self.dark_masking or
                     self.tcplx_masking or self.scplx_masking or
                     self.p_masking or self.border_masking)
                    and not self.gmc)

    def _frame_qscale(self, y: np.ndarray, is_i: bool) -> np.ndarray:
        """Per-MB qscale field.  With any masking option set, runs the
        reference's adaptive_quantization model (ratecontrol.c:703) on
        per-MB luma stats, then walks the raster clamping each step to
        +-2 so every transition is expressible as a single MPEG-4
        dquant (quant_tab {-1,-2,1,2}).  Temporal complexity is the
        zero-MV residual variance vs the reconstructed reference (a
        pre-ME proxy for the reference's post-ME mc_mb_var)."""
        nmb = self.mb_w * self.mb_h
        if not self._adaptive_quant:
            return np.full(nmb, self.qscale, dtype=np.int32)
        from libav_tpu.codecs.ratecontrol import adaptive_qscale_field
        ref_y = None
        if not is_i and self._refs is not None:
            from libav_tpu.ops.mc import EDGE
            ref_y = np.asarray(self._refs[0])[EDGE:-EDGE, EDGE:-EDGE]
        qs = adaptive_qscale_field(
            self.qscale, y, ref_y, self.mb_w, self.mb_h,
            force_intra=is_i,
            lumi_masking=self.lumi_masking,
            dark_masking=self.dark_masking,
            temporal_cplx_masking=self.tcplx_masking,
            spatial_cplx_masking=self.scplx_masking,
            p_masking=self.p_masking,
            border_masking=self.border_masking,
            qmin=self.mb_qmin, qmax=self.mb_qmax)
        cur = int(qs[0])
        for i in range(nmb):
            cur = int(min(max(int(qs[i]), cur - 2), cur + 2))
            qs[i] = cur
        return qs

    def _code_anchor(self, frame: Frame, disp: int, is_i: bool) -> Packet:
        nmb = self.mb_w * self.mb_h
        y, u, v = self._padded_input(frame)
        qscale = self._frame_qscale(y, is_i)
        kind = "mpeg4mq" if self.mpegq else "h263"
        want_tr = bool(self.trellis and not is_i and not self.mpegq)
        enc = encode_jit(self.mb_w, self.mb_h, not is_i, kind,
                         want_coeffs=want_tr, mbcmp=self.mbcmp)
        refs = self._refs if not is_i else zero_pad_refs(self.mb_w, self.mb_h)
        outs = enc(y, u, v, qscale, self._qi, self._qp, *refs)
        if want_tr:
            levels, mvs, intra, czz = outs
            czz = np.asarray(czz)
        else:
            levels, mvs, intra = outs
        levels = np.asarray(levels).astype(np.int16)
        mvs = np.asarray(mvs)
        intra = np.asarray(intra)
        if want_tr and np.any(~intra):
            from libav_tpu.codecs.trellis import trellis_inter
            sel = np.repeat(~intra, 6)
            flat = levels.reshape(-1, 64).copy()
            flat[sel] = trellis_inter(
                czz.reshape(-1, 64)[sel], flat[sel],
                np.repeat(qscale, 6)[sel],
                lam_scale=self.trellis_lambda / 100.0)
            levels = flat.reshape(nmb, 6, 64)
        if self.qpel and not is_i:
            # half-pel ME doubled to quarter-pel units; the closed loop
            # reconstructs through the SAME 8-tap qpel MC the decoder
            # uses, so prediction drift cannot accumulate
            mvs = mvs * 2

        gmc_mask = np.zeros(nmb, dtype=bool)
        traj = None
        r1 = zero_pad_refs(self.mb_w, self.mb_h)
        if self.gmc and not is_i:
            from libav_tpu.ops.gmc import (GMCParams, compute_warp_params,
                                           get_amv, warp_refs)
            n = self._gmc_n
            self._gmc_n += 1
            traj = [((2 * n) % 17 - 8, (3 * n) % 13 - 6),
                    (1 + n % 2, n % 3 - 1), (n % 3 - 1, 1)][:self.gmc]
            off, dlt, shf, rp = compute_warp_params(
                traj, self.gmc, self.gmc_acc, self.width, self.height)
            params = GMCParams(off, dlt, shf, rp, self.gmc_acc, 0)
            r1 = warp_refs(refs, params, self.mb_w, self.mb_h)
            # mcsel on a checkerboard of non-intra MBs
            gx = np.arange(nmb) % self.mb_w
            gy = np.arange(nmb) // self.mb_w
            if self.gmc_sel == 1:
                gmc_mask = (~intra)
            else:
                gmc_mask = (~intra) & (((gx + gy) & 1) == 0)
            mvs = mvs.copy()
            glevels = np.asarray(_gmc_resid_jit(self.mb_w, self.mb_h)(
                y, u, v, r1[0], r1[1], r1[2], qscale)).astype(np.int16)
            levels = levels.copy()
            levels[gmc_mask] = glevels[gmc_mask]
            # amv into the MV array (neighbors predict from it and the
            # decoder stores it for B direct)
            amv_c = {}
            for idx in np.nonzero(gmc_mask)[0]:
                key = (0, 0) if rp == 1 else (int(gx[idx]), int(gy[idx]))
                if key not in amv_c:
                    amv_c[key] = (
                        get_amv(params, 0, self._fcode, key[0], key[1], 0),
                        get_amv(params, 0, self._fcode, key[0], key[1], 1))
                mvs[idx] = amv_c[key]

        recon = recon_jit(self.mb_w, self.mb_h, kind, False, not is_i,
                          qpel=bool(self.qpel and not is_i))
        use_fwd = (~intra & ~gmc_mask) if not is_i else \
            np.zeros(nmb, dtype=bool)
        _, padded = recon(levels, qscale, intra, use_fwd,
                          gmc_mask, mvs,
                          np.zeros((nmb, 2), np.int32),
                          self._qi, self._qp,
                          *refs, *r1)
        self._refs_prev = self._refs
        self._refs = padded

        # colocated data the decoder will use for B direct/skip
        # (decoder mirror: skip inheritance + TRB/TRD direct scaling)
        if is_i:
            self._col_skip = np.zeros(nmb, bool)
            self._col_mv = np.zeros((nmb, 2), np.int32)
        else:
            cbp_any = np.any(
                levels.reshape(nmb, 6, 64) != 0, axis=(1, 2))
            self._col_skip = (~intra) & ~cbp_any & ~gmc_mask & \
                (mvs[:, 0] == 0) & (mvs[:, 1] == 0)
            self._col_mv = np.where(intra[:, None], 0, mvs)
        self._anchor_disps = (getattr(self, "_cur_anchor_disp", disp),
                              disp)
        self._cur_anchor_disp = disp

        data = self._pack(levels, mvs, intra, qscale,
                          PICT_I if is_i else
                          (PICT_S if self.gmc else PICT_P), disp,
                          traj=traj, gmc_mask=gmc_mask)
        pkt = Packet(data=data, pts=frame.pts, dts=frame.pts, duration=1,
                     flags=PKT_FLAG_KEY if is_i else 0,
                     time_base=frame.time_base)
        return pkt

    def _code_b(self, frame: Frame, disp: int) -> Packet:
        nmb = self.mb_w * self.mb_h
        qscale = np.full(nmb, self.qscale, dtype=np.int32)
        y, u, v = self._padded_input(frame)
        kind = "mpeg4mq" if self.mpegq else "h263"
        fn = encode_b_h263_jit(self.mb_w, self.mb_h, kind)
        r0 = self._refs_prev or zero_pad_refs(self.mb_w, self.mb_h)
        r1 = self._refs or zero_pad_refs(self.mb_w, self.mb_h)
        levels, mv_f, mv_b, sel, _ = fn(y, u, v, qscale, self._qi,
                                        self._qp, *r0, *r1)
        levels = np.asarray(levels).astype(np.int16)
        mv_f = np.asarray(mv_f)
        mv_b = np.asarray(mv_b)
        sel = np.asarray(sel)

        pb = PutBits()
        self._vop_header(pb, PICT_B, disp)
        self._b_layer(pb, levels, mv_f, mv_b, sel)
        self._stuff(pb)
        data = VOP_STARTCODE + pb.flush()
        return Packet(data=data, pts=frame.pts, dts=frame.pts,
                      duration=1, flags=0, time_base=frame.time_base)

    def _b_layer(self, pb, levels, mv_f, mv_b, sel):
        """B-VOP macroblock layer (decoder mirror: dec._decode_mbs_b;
        reference mpeg4videoenc.c mpeg4_encode_mb B branch)."""
        mw, mh = self.mb_w, self.mb_h
        col_skip = self._col_skip if self._col_skip is not None else \
            np.zeros(mw * mh, bool)
        ndirect = self.bdirect
        for mb_y in range(mh):
            last_mv = [[0, 0], [0, 0]]
            for mb_x in range(mw):
                idx = mb_y * mw + mb_x
                if col_skip[idx]:
                    continue             # decoder inherits the skip
                if ndirect and idx % ndirect == ndirect // 2:
                    pb.put_bits(1, 1)    # modb=1: direct, no dMV/cbp
                    continue
                mode = int(sel[idx])     # 0=fwd 1=bwd 2=bi
                lv = levels[idx]
                cbp = 0
                for b in range(6):
                    if np.any(lv[b]):
                        cbp |= 0x20 >> b
                pb.put_bits(1, 0)        # modb1
                pb.put_bits(1, 0 if cbp else 1)   # modb2
                mbt = {0: 3, 1: 2, 2: 1}[mode]
                for _ in range(mbt):
                    pb.put_bits(1, 0)
                pb.put_bits(1, 1)        # mb_type unary terminator
                if cbp:
                    pb.put_bits(6, cbp)
                    pb.put_bits(1, 0)    # dbquant: 0
                if mode in (0, 2):       # forward MV
                    mv = (int(mv_f[idx][0]), int(mv_f[idx][1]))
                    encode_mv_component(pb, mv[0] - last_mv[0][0], 1)
                    encode_mv_component(pb, mv[1] - last_mv[0][1], 1)
                    last_mv[0] = [mv[0], mv[1]]
                if mode in (1, 2):       # backward MV
                    mv = (int(mv_b[idx][0]), int(mv_b[idx][1]))
                    encode_mv_component(pb, mv[0] - last_mv[1][0], 1)
                    encode_mv_component(pb, mv[1] - last_mv[1][1], 1)
                    last_mv[1] = [mv[0], mv[1]]
                for b in range(6):
                    if cbp & (0x20 >> b):
                        encode_block_rl(pb, lv[b], 0, False)

    def _padded_input(self, frame: Frame):
        H, W = self.mb_h * 16, self.mb_w * 16
        y = np.asarray(frame.planes[0])
        u = np.asarray(frame.planes[1])
        v = np.asarray(frame.planes[2])
        y = np.pad(y, ((0, H - y.shape[0]), (0, W - y.shape[1])), mode="edge")
        u = np.pad(u, ((0, H // 2 - u.shape[0]), (0, W // 2 - u.shape[1])), mode="edge")
        v = np.pad(v, ((0, H // 2 - v.shape[0]), (0, W // 2 - v.shape[1])), mode="edge")
        return y, u, v

    # ------------------------------------------------------------------ #
    # Headers (reference: mpeg4videoenc.c mpeg4_encode_vol_header /
    # ff_mpeg4_encode_picture_header)
    # ------------------------------------------------------------------ #

    @staticmethod
    def _stuff(pb: PutBits):
        """next_start_code() stuffing (ISO 14496-2 §5.2.3): one 0 bit then
        1s to the byte boundary; a full '01111111' byte if aligned."""
        pb.put_bits(1, 0)
        pb.align(pad_bit=1)

    def _vol_headers(self) -> bytes:
        out = bytearray()
        out += VOS_STARTCODE + bytes([0x01])      # profile: simple@L1
        # visual_object: is_identifier(1)=0, type(4)=1 video, signal(1)=0
        pb2 = PutBits()
        pb2.put_bits(1, 0)
        pb2.put_bits(4, 1)      # video object type
        pb2.put_bits(1, 0)      # video_signal_type absent
        self._stuff(pb2)
        out += VISOBJ_STARTCODE + pb2.flush()
        out += VO_STARTCODE     # video_object 0
        pb = PutBits()
        pb.put_bits(1, 0)       # random_accessible_vol
        # video_object_type_indication: simple (1) / adv. simple (17)
        asp = bool(self.qpel or self.gmc)
        pb.put_bits(8, 0x11 if asp else 0x01)
        if asp:
            pb.put_bits(1, 1)   # is_object_layer_identifier
            pb.put_bits(4, 5)   # vol_ver_id
            pb.put_bits(3, 1)   # vol_priority
        else:
            pb.put_bits(1, 0)   # is_object_layer_identifier
        pb.put_bits(4, 1)       # aspect_ratio_info: 1:1
        pb.put_bits(1, 0)       # vol_control_parameters
        pb.put_bits(2, 0)       # shape: rectangular
        pb.put_bits(1, 1)       # marker
        pb.put_bits(16, self._time_res)
        pb.put_bits(1, 1)       # marker
        pb.put_bits(1, 0)       # fixed_vop_rate = 0
        pb.put_bits(1, 1)       # marker
        pb.put_bits(13, self.width)
        pb.put_bits(1, 1)       # marker
        pb.put_bits(13, self.height)
        pb.put_bits(1, 1)       # marker
        pb.put_bits(1, 0)       # interlaced
        pb.put_bits(1, 1)       # obmc_disable
        # sprite_enable: 1 bit at ver_id 1, 2 bits otherwise
        if asp:
            pb.put_bits(2, 2 if self.gmc else 0)
            if self.gmc:        # reference :1790-1813
                pb.put_bits(6, self.gmc)            # warping points
                pb.put_bits(2, self.gmc_acc)
                pb.put_bits(1, 0)                   # brightness_change
        else:
            pb.put_bits(1, 0)
        pb.put_bits(1, 0)       # not_8_bit
        pb.put_bits(1, 1 if self.mpegq else 0)   # quant_type
        if self.mpegq:
            pb.put_bits(1, 0)   # load_intra_quant_mat: defaults
            pb.put_bits(1, 0)   # load_nonintra_quant_mat: defaults
        if asp:
            pb.put_bits(1, 1 if self.qpel else 0)   # quarter_sample
        pb.put_bits(1, 1)       # complexity_estimation_disable
        pb.put_bits(1, 0 if self.ps else 1)   # resync_marker_disable
        pb.put_bits(1, 1 if self.data_partitioning else 0)
        if self.data_partitioning:
            pb.put_bits(1, 0)   # reversible_vlc
        if asp:                 # ver_id != 1 extras
            pb.put_bits(1, 0)   # newpred_enable
            pb.put_bits(1, 0)   # reduced_res_vop_enable
        pb.put_bits(1, 0)       # scalability
        self._stuff(pb)
        out += VOL_STARTCODE + pb.flush()
        return bytes(out)

    @staticmethod
    def _write_traj(pb: PutBits, traj):
        """Sprite trajectory dmv writer (inverse of get_xbits + Table
        B-30 length codes)."""
        for (x, y) in traj:
            for v in (x, y):
                ln = abs(v).bit_length()
                code, bits = T.SPRITE_TRAJ[ln]
                pb.put_bits(bits, code)
                if ln:
                    raw = v if v > 0 else v + (1 << ln) - 1
                    pb.put_bits(ln, raw)
                pb.put_bits(1, 1)   # marker
    def _vop_header(self, pb: PutBits, pict_type: int, disp: int,
                    traj=None, q0=None):
        """VOP header with the decoder's exact time bookkeeping
        (ISO 14496-2 §6.2.5: modulo_time_base counts whole seconds —
        non-B relative to time_base, B relative to last_time_base)."""
        pb.put_bits(2, pict_type)
        t_total = disp * self._fr.den
        secs = t_total // self._time_res
        tinc = t_total % self._time_res
        base = self._prev_anchor_secs if pict_type == PICT_B \
            else self._enc_time_base
        for _ in range(max(0, secs - base)):
            pb.put_bits(1, 1)
        pb.put_bits(1, 0)
        if pict_type != PICT_B:
            self._prev_anchor_secs = self._enc_time_base
            self._enc_time_base = secs
        pb.put_bits(1, 1)       # marker
        pb.put_bits(self._time_inc_bits, tinc)
        pb.put_bits(1, 1)       # marker
        pb.put_bits(1, 1)       # vop_coded
        if pict_type in (PICT_P, PICT_S):
            pb.put_bits(1, 0)   # vop_rounding_type
        pb.put_bits(3, 0)       # intra_dc_vlc_thr: always intra DC VLC
        if pict_type == PICT_S:
            self._write_traj(pb, traj)
        pb.put_bits(5, self.qscale if q0 is None else int(q0))
        if pict_type in (PICT_P, PICT_B, PICT_S):
            pb.put_bits(3, self._fcode)
        if pict_type == PICT_B:
            pb.put_bits(3, 1)   # vop_bcode

    # ------------------------------------------------------------------ #

    def _pack(self, levels, mvs, intra, qscale, pict_type,
              disp=0, traj=None, gmc_mask=None) -> bytes:
        out = bytearray()
        if pict_type == PICT_I:
            out += self._vol_headers()
        pb = PutBits()
        self._vop_header(pb, pict_type, disp, traj=traj,
                         q0=int(qscale[0]))
        self._mb_layer(pb, levels, mvs, intra, qscale, pict_type,
                       gmc_mask=gmc_mask)
        self._stuff(pb)
        return bytes(out) + VOP_STARTCODE + pb.flush()

    def _mb_layer(self, pb, levels, mvs, intra, qscale, pict_type,
                  gmc_mask=None):
        """MB layer with optional video packets (`ps`, reference:
        mpegvideo_enc.c:2762 is_gob_start + write_slice_end +
        ff_mpeg4_encode_video_packet_header) and data partitioning
        (`data_partitioning`, mpeg4videoenc.c:479 pb/pb2/tex_pb routing
        + ff_mpeg4_merge_partitions)."""
        from libav_tpu.codecs.mpeg4.dec import (DC_MARKER, MOTION_MARKER,
                                                _VopPred,
                                                _vpp_prefix_len)
        mw, mh = self.mb_w, self.mb_h
        nmb = mw * mh
        pred = _VopPred(mw, mh)
        use_acp = bool(self.acpred)
        zz = np.asarray(zigzag_scan())
        dp = bool(self.data_partitioning) and pict_type != PICT_B
        ps = int(self.ps)
        pb2 = PutBits() if dp else pb
        tex = PutBits() if dp else pb
        dc_pb = pb2 if (dp and pict_type != PICT_I) else pb
        last_gob = 0
        cur_q = int(qscale[0])      # decoder mirror of its running qs
        DQUANT_CODE = {-1: 0, -2: 1, 1: 2, 2: 3}    # dec quant_tab order

        def merge_partitions():
            nonlocal pb2, tex, dc_pb
            if not dp:
                return
            if pict_type == PICT_I:
                pb.put_bits(19, DC_MARKER)
            else:
                pb.put_bits(17, MOTION_MARKER)
            pb.copy_bits(pb2)
            pb.copy_bits(tex)
            pb2 = PutBits()
            tex = PutBits()
            dc_pb = pb2 if pict_type != PICT_I else pb

        for mb_y in range(mh):
            for mb_x in range(mw):
                idx = mb_y * mw + mb_x
                lv = levels[idx]
                is_intra = bool(intra[idx]) or pict_type == PICT_I
                mv = mvs[idx]
                q = int(qscale[idx])

                if ps and idx > 0 and \
                        ((pb.bits_written() + 7) >> 3) - last_gob >= ps:
                    # end the packet, byte-align, write the video
                    # packet header, reset predictors
                    merge_partitions()
                    self._stuff(pb)
                    last_gob = pb.bits_written() >> 3
                    pb.put_bits(_vpp_prefix_len(pict_type, self._fcode,
                                                1), 0)
                    pb.put_bits(1, 1)
                    pb.put_bits(max(1, (nmb - 1).bit_length()), idx)
                    pb.put_bits(5, q)
                    pb.put_bits(1, 0)            # no HEC
                    pred.resync(mb_x, mb_y)
                    cur_q = q       # decoder resets qs from the VP header

                acp_blocks = None
                if use_acp and is_intra:
                    # subtract the AC predictors per block and pick the
                    # per-block alternate scan (mirrors dec._pred_ac);
                    # cbp is computed from the RESIDUAL coefficients
                    acp_blocks = self._acpred_blocks(
                        lv, mb_x, mb_y, q, qscale, pred, zz)

                cbp = 0
                for b in range(6):
                    start = 1 if is_intra else 0
                    coeffs = acp_blocks[b][0][start:] \
                        if acp_blocks is not None else lv[b][start:]
                    if np.any(coeffs):
                        cbp |= 0x20 >> b
                cbpc = cbp & 3
                cbpy = cbp >> 2

                dq = q - cur_q      # +-2 by the _frame_qscale walk
                if pict_type in (PICT_P, PICT_S):
                    is_gmc = gmc_mask is not None and bool(gmc_mask[idx])
                    if pict_type == PICT_S:
                        # not_coded in an S-VOP decodes as a GMC skip,
                        # so only GMC MBs without residual may use it
                        not_coded = is_gmc and cbp == 0
                    else:
                        # a q transition needs a coded MB to carry the
                        # dquant, so those MBs are never skipped
                        not_coded = (not is_intra and cbp == 0
                                     and mv[0] == 0 and mv[1] == 0
                                     and dq == 0)
                    if not_coded:
                        pb.put_bits(1, 1)   # not_coded = skip
                        for k in range(4):
                            pred.grid_put(mb_x, mb_y, k, int(mv[0]),
                                          int(mv[1]))
                        continue
                    pb.put_bits(1, 0)
                    if is_intra:
                        group = T.MBT_INTRAQ if dq else T.MBT_INTRA
                    else:
                        group = T.MBT_INTERQ if dq else T.MBT_INTER
                    i = group * 4 + cbpc
                    pb.put_bits(T.INTER_MCBPC_BITS[i], T.INTER_MCBPC_CODE[i])
                else:
                    i = cbpc + (4 if dq else 0)     # intra(+q) group
                    pb.put_bits(T.INTRA_MCBPC[1][i], T.INTRA_MCBPC[0][i])
                    if dq and dp:
                        # DP I-VOP partition A: dquant follows mcbpc
                        # (dec._decode_partitions I branch)
                        pb.put_bits(2, DQUANT_CODE[dq])

                if is_intra:
                    pb2.put_bits(1, 1 if acp_blocks is not None else 0)
                    code, bits = T.CBPY[cbpy]
                    pb2.put_bits(bits, code)
                    if dq and not (dp and pict_type == PICT_I):
                        pb2.put_bits(2, DQUANT_CODE[dq])
                    for k in range(4):
                        pred.grid_put(mb_x, mb_y, k, 0, 0)
                else:
                    if pict_type == PICT_S:
                        pb.put_bits(1, 1 if is_gmc else 0)   # mcsel
                    code, bits = T.CBPY[15 - cbpy]
                    pb2.put_bits(bits, code)
                    if dq:
                        pb2.put_bits(2, DQUANT_CODE[dq])
                    if not (pict_type == PICT_S and is_gmc):
                        # motion vector, median predicted
                        px, py = pred.grid_pred(mb_x, mb_y, 0)
                        encode_mv_component(pb, int(mv[0]) - px,
                                            self._fcode)
                        encode_mv_component(pb, int(mv[1]) - py,
                                            self._fcode)
                    for k in range(4):
                        pred.grid_put(mb_x, mb_y, k, int(mv[0]),
                                      int(mv[1]))

                cur_q = q

                for b in range(6):
                    coded = bool(cbp & (0x20 >> b))
                    if is_intra:
                        luma = b < 4
                        dcs = mpeg4_dc_scaler(q, luma)
                        lvl_dc = int(lv[b][0])
                        if acp_blocks is not None:
                            # DC ctx consumed + stored by _acpred_blocks
                            pred_lvl = acp_blocks[b][1]
                            encode_dc(dc_pb, lvl_dc - int(pred_lvl),
                                      luma)
                        else:
                            p, store, _dir = pred.dc_ctx(b, mb_x, mb_y)
                            pred_lvl = (p + dcs // 2) // dcs
                            encode_dc(dc_pb, lvl_dc - int(pred_lvl),
                                      luma)
                            store(lvl_dc * dcs)
                        if coded:
                            encode_block_rl(
                                tex, acp_blocks[b][0] if acp_blocks
                                is not None else lv[b], 1, True)
                    elif coded:
                        encode_block_rl(tex, lv[b], 0, False)
        merge_partitions()

    def _acpred_blocks(self, lv, mb_x, mb_y, q, qscale, pred_st, zz):
        """Per-block (scanned residual levels, (dc_pred_lvl, dc_store)):
        the encode mirror of dec._pred_ac — subtract the stored
        neighbor column/row, rescan with the direction's alternate
        scan, store this block's own final values.  Uses the shared
        slice-aware _VopPred state (video packet boundaries mask the
        out-of-slice DC candidates and zero the cleaned AC cells)."""
        out = []
        qs_tab = qscale
        acv = pred_st.acv
        for b in range(6):
            luma = b < 4
            dcs = mpeg4_dc_scaler(q, luma)
            # DC direction decides predictor source and scan
            p, store, dc_dir = pred_st.dc_ctx(b, mb_x, mb_y)
            pred_lvl = (p + dcs // 2) // dcs
            # store NOW: blocks later in this MB predict from it
            store(int(lv[b][0]) * dcs)

            raster = np.zeros(64, np.int64)
            raster[zz] = lv[b]
            resid = raster.copy()
            g_, bx_, by_ = _ac_cell(b, mb_x, mb_y)
            if dc_dir == 0:
                vals = acv[g_][by_, bx_ - 1, 0:7]
                nq_i = mb_y * self.mb_w + mb_x - 1
                same = (mb_x == 0 or b in (1, 3) or
                        int(qs_tab[nq_i]) == q)
                if same:
                    resid[8::8] -= vals
                else:
                    nq = int(qs_tab[nq_i])
                    for i in range(7):
                        resid[8 * (i + 1)] -= _rdiv(int(vals[i]) * nq, q)
                scan = np.asarray(alternate_scan())
            else:
                vals = acv[g_][by_ - 1, bx_, 7:14]
                nq_i = (mb_y - 1) * self.mb_w + mb_x
                same = (mb_y == 0 or b in (2, 3) or
                        int(qs_tab[nq_i]) == q)
                if same:
                    resid[1:8] -= vals
                else:
                    nq = int(qs_tab[nq_i])
                    for i in range(7):
                        resid[i + 1] -= _rdiv(int(vals[i]) * nq, q)
                scan = np.asarray(alternate_horizontal_scan())
            # this block's own (unsubtracted) column/row, for later
            # neighbors — stored after the prediction read above
            _store_ac(raster, b, mb_x, mb_y, acv)
            scanned = resid[scan]
            out.append((scanned, pred_lvl))
        return out

    @staticmethod
    def _dc_ctx(dc_y, dc_u, dc_v, b, mb_x, mb_y):
        """Gradient DC prediction (ISO 14496-2 §7.4.3.2): pick A (left) or
        C (above) based on |A-B| vs |B-C| with B = above-left. Grids are
        +1-offset so index 0 is the out-of-bound column/row (=1024)."""
        if b < 4:
            bx = 2 * mb_x + (b & 1) + 1
            by = 2 * mb_y + (b >> 1) + 1
            grid = dc_y
        else:
            bx, by = mb_x + 1, mb_y + 1
            grid = dc_u if b == 4 else dc_v
        A = grid[by, bx - 1]
        B = grid[by - 1, bx - 1]
        C = grid[by - 1, bx]
        pred = C if abs(A - B) < abs(B - C) else A

        def store(val):
            grid[by, bx] = val
        return pred, store

    def _mv_pred(self, mvs, intra, mb_x, mb_y, pict_type):
        """Median MV prediction (ISO 14496-2 §7.6.5; H.263 style)."""
        mw = self.mb_w

        def cand(x, y):
            if x < 0 or y < 0 or x >= mw:
                return None
            i = y * mw + x
            if intra[i]:
                return (0, 0)
            return (int(mvs[i][0]), int(mvs[i][1]))

        A = cand(mb_x - 1, mb_y)
        B = cand(mb_x, mb_y - 1)
        C = cand(mb_x + 1, mb_y - 1)
        if B is None and C is None:
            # top row: predictor is A (or 0)
            return A if A is not None else (0, 0)
        A = A or (0, 0)
        B = B or (0, 0)
        C = C or (0, 0)
        px = int(np.median([A[0], B[0], C[0]]))
        py = int(np.median([A[1], B[1], C[1]]))
        return px, py
