"""SPS/PPS parameter sets: parse + write (reference: libavcodec/h264_ps.c;
spec ISO 14496-10 §7.3.2.1/7.3.2.2), including High-profile scaling
lists (7.3.2.1.1 scaling_list + Table 7-2 fall-back rules) and the PPS
tail (transform_8x8_mode_flag, pic scaling matrix,
second_chroma_qp_index_offset)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.bitstream import GetBits, PutBits

# zigzag scans used by scaling_list() transmission (spec 8.5.6/8.5.5):
# 4x4 from cavlc.SCAN4x4; 8x8 is the classic zigzag (ff_zigzag_direct)
SCAN4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                 dtype=np.int32)
SCAN8 = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# default scaling lists, raster order (spec Tables 7-3/7-4; the same ISO
# constants appear in reference h264_ps.c default_scaling4/8)
DEFAULT_4x4 = (
    np.array([6, 13, 20, 28, 13, 20, 28, 32,
              20, 28, 32, 37, 28, 32, 37, 42], np.int32),       # intra
    np.array([10, 14, 20, 24, 14, 20, 24, 27,
              20, 24, 27, 30, 24, 27, 30, 34], np.int32))       # inter
DEFAULT_8x8 = (
    np.array([6, 10, 13, 16, 18, 23, 25, 27,
              10, 11, 16, 18, 23, 25, 27, 29,
              13, 16, 18, 23, 25, 27, 29, 31,
              16, 18, 23, 25, 27, 29, 31, 33,
              18, 23, 25, 27, 29, 31, 33, 36,
              23, 25, 27, 29, 31, 33, 36, 38,
              25, 27, 29, 31, 33, 36, 38, 40,
              27, 29, 31, 33, 36, 38, 40, 42], np.int32),       # intra
    np.array([9, 13, 15, 17, 19, 21, 22, 24,
              13, 13, 17, 19, 21, 22, 24, 25,
              15, 17, 19, 21, 22, 24, 25, 27,
              17, 19, 21, 22, 24, 25, 27, 28,
              19, 21, 22, 24, 25, 27, 28, 30,
              21, 22, 24, 25, 27, 28, 30, 32,
              22, 24, 25, 27, 28, 30, 32, 33,
              24, 25, 27, 28, 30, 32, 33, 35], np.int32))       # inter

FLAT_4x4 = np.full(16, 16, np.int32)
FLAT_8x8 = np.full(64, 16, np.int32)


def _parse_scaling_list(gb: GetBits, size: int):
    """One scaling_list() (spec 7.3.2.1.1). Returns the raster-order
    list, or None when the stream selects the default (first delta makes
    nextScale 0)."""
    scan = SCAN4 if size == 16 else SCAN8
    out = np.zeros(size, np.int32)
    last, nxt = 8, 8
    for j in range(size):
        if nxt != 0:
            delta = gb.get_se_golomb()
            nxt = (last + delta + 256) % 256
            if j == 0 and nxt == 0:
                return None          # use default list
        last = nxt if nxt != 0 else last
        out[int(scan[j])] = last
    return out


def _parse_scaling_matrices(gb: GetBits, is_sps: bool, sps_m4, sps_m8,
                            n8: int):
    """scaling matrix block shared by SPS/PPS (Table 7-2 fall-back):
    6 4x4 lists + n8 8x8 lists. sps_m4/sps_m8 are the active SPS lists
    for PPS fall-back rule B (None at seq level)."""
    m4 = [None] * 6
    m8 = [None] * 6
    for i in range(6):
        if gb.get_bits(1):
            m4[i] = _parse_scaling_list(gb, 16)
            if m4[i] is None:
                m4[i] = DEFAULT_4x4[0 if i < 3 else 1].copy()
        else:                       # fall-back
            if i in (0, 3):
                m4[i] = (DEFAULT_4x4[0 if i == 0 else 1].copy()
                         if is_sps or sps_m4 is None
                         else sps_m4[i].copy())
            else:
                m4[i] = m4[i - 1].copy()
    for k in range(n8):
        # transmitted order: 8x8 intra Y (idx 0), inter Y (idx 1)
        if gb.get_bits(1):
            m8[k] = _parse_scaling_list(gb, 64)
            if m8[k] is None:
                m8[k] = DEFAULT_8x8[k & 1].copy()
        else:
            m8[k] = (DEFAULT_8x8[k & 1].copy()
                     if is_sps or sps_m8 is None
                     else sps_m8[k].copy())
    return m4, m8


@dataclass
class SPS:
    profile_idc: int = 66          # baseline
    level_idc: int = 30
    sps_id: int = 0
    log2_max_frame_num: int = 8
    poc_type: int = 2
    log2_max_poc_lsb: int = 8
    # poc_type 1 parameters (spec 7.4.2.1 / 8.2.1.2)
    delta_pic_order_always_zero: int = 0
    offset_for_non_ref_pic: int = 0
    offset_for_top_to_bottom: int = 0
    offset_for_ref_frame: tuple = ()
    max_num_ref_frames: int = 1
    gaps_allowed: int = 0          # gaps_in_frame_num_value_allowed
    mb_width: int = 0
    mb_height: int = 0
    frame_mbs_only: int = 1
    mb_aff: int = 0
    direct_8x8_inference: int = 1
    crop: tuple = (0, 0, 0, 0)     # left, right, top, bottom (in units)
    scaling_m4: object = None      # [6] raster 4x4 lists or None (flat)
    scaling_m8: object = None      # [2] raster 8x8 lists or None (flat)

    @property
    def width(self):
        return self.mb_width * 16 - 2 * (self.crop[0] + self.crop[1])

    @property
    def height(self):
        return self.mb_height * 16 - 2 * (self.crop[2] + self.crop[3])


@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    entropy_coding_mode: int = 0   # 0 = CAVLC
    pic_order_present: int = 0     # bottom_field_pic_order_in_frame
    pic_init_qp: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present: int = 1
    num_ref_idx_l0_active: int = 1
    num_ref_idx_l1_active: int = 1
    weighted_pred: int = 0
    weighted_bipred_idc: int = 0
    transform_8x8_mode: int = 0
    scaling_m4: object = None      # PPS-level lists override SPS-level
    scaling_m8: object = None
    second_chroma_qp_index_offset: int = None   # defaults to the first


def parse_sps(rbsp: bytes) -> SPS:
    """reference: h264_ps.c ff_h264_decode_seq_parameter_set"""
    gb = GetBits(rbsp)
    s = SPS()
    s.profile_idc = gb.get_bits(8)
    gb.get_bits(8)   # constraint flags + reserved
    s.level_idc = gb.get_bits(8)
    s.sps_id = gb.get_ue_golomb()
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = gb.get_ue_golomb()
        if chroma == 3:
            gb.get_bits(1)
        if chroma != 1:
            raise AVError(INVALIDDATA, "only 4:2:0 supported")
        if gb.get_ue_golomb() or gb.get_ue_golomb():
            raise AVError(INVALIDDATA, "only 8-bit supported")
        gb.get_bits(1)       # qpprime
        if gb.get_bits(1):   # seq_scaling_matrix_present
            s.scaling_m4, s.scaling_m8 = _parse_scaling_matrices(
                gb, True, None, None, 2)
    s.log2_max_frame_num = gb.get_ue_golomb() + 4
    s.poc_type = gb.get_ue_golomb()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = gb.get_ue_golomb() + 4
    elif s.poc_type == 1:
        s.delta_pic_order_always_zero = gb.get_bits(1)
        s.offset_for_non_ref_pic = gb.get_se_golomb()
        s.offset_for_top_to_bottom = gb.get_se_golomb()
        s.offset_for_ref_frame = tuple(
            gb.get_se_golomb() for _ in range(gb.get_ue_golomb()))
    s.max_num_ref_frames = gb.get_ue_golomb()
    s.gaps_allowed = gb.get_bits(1)
    s.mb_width = gb.get_ue_golomb() + 1
    s.mb_height = gb.get_ue_golomb() + 1
    s.frame_mbs_only = gb.get_bits(1)
    if not s.frame_mbs_only:
        # pic_height_in_map_units counts MB PAIRS: frame height doubles
        # (spec 7.4.2.1.1; reference h264_ps.c FrameHeightInMbs)
        s.mb_height *= 2
        s.mb_aff = gb.get_bits(1)   # mb_adaptive_frame_field_flag
    s.direct_8x8_inference = gb.get_bits(1)
    if gb.get_bits(1):   # frame_cropping
        s.crop = (gb.get_ue_golomb(), gb.get_ue_golomb(),
                  gb.get_ue_golomb(), gb.get_ue_golomb())
    # vui ignored
    return s


def _write_scaling_list(pb: PutBits, lst, size: int):
    """Delta-code one raster-order list in scan order (7.3.2.1.1)."""
    scan = SCAN4 if size == 16 else SCAN8
    last = 8
    for j in range(size):
        cur = int(lst[int(scan[j])])
        delta = (cur - last) & 0xFF
        if delta >= 128:
            delta -= 256
        pb.put_se_golomb(delta)
        last = cur


def write_sps(s: SPS) -> bytes:
    pb = PutBits()
    pb.put_bits(8, s.profile_idc)
    pb.put_bits(8, 0x40 if s.profile_idc == 66 else 0)  # constraint_set1
    pb.put_bits(8, s.level_idc)
    pb.put_ue_golomb(s.sps_id)
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        pb.put_ue_golomb(1)           # chroma_format_idc 4:2:0
        pb.put_ue_golomb(0)           # bit_depth_luma_minus8
        pb.put_ue_golomb(0)           # bit_depth_chroma_minus8
        pb.put_bits(1, 0)             # qpprime_y_zero_transform_bypass
        has_m = s.scaling_m4 is not None or s.scaling_m8 is not None
        pb.put_bits(1, 1 if has_m else 0)
        if has_m:
            m4 = s.scaling_m4 or [FLAT_4x4] * 6
            m8 = s.scaling_m8 or [FLAT_8x8, FLAT_8x8]
            for i in range(6):
                pb.put_bits(1, 1)
                _write_scaling_list(pb, m4[i], 16)
            for k in range(2):
                pb.put_bits(1, 1)
                _write_scaling_list(pb, m8[k], 64)
    pb.put_ue_golomb(s.log2_max_frame_num - 4)
    pb.put_ue_golomb(s.poc_type)
    if s.poc_type == 0:
        pb.put_ue_golomb(s.log2_max_poc_lsb - 4)
    elif s.poc_type == 1:
        pb.put_bits(1, s.delta_pic_order_always_zero)
        pb.put_se_golomb(s.offset_for_non_ref_pic)
        pb.put_se_golomb(s.offset_for_top_to_bottom)
        pb.put_ue_golomb(len(s.offset_for_ref_frame))
        for o in s.offset_for_ref_frame:
            pb.put_se_golomb(o)
    pb.put_ue_golomb(s.max_num_ref_frames)
    pb.put_bits(1, s.gaps_allowed)
    pb.put_ue_golomb(s.mb_width - 1)
    pb.put_ue_golomb((s.mb_height // (1 if s.frame_mbs_only else 2)) - 1)
    pb.put_bits(1, s.frame_mbs_only)
    if not s.frame_mbs_only:
        pb.put_bits(1, s.mb_aff)   # mb_adaptive_frame_field_flag
    pb.put_bits(1, s.direct_8x8_inference)
    has_crop = any(s.crop)
    pb.put_bits(1, 1 if has_crop else 0)
    if has_crop:
        for c in s.crop:
            pb.put_ue_golomb(c)
    pb.put_bits(1, 0)    # vui_parameters_present
    pb.put_bits(1, 1)    # rbsp stop bit
    pb.align(0)
    return pb.flush()


def parse_pps(rbsp: bytes, sps_map=None) -> PPS:
    """reference: h264_ps.c ff_h264_decode_picture_parameter_set.
    sps_map (id -> SPS) supplies the active SPS scaling lists for the
    pic-level fall-back rule B (Table 7-2)."""
    gb = GetBits(rbsp)
    p = PPS()
    p.pps_id = gb.get_ue_golomb()
    p.sps_id = gb.get_ue_golomb()
    p.entropy_coding_mode = gb.get_bits(1)
    p.pic_order_present = gb.get_bits(1)
    n_slice_groups = gb.get_ue_golomb() + 1
    if n_slice_groups > 1:
        raise AVError(INVALIDDATA, "FMO not supported")
    p.num_ref_idx_l0_active = gb.get_ue_golomb() + 1
    p.num_ref_idx_l1_active = gb.get_ue_golomb() + 1
    p.weighted_pred = gb.get_bits(1)
    p.weighted_bipred_idc = gb.get_bits(2)
    p.pic_init_qp = gb.get_se_golomb() + 26
    gb.get_se_golomb()   # pic_init_qs
    p.chroma_qp_index_offset = gb.get_se_golomb()
    p.deblocking_filter_control_present = gb.get_bits(1)
    gb.get_bits(1)       # constrained_intra_pred
    gb.get_bits(1)       # redundant_pic_cnt_present
    if _more_rbsp_data(gb, rbsp):      # High-profile PPS tail (7.3.2.2)
        sps = (sps_map or {}).get(p.sps_id)
        p.transform_8x8_mode = gb.get_bits(1)
        if gb.get_bits(1):             # pic_scaling_matrix_present
            p.scaling_m4, p.scaling_m8 = _parse_scaling_matrices(
                gb, False,
                sps.scaling_m4 if sps is not None else None,
                sps.scaling_m8 if sps is not None else None,
                2 * p.transform_8x8_mode)
        p.second_chroma_qp_index_offset = gb.get_se_golomb()
    return p


def _more_rbsp_data(gb: GetBits, rbsp: bytes) -> bool:
    """True while bits remain before the rbsp_stop_one_bit (spec 7.2)."""
    i = len(rbsp) - 1
    while i >= 0 and rbsp[i] == 0:
        i -= 1
    if i < 0:
        return False
    b = rbsp[i]
    low = (b & -b).bit_length() - 1          # lowest set bit
    stop_pos = i * 8 + (7 - low)
    return gb.pos < stop_pos


def effective_matrices(sps: SPS, pps: PPS):
    """The weight matrices in effect (PPS-level overrides SPS-level,
    flat-16 otherwise): (W4[6 raster16], W8[2 raster64])."""
    m4 = pps.scaling_m4 if pps.scaling_m4 is not None else sps.scaling_m4
    m8 = pps.scaling_m8 if pps.scaling_m8 is not None else sps.scaling_m8
    if m4 is None:
        m4 = [FLAT_4x4] * 6
    if m8 is None or m8[0] is None:
        m8 = [FLAT_8x8, FLAT_8x8]
    return list(m4[:6]), [m8[0], m8[1]]


def write_pps(p: PPS) -> bytes:
    pb = PutBits()
    pb.put_ue_golomb(p.pps_id)
    pb.put_ue_golomb(p.sps_id)
    pb.put_bits(1, p.entropy_coding_mode)
    pb.put_bits(1, 0)
    pb.put_ue_golomb(0)  # one slice group
    pb.put_ue_golomb(p.num_ref_idx_l0_active - 1)
    pb.put_ue_golomb(p.num_ref_idx_l1_active - 1)
    pb.put_bits(1, p.weighted_pred)
    pb.put_bits(2, p.weighted_bipred_idc)
    pb.put_se_golomb(p.pic_init_qp - 26)
    pb.put_se_golomb(0)
    pb.put_se_golomb(p.chroma_qp_index_offset)
    pb.put_bits(1, p.deblocking_filter_control_present)
    pb.put_bits(1, 0)
    pb.put_bits(1, 0)
    if p.transform_8x8_mode or p.scaling_m4 is not None or \
            p.second_chroma_qp_index_offset is not None:
        pb.put_bits(1, p.transform_8x8_mode)
        has_m = p.scaling_m4 is not None
        pb.put_bits(1, 1 if has_m else 0)
        if has_m:
            for i in range(6):
                pb.put_bits(1, 1)
                _write_scaling_list(pb, p.scaling_m4[i], 16)
            for k in range(2 * p.transform_8x8_mode):
                pb.put_bits(1, 1)
                _write_scaling_list(pb, p.scaling_m8[k], 64)
        pb.put_se_golomb(p.second_chroma_qp_index_offset
                         if p.second_chroma_qp_index_offset is not None
                         else p.chroma_qp_index_offset)
    pb.put_bits(1, 1)    # stop bit
    pb.align(0)
    return pb.flush()
