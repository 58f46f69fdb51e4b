"""SPS/PPS parameter sets: parse + write (reference: libavcodec/h264_ps.c;
spec ISO 14496-10 §7.3.2.1/7.3.2.2)."""

from __future__ import annotations

from dataclasses import dataclass, field

from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.bitstream import GetBits, PutBits


@dataclass
class SPS:
    profile_idc: int = 66          # baseline
    level_idc: int = 30
    sps_id: int = 0
    log2_max_frame_num: int = 8
    poc_type: int = 2
    log2_max_poc_lsb: int = 8
    max_num_ref_frames: int = 1
    mb_width: int = 0
    mb_height: int = 0
    frame_mbs_only: int = 1
    direct_8x8_inference: int = 1
    crop: tuple = (0, 0, 0, 0)     # left, right, top, bottom (in units)

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
    pic_init_qp: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present: int = 1
    num_ref_idx_l0_active: int = 1
    num_ref_idx_l1_active: int = 1
    weighted_pred: int = 0
    weighted_bipred_idc: int = 0


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
        gb.get_ue_golomb()   # bit_depth_luma_minus8
        gb.get_ue_golomb()   # bit_depth_chroma_minus8
        gb.get_bits(1)       # qpprime
        if gb.get_bits(1):   # seq_scaling_matrix_present
            raise AVError(INVALIDDATA, "scaling matrices not supported yet")
    s.log2_max_frame_num = gb.get_ue_golomb() + 4
    s.poc_type = gb.get_ue_golomb()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = gb.get_ue_golomb() + 4
    elif s.poc_type == 1:
        gb.get_bits(1)
        gb.get_se_golomb()
        gb.get_se_golomb()
        for _ in range(gb.get_ue_golomb()):
            gb.get_se_golomb()
    s.max_num_ref_frames = gb.get_ue_golomb()
    gb.get_bits(1)   # gaps_in_frame_num_allowed
    s.mb_width = gb.get_ue_golomb() + 1
    s.mb_height = gb.get_ue_golomb() + 1
    s.frame_mbs_only = gb.get_bits(1)
    if not s.frame_mbs_only:
        raise AVError(INVALIDDATA, "interlaced (MBAFF/field) not supported yet")
    s.direct_8x8_inference = gb.get_bits(1)
    if gb.get_bits(1):   # frame_cropping
        s.crop = (gb.get_ue_golomb(), gb.get_ue_golomb(),
                  gb.get_ue_golomb(), gb.get_ue_golomb())
    # vui ignored
    return s


def write_sps(s: SPS) -> bytes:
    pb = PutBits()
    pb.put_bits(8, s.profile_idc)
    pb.put_bits(8, 0x40 if s.profile_idc == 66 else 0)  # constraint_set1
    pb.put_bits(8, s.level_idc)
    pb.put_ue_golomb(s.sps_id)
    pb.put_ue_golomb(s.log2_max_frame_num - 4)
    pb.put_ue_golomb(s.poc_type)
    if s.poc_type == 0:
        pb.put_ue_golomb(s.log2_max_poc_lsb - 4)
    pb.put_ue_golomb(s.max_num_ref_frames)
    pb.put_bits(1, 0)
    pb.put_ue_golomb(s.mb_width - 1)
    pb.put_ue_golomb(s.mb_height - 1)
    pb.put_bits(1, s.frame_mbs_only)
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


def parse_pps(rbsp: bytes) -> PPS:
    """reference: h264_ps.c ff_h264_decode_picture_parameter_set"""
    gb = GetBits(rbsp)
    p = PPS()
    p.pps_id = gb.get_ue_golomb()
    p.sps_id = gb.get_ue_golomb()
    p.entropy_coding_mode = gb.get_bits(1)
    if gb.get_bits(1):   # bottom_field_pic_order
        pass
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
    return p


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
    pb.put_bits(1, 1)    # stop bit
    pb.align(0)
    return pb.flush()
