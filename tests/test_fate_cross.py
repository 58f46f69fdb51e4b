"""Cross-validation FATE tier (VERDICT r1 task 3; reference:
tests/fate-run.sh:131-155 enc_dec): validates our decoders and encoders
against the BUILT reference binaries, in both directions.

decode direction:  reference-encode synthetic source -> our decode vs
                   reference decode, framecrc pixel-identical.
encode direction:  our encode -> reference decode vs our decode,
                   framecrc pixel-identical (proves our bitstreams are
                   conformant AND our decode of them is honest).
audio:             PCM compare with an LSB tolerance (float pipeline).

Timestamp columns are compared for container inputs; raw-ES inputs
compare stream/size/CRC only (raw elementary streams get timestamps
from the reference's parser pts inference — tracked as the demux-core
parity work item).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fate_util import (BITEXACT, REF_AVCONV, crc_column, have_reference,
                       our_framecrc, ref_framecrc, ref_run, write_y4m,
                       write_wav48)

pytestmark = pytest.mark.skipif(
    not have_reference(),
    reason="reference not built: cd .refbuild && "
           "/root/reference/configure --disable-asm --disable-doc "
           "--disable-avdevice --enable-gpl && make avconv")


@pytest.fixture(scope="module")
def y4m(tmp_path_factory):
    p = tmp_path_factory.mktemp("fate") / "src.y4m"
    write_y4m(str(p), w=192, h=160, n=6)
    return str(p)


@pytest.fixture(scope="module")
def wav48(tmp_path_factory):
    p = tmp_path_factory.mktemp("fate") / "t48.wav"
    write_wav48(str(p), seconds=0.5, transient=True)
    return str(p)


class TestDecodeParity:
    """reference-encode -> decode both -> identical framecrc pixels."""

    @pytest.mark.parametrize("codec,ext,args", [
        ("mjpeg", "avi", ["-q:v", "5"]),
        ("mpeg1video", "m1v", ["-g", "4", "-q:v", "5"]),
        ("mpeg2video", "m2v", ["-g", "4", "-q:v", "5"]),
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "5"]),
        # MPEG-4 ASP quarter-sample mode (qpeldsp 8-tap chain)
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "5", "-flags",
                          "+bitexact+qpel"]),
        # MPEG-4 B-VOPs: direct (TRB/TRD-scaled colocated MVs),
        # forward/backward/interpolated modes, col-skip inheritance
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2", "-q:v", "5"]),
        # MPEG-4 4MV (INTER4V): block-granular MV prediction grid,
        # 8x8-tiled MC, 4MV chroma rounding; direct inherits per-block
        # colocated vectors; combined with qpel and B-VOPs
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "5", "-flags",
                          "+bitexact+mv4"]),
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2", "-q:v", "5", "-flags",
                          "+bitexact+mv4"]),
        ("mpeg4", "m4v", ["-g", "6", "-bf", "1", "-q:v", "5", "-flags",
                          "+bitexact+mv4+qpel"]),
        # MPEG-4 qpel B-VOPs (direct mode runs as four 8x8 qpel blocks
        # with 8-wide reflection + 4MV chroma rounding)
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2", "-q:v", "5", "-flags",
                          "+bitexact+qpel"]),
        # MPEG-4 AC prediction (mbd=rd makes the reference encoder set
        # ac_pred adaptively: alternate scans + predictor rescale)
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "5", "-mbd", "rd"]),
        # MPEG-4 adaptive quant from the reference encoder (dquant
        # only engages under rate control: ratecontrol.c:975 runs
        # adaptive_quantization inside ff_rate_estimate_qscale) —
        # verified to emit INTER_Q/INTRA_Q dquant chains on this
        # source; the 4MV combination also checks the reference's
        # dquant-suppression-on-8x8 rule round-trips
        # (mpegvideo_enc.c:2040 mv_type==MV_TYPE_8X8 -> dquant=0)
        ("mpeg4", "m4v", ["-g", "4", "-b:v", "400k", "-lumi_mask",
                          "0.5", "-dark_mask", "0.3"]),
        ("mpeg4", "m4v", ["-g", "4", "-b:v", "400k", "-flags",
                          "+bitexact+mv4", "-lumi_mask", "0.5",
                          "-scplx_mask", "0.4"]),
        # MPEG-4 MPEG quant (quant_type=1 matrix dequant + bitexact
        # parity fix)
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "5", "-mpeg_quant", "1"]),
        # MPEG-2 interlaced frame pictures (config 2 "1080i"): the
        # reference encoder's +ildct sets frame_pred_frame_dct=0, so
        # every coded MB carries frame_motion_type and dct_type in the
        # macroblock_modes() tail (13818-2 6.2.5.1, mpeg12dec.c:659) —
        # dct_type sits BEFORE quantiser_scale_code and the MVs; +ilme
        # additionally emits field MC (frame_motion_type=1) with per-
        # field vectors + vertical_field_select in frame pictures
        ("mpeg2video", "m2v", ["-g", "4", "-q:v", "4", "-flags",
                               "+bitexact+ildct"]),
        ("mpeg2video", "m2v", ["-g", "4", "-q:v", "4", "-flags",
                               "+bitexact+ilme"]),
        ("mpeg2video", "m2v", ["-g", "4", "-q:v", "4", "-flags",
                               "+bitexact+ildct+ilme"]),
        ("mpeg2video", "m2v", ["-g", "6", "-bf", "2", "-q:v", "4",
                               "-flags", "+bitexact+ildct+ilme"]),
        ("mpeg2video", "m2v", ["-g", "6", "-bf", "2", "-q:v", "4",
                               "-flags", "+bitexact+ildct"]),
    ])
    def test_video(self, y4m, tmp_path, codec, ext, args):
        enc = str(tmp_path / f"ref.{ext}")
        ref_run(["-i", y4m] + BITEXACT + ["-c:v", codec] + args + [enc])
        ref = ref_framecrc(enc)
        ours = our_framecrc(enc)
        assert crc_column(ours) == crc_column(ref)
        if ext == "avi":   # container timestamps must also match
            assert ours == ref

    @pytest.mark.parametrize("codec,ext,args", [
        ("mpeg2video", "m2v", ["-bf", "2", "-g", "6"]),   # judge repro
        ("mpeg2video", "m2v", []),
        ("mpeg1video", "m1v", []),                        # first-pkt pts=0
        ("mpeg1video", "m1v", ["-bf", "2", "-g", "6"]),
        ("mpeg4", "m4v", ["-bf", "2", "-g", "6"]),        # VOP pts chain
        ("mpeg4", "m4v", []),
    ])
    def test_raw_es_timestamps(self, y4m, tmp_path, codec, ext, args):
        """Raw-ES decode framecrc lines must match the reference
        INCLUDING the timestamp columns (compute_pkt_fields +
        guess_correct_pts semantics: the dts of the packet that
        returned each frame, display pts from VOP headers for MPEG-4,
        output-clock fill at drain)."""
        enc = str(tmp_path / f"t.{ext}")
        ref_run(["-i", y4m] + BITEXACT + ["-c:v", codec, "-q:v", "5"]
                + args + [enc])
        assert our_framecrc(enc) == ref_framecrc(enc)

    def test_raw_es_timestamps_h264(self, y4m, tmp_path):
        """Raw Annex-B H.264 with B-frames: the reference SKIPS pts/dts
        interpolation for H.264 (utils.c:715 'delay and has_b_frames
        are not reliably set'), so frames leave with no timestamps and
        the output clock numbers them 0,1,2,... — full-line framecrc
        parity, both decoders, on our own CABAC+B stream (the reference
        has no H.264 encoder)."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "t.h264")
        rc = avconv.main(["-v", "error", "-i", y4m, "-c:v", "h264",
                          "-qp", "30", "-bf", "2", "-g", "8",
                          "-entropy", "cabac", "-y", enc])
        assert rc == 0
        assert our_framecrc(enc) == ref_framecrc(enc)

    def test_mpeg2_interlaced_hd(self, tmp_path):
        """Config 2 class: 1440x1080 interlaced MPEG-2 (+ildct+ilme,
        B-frames) encoded by the reference decodes pixel-identical.
        Exercises frame_motion_type/field-MV/dct_type parsing at
        broadcast MB counts (1440x1080 = 6120 MBs/frame)."""
        src = str(tmp_path / "hd.y4m")
        write_y4m(src, w=1440, h=1080, n=3)
        enc = str(tmp_path / "hd.m2v")
        ref_run(["-i", src] + BITEXACT +
                ["-c:v", "mpeg2video", "-g", "3", "-bf", "1", "-q:v",
                 "6", "-flags", "+bitexact+ildct+ilme", enc])
        assert crc_column(our_framecrc(enc)) == crc_column(ref_framecrc(enc))

    @pytest.mark.parametrize("channels,bitrate", [(2, "192k"), (6, "384k")])
    def test_ac3(self, wav48, tmp_path, channels, bitrate):
        """AC-3 with coupling/rematrixing/dither (and block switching on
        the transient source): our decode tracks the reference decoder
        within 1 LSB — requires the bit-exact lagged-Fibonacci dither."""
        enc = str(tmp_path / "ref.ac3")
        ref_run(["-i", wav48, "-ac", str(channels), "-c:a", "ac3",
                 "-b:a", bitrate, enc])
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        from libav_tpu.tools import avconv
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1

    @pytest.mark.parametrize("channels,bitrate", [
        (1, "96k"), (2, "128k"), (2, "96k"), (6, "384k")])
    def test_eac3(self, wav48, tmp_path, channels, bitrate):
        """E-AC-3 (A/52B Annex E): bsid-16 frame header, audio-frame
        syntax flags, per-frame exponent strategy, eac3 band-structure
        and first-coords coupling rules — our decode tracks the
        reference decoder within 1 LSB (reference: eac3dec.c)."""
        enc = str(tmp_path / "ref.eac3")
        ref_run(["-i", wav48, "-ac", str(channels), "-c:a", "eac3",
                 "-b:a", bitrate, enc])
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        from libav_tpu.tools import avconv
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1

    @pytest.mark.parametrize("name,specs", [
        # (emitter knobs; see tests/eac3_stress.py)
        ("plain",   [dict(acmod=2, seed=1), dict(acmod=2, seed=2)]),
        ("mono",    [dict(acmod=1, seed=4)]),
        ("lfe",     [dict(acmod=2, lfeon=1, seed=5)]),
        ("aht",     [dict(acmod=2, aht=(0, 1), seed=6)]),
        ("gaq1",    [dict(acmod=2, aht=(0, 1), gaq_mode=1, seed=7)]),
        ("gaq2",    [dict(acmod=2, aht=(0, 1), gaq_mode=2, seed=21)]),
        ("gaq3",    [dict(acmod=2, aht=(0, 1), gaq_mode=3, seed=8)]),
        ("cpl",     [dict(acmod=2, cpl=True, seed=9)]),
        ("phsflg",  [dict(acmod=2, cpl=True, phsflg=True, seed=14)]),
        ("cpl_def", [dict(acmod=2, cpl=True, cpl_default_struct=True,
                          seed=15)]),
        ("spx",     [dict(acmod=2, spx=True, seed=10)]),
        ("spx_def", [dict(acmod=2, spx=True, spx_default_struct=True,
                          seed=16)]),
        ("spx_restrobe", [dict(acmod=2, spx=True, spx_restrobe=True,
                               seed=17)]),
        ("cpl_spx", [dict(acmod=2, cpl=True, spx=True, seed=18)]),
        ("aht_cpl", [dict(acmod=2, aht=(0, 1, -1), cpl=True, seed=19)]),
        ("aht_lfe", [dict(acmod=2, lfeon=1, aht=(0, 1, 2), seed=20)]),
        ("5_1",     [dict(acmod=7, lfeon=1, bwcod=12, csnr=20, seed=22)]),
        ("5_1_cpl", [dict(acmod=7, lfeon=1, cpl=True, seed=23)]),
        ("blk1",    [dict(acmod=2, num_blocks=1, seed=11)]),
        ("blk2",    [dict(acmod=2, num_blocks=2, seed=27)]),
        ("blk3",    [dict(acmod=2, num_blocks=3, seed=12)]),
        ("metadata", [dict(acmod=2, mixmd=True, infomd=True, seed=13)]),
        ("multi",   [dict(acmod=2, seed=24), dict(acmod=2, cpl=True,
                     seed=25), dict(acmod=2, spx=True, seed=26)]),
    ])
    def test_eac3_stress(self, tmp_path, name, specs):
        """E-AC-3 decode paths the reference *encoder* never emits —
        AHT (GAQ 0-3, VQ, zero-hebap dither), spectral extension
        (band structures, re-strobe, attenuation path), eac3 coupling
        rules, short frames, metadata skips — via the syntactic stress
        emitter; our decode tracks the reference decoder within 1 LSB
        (reference: eac3dec.c, ac3dec.c s->eac3 branches).  Also locks
        the reference's invalid-code conventions (b3/b5 code 7/15 ->
        0, b4 codes >= 121 extrapolated, ac3dec.c:134-158)."""
        import eac3_stress as ST
        stream = str(tmp_path / f"{name}.eac3")
        ST.write_stream(stream, [ST._FrameSpec(**s) for s in specs])
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-f", "eac3", "-i", stream, "-f", "s16le", refpcm])
        from libav_tpu.tools import avconv
        assert avconv.main(["-y", "-i", stream, "-f", "s16le",
                            ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1

    def test_ac3_ref_decodes_ours(self, wav48, tmp_path):
        """our AC-3 stream: the reference and our decoder must agree
        within 1 LSB (conformance of exponent/mantissa coding)."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "our.ac3")
        assert avconv.main(["-y", "-i", wav48, "-c:a", "ac3",
                            "-f", "ac3", enc]) == 0
        refpcm = str(tmp_path / "refdec.pcm")
        ourpcm = str(tmp_path / "ourdec.pcm")
        ref_run(["-f", "ac3", "-i", enc, "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-f", "ac3", "-i", enc,
                            "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        n = min(a.size, b.size)
        assert n > 0
        assert np.abs(a[:n] - b[:n]).max() <= 1

    def test_aac(self, wav48, tmp_path):
        enc = str(tmp_path / "ref.aac")
        ref_run(["-i", wav48, "-strict", "experimental", "-c:a", "aac",
                 "-b:a", "128k", "-f", "adts", enc])
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        from libav_tpu.tools import avconv
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        d = np.abs(a - b)
        assert d.max() <= 1, f"maxdiff {d.max()}"


class TestEncodeParity:
    """our encode -> reference decode vs our decode -> identical pixels
    (+ the reference must accept the stream at all)."""

    @pytest.mark.parametrize("codec,fmt,args", [
        ("mjpeg", "avi", ["-q:v", "5"]),
        ("mpeg1video", "mpeg1video", ["-g", "4"]),
        ("mpeg2video", "mpeg2video", ["-g", "4"]),
        ("mpeg4", "m4v", ["-g", "4"]),
        ("mpeg4", "m4v", ["-g", "4", "-acpred", "1"]),
        ("mpeg4", "m4v", ["-g", "2", "-acpred", "1", "-q:v", "8"]),
        ("mpeg4", "m4v", ["-g", "4", "-mpegq", "1"]),
        ("mpeg4", "m4v", ["-g", "4", "-mpegq", "1", "-acpred", "1",
                          "-q:v", "4"]),
        # adaptive quantization: per-MB qscale via INTER_Q/INTRA_Q
        # dquant chains (ratecontrol.c:703 masking models)
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "6", "-lumi_masking",
                          "0.4", "-dark_masking", "0.2"]),
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "8", "-scplx_masking",
                          "0.4", "-p_masking", "0.2",
                          "-border_masking", "0.5"]),
        ("mpeg4", "m4v", ["-g", "4", "-q:v", "6", "-data_partitioning",
                          "1", "-lumi_masking", "0.5"]),
        # MPEG-4 ASP encode: B-VOPs (fwd/bwd/bi + modb direct + skip
        # inheritance), quarter-sample P with fcode 2
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2"]),
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2", "-mpegq", "1",
                          "-acpred", "1"]),
        ("mpeg4", "m4v", ["-g", "6", "-bf", "2", "-bdirect", "3"]),
        ("mpeg4", "m4v", ["-g", "4", "-qpel", "1"]),
        ("mpeg4", "m4v", ["-g", "4", "-qpel", "1", "-mpegq", "1",
                          "-q:v", "4"]),
        ("h264", "h264", ["-g", "4", "-qp", "28"]),
        ("h264", "h264", ["-g", "4", "-qp", "26", "-deblock", "1"]),
        ("h264", "h264", ["-g", "4", "-qp", "28", "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "4", "-qp", "26", "-deblock", "1",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "5", "-qp", "30", "-refs", "2",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "3", "-qp", "27", "-i4x4", "1"]),
        ("h264", "h264", ["-g", "3", "-qp", "27", "-i4x4", "1",
                          "-entropy", "cabac", "-deblock", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-entropy", "cabac"]),
        # partition stress: every P shape incl. 8x8 sub-partitions
        ("h264", "h264", ["-g", "4", "-qp", "28", "-parts", "all"]),
        ("h264", "h264", ["-g", "4", "-qp", "28", "-parts", "all",
                          "-entropy", "cabac"]),
        # B partitions + spatial direct (B_Direct_16x16, B_8x8 with
        # direct/L0/L1/Bi subs, 16x8/8x16 list combinations)
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-parts", "all"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-parts", "all", "-entropy", "cabac"]),
        # gaps_in_frame_num (8.2.5.2): non-existing frame insertion
        # with the newest-ref concealment copy
        ("h264", "h264", ["-g", "6", "-qp", "28", "-fgap", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-fgap", "3",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "6", "-qp", "26", "-fgap", "1",
                          "-deblock", "1", "-entropy", "cabac"]),
        # long-term references: IDR long_term_reference_flag, MMCO
        # 1/2/3/4/6 marking schedule, long-term default-list placement
        # and ref_pic_list_modification idc 2 (8.2.4/8.2.5)
        ("h264", "h264", ["-g", "12", "-qp", "28", "-mmco", "1"]),
        ("h264", "h264", ["-g", "12", "-qp", "28", "-mmco", "1",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "8", "-qp", "26", "-mmco", "1",
                          "-entropy", "cabac", "-slices", "2"]),
        ("h264", "h264", ["-g", "12", "-qp", "28", "-mmco", "1",
                          "-parts", "all", "-entropy", "cabac"]),
        # pic_order_cnt_type 1 (offset-cycle expectedPicOrderCnt) and 2
        # (decode-order POC) derivations (8.2.1.2 / 8.2.1.3)
        ("h264", "h264", ["-g", "4", "-qp", "28", "-poc", "2"]),
        ("h264", "h264", ["-g", "4", "-qp", "28", "-poc", "1"]),
        ("h264", "h264", ["-g", "4", "-qp", "28", "-poc", "1",
                          "-entropy", "cabac", "-deblock", "1"]),
        ("h264", "h264", ["-g", "5", "-qp", "30", "-poc", "2",
                          "-refs", "2", "-entropy", "cabac"]),
        # I_PCM raw-sample MBs (7.3.5: alignment + 384 bytes; CABAC:
        # terminate bin + engine re-init, neighbor ctx bookkeeping)
        ("h264", "h264", ["-g", "3", "-qp", "26", "-ipcm", "5"]),
        ("h264", "h264", ["-g", "3", "-qp", "26", "-ipcm", "5",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "3", "-qp", "28", "-ipcm", "3",
                          "-deblock", "1", "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "1", "-qp", "26", "-ipcm", "4",
                          "-entropy", "cabac", "-slices", "2"]),
        # temporal direct (direct_spatial_mv_pred_flag=0, 8.4.1.2.3:
        # POC-distance DistScaleFactor scaling of colocated motion)
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-direct", "temporal"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-parts", "all", "-direct", "temporal",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "6", "-qp", "26", "-bf", "2",
                          "-direct", "temporal", "-deblock", "1",
                          "-entropy", "cabac", "-slices", "2"]),
        # block-granular two-list deblock bS
        ("h264", "h264", ["-g", "6", "-qp", "26", "-parts", "all",
                          "-deblock", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "26", "-bf", "1",
                          "-parts", "all", "-deblock", "1",
                          "-entropy", "cabac"]),
        # multi-reference partitions (per-partition ref_idx te(v)/ctx)
        ("h264", "h264", ["-g", "5", "-qp", "30", "-refs", "2",
                          "-parts", "all"]),
        ("h264", "h264", ["-g", "5", "-qp", "30", "-refs", "2",
                          "-parts", "all", "-entropy", "cabac"]),
        # weighted prediction: explicit P (per-ref tables), explicit and
        # implicit B (POC-distance weights), combined with partitions
        ("h264", "h264", ["-g", "6", "-qp", "28", "-weightp", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-weightp", "1",
                          "-refs", "2", "-parts", "all"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-weightb", "explicit", "-parts", "all"]),
        ("h264", "h264", ["-g", "6", "-qp", "28", "-bf", "2",
                          "-weightb", "implicit", "-parts", "all",
                          "-entropy", "cabac"]),
        ("h264", "h264", ["-g", "6", "-qp", "26", "-bf", "1",
                          "-weightp", "1", "-weightb", "implicit",
                          "-deblock", "1", "-parts", "all",
                          "-entropy", "cabac"]),
        # multi-slice frames (slice-parallel entropy; slice-boundary
        # intra availability)
        ("h264", "h264", ["-g", "4", "-qp", "28", "-entropy", "cabac",
                          "-slices", "3", "-i4x4", "1"]),
        ("h264", "h264", ["-g", "6", "-qp", "27", "-entropy", "cabac",
                          "-slices", "4", "-bf", "2", "-parts", "all",
                          "-deblock", "1"]),
        # High profile: 8x8 transform — I_8x8 filtered-edge prediction,
        # inter transform_size_8x8_flag (alternating), CABAC cat-5
        ("h264", "h264", ["-g", "1", "-qp", "26", "-entropy", "cabac",
                          "-i8x8", "1"]),
        ("h264", "h264", ["-g", "4", "-qp", "26", "-entropy", "cabac",
                          "-i4x4", "1", "-dct8x8", "1"]),
        ("h264", "h264", ["-g", "4", "-qp", "24", "-entropy", "cabac",
                          "-i8x8", "1", "-dct8x8", "1", "-deblock", "1"]),
        # High profile: scaling matrices (seq-level JVT default lists)
        ("h264", "h264", ["-g", "3", "-qp", "26", "-entropy", "cabac",
                          "-i4x4", "1", "-scmatrix", "default"]),
        ("h264", "h264", ["-g", "3", "-qp", "30", "-scmatrix",
                          "default"]),
        # chroma_qp_index_offset + distinct second offset (Cb/Cr QPc)
        ("h264", "h264", ["-g", "3", "-qp", "26", "-entropy", "cabac",
                          "-i4x4", "1", "-cqpo", "4", "-cqpo2", "-3",
                          "-deblock", "1"]),
        ("h264", "h264", ["-g", "3", "-qp", "28", "-cqpo", "-5"]),
        # everything High at once
        ("h264", "h264", ["-g", "4", "-qp", "26", "-entropy", "cabac",
                          "-i8x8", "1", "-dct8x8", "1", "-scmatrix",
                          "default", "-cqpo", "2", "-deblock", "1",
                          "-bf", "1"]),
        # adaptive quantization: QUANT macroblock_type variants
        # (B.2a/B.2b) re-anchoring the slice qscale per MB
        ("mpeg1video", "mpeg1video", ["-g", "4", "-q:v", "6",
                                      "-lumi_masking", "0.5",
                                      "-dark_masking", "0.3"]),
        ("mpeg2video", "mpeg2video", ["-g", "4", "-q:v", "6",
                                      "-scplx_masking", "0.4",
                                      "-border_masking", "0.5"]),
    ])
    def test_video(self, y4m, tmp_path, codec, fmt, args):
        from libav_tpu.tools import avconv
        enc = str(tmp_path / f"our_{codec}.bin")
        rc = avconv.main(["-y", "-i", y4m, "-c:v", codec] + args +
                         ["-f", fmt, enc])
        assert rc == 0
        ref = ref_framecrc(enc)
        ours = our_framecrc(enc)
        assert len(crc_column(ref)) > 0
        assert crc_column(ours) == crc_column(ref)

    def test_mmco_long_gop(self, tmp_path):
        """12-frame GOP: the full MMCO schedule runs two cycles,
        covering the adaptive-marking capacity rule (no sliding window
        when MMCO present, 8.2.5.3) at fn 8-11."""
        from libav_tpu.tools import avconv
        src = str(tmp_path / "src12.y4m")
        write_y4m(src, w=192, h=160, n=12)
        for extra in ([], ["-entropy", "cabac", "-parts", "all"]):
            enc = str(tmp_path / "mmco12.h264")
            rc = avconv.main(["-y", "-i", src, "-c:v", "h264", "-g",
                              "12", "-qp", "28", "-mmco", "1"] + extra +
                             ["-f", "h264", enc])
            assert rc == 0
            assert crc_column(our_framecrc(enc)) == \
                crc_column(ref_framecrc(enc))

    def test_aac_tns_ref_decodes_ours(self, wav48, tmp_path):
        """TNS-filtered stream: reference decode == our decode (+-1)."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "t.aac")
        rc = avconv.main(["-y", "-i", wav48, "-c:a", "aac",
                          "-tns", "1", "-f", "adts", enc])
        assert rc == 0
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1

    @pytest.mark.parametrize("opts", [["-intensity", "1"],
                                      ["-pulse", "1"],
                                      ["-intensity", "1", "-pulse", "1"]])
    def test_aac_is_pulse_cross(self, wav48, tmp_path, opts):
        """Intensity-stereo / pulse streams: reference decode == our
        decode (+-1 s16 LSB) — exercises aacdec.c:1342 IS positions +
        apply_intensity_stereo :1969 and decode_pulses :1389."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "t.aac")
        rc = avconv.main(["-y", "-i", wav48, "-c:a", "aac"] + opts +
                         ["-f", "adts", enc])
        assert rc == 0
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1
        if "-intensity" in opts:
            # the stream must really carry IS bands: our decoder records
            # none if the emitter silently skipped them — guard against
            # a vacuous pass by checking stereo output differs L vs R
            s = b.reshape(-1, 2)
            assert np.abs(s[:, 0] - s[:, 1]).max() > 0

    def test_aac_ref_decodes_ours(self, wav48, tmp_path):
        """our AAC stream must decode in the reference to audio close to
        the source (level convention interop)."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "our.aac")
        assert avconv.main(["-y", "-i", wav48, "-c:a", "aac",
                            "-f", "adts", enc]) == 0
        refpcm = str(tmp_path / "ref.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        a = np.fromfile(refpcm, dtype="<i2").astype(float).reshape(-1, 2)
        src = np.fromfile(wav48, dtype="<i2")[22:].astype(float)
        src = src[:a.size].reshape(-1, 2)
        n = min(len(a), len(src)) - 2048
        # skip codec delay region; require sane SNR (not bit-exactness:
        # lossy float codec)
        x = src[1024:n, 0]
        y = a[2048:n + 1024, 0][:len(x)]
        err = x[:len(y)] - y
        snr = 10 * np.log10((x[:len(y)] ** 2).mean() /
                            max((err ** 2).mean(), 1e-9))
        assert snr > 15, f"SNR {snr:.1f} dB"


class TestRefListModification:
    """Explicit ref_pic_list_modification (spec 7.3.3.1/8.2.4.3): a
    stream that swaps the two short-term references each P slice must
    decode identically here and in the reference."""

    @pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
    def test_swap_two_refs(self, tmp_path, entropy):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.avutil.rational import Rational
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.h264.enc import H264Encoder
        from libav_tpu.codecs.h264.dec import H264Decoder

        class SwapEnc(H264Encoder):
            def _code_anchor(self, frame, disp, is_i):
                if not is_i and len(self._dpb) == 2:
                    a, b = self._dpb
                    self._dpb = [b, a]
                    self._reorder_l0 = [(0, 1)]   # picNum fn-2 first
                    pkt = super()._code_anchor(frame, disp, is_i)
                    new = self._dpb[0]
                    self._dpb = [new, a]          # decode-order window
                    self._reorder_l0 = None
                    return pkt
                self._reorder_l0 = None
                return super()._code_anchor(frame, disp, is_i)

        rng = np.random.RandomState(7)
        W, H = 96, 80
        base = rng.randint(0, 255, (H, W)).astype(np.uint8)
        frames = []
        for t in range(7):
            f = Frame.alloc_video(W, H, "yuv420p")
            f.planes[0] = (np.roll(base, 2 * t, axis=1) // 2 +
                           50 + 5 * t).astype(np.uint8)
            f.planes[1][:] = 90 + 8 * t
            f.planes[2][:] = 150
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=W, height=H, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = SwapEnc(par)
        enc.set_opt("qp", 28)
        enc.set_opt("gop_size", 7)
        enc.set_opt("refs", 2)
        enc.set_opt("entropy", entropy)
        pkts = enc.encode_all(frames)
        es = str(tmp_path / "t.h264")
        with open(es, "wb") as fo:
            for p in pkts:
                fo.write(bytes(p.data))
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        yuv = str(tmp_path / "o.yuv")
        ref_run(["-flags", "+bitexact", "-idct", "simple", "-i", es,
                 "-f", "rawvideo", yuv])
        raw = np.fromfile(yuv, dtype=np.uint8)
        fsz = W * H * 3 // 2
        assert raw.size // fsz == len(out) == 7
        for k in range(len(out)):
            ry = raw[k * fsz:k * fsz + W * H].reshape(H, W)
            np.testing.assert_array_equal(
                ry, np.asarray(out[k].to_host().planes[0]))


class TestMpeg2FieldPictures:
    """MPEG-2 FIELD PICTURES (config 2 '1080i'): our field encode ->
    reference decode == our decode, for every field_motion_type
    (whole-field both parities, 16x8, dual prime). The reference
    prepends one dummy black frame for field streams (mpegvideo.c
    frame_start allocates a dummy last picture for non-frame
    picture_structure), so frames compare with a +1 shift."""

    @pytest.mark.parametrize("pattern", ["same", "whole", "h16",
                                         "dponly", "full"])
    def test_field_roundtrip(self, tmp_path, pattern):
        import subprocess
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.avutil.rational import Rational
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg12.enc import MPEG2Encoder
        from libav_tpu.codecs.mpeg12.dec import MPEG2Decoder

        W, H = 128, 96
        def mk(t):
            f = Frame.alloc_video(W, H, "yuv420p")
            yy, xx = np.mgrid[0:H, 0:W]
            f.planes[0] = ((xx * 2 + yy * 3 + t * 6) % 256).astype(
                np.uint8)
            ch, cw = f.planes[1].shape
            yy, xx = np.mgrid[0:ch, 0:cw]
            f.planes[1] = (128 + 54 * np.sin((xx + 3 * t) / 9.0)).astype(
                np.uint8)
            f.planes[2] = (128 + 54 * np.cos((yy - 2 * t) / 7.0)).astype(
                np.uint8)
            f.pts = t
            return f

        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg2video", width=W, height=H,
                              pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = MPEG2Encoder(par)
        enc.set_opt("qscale", 6)
        enc.set_opt("gop_size", 8)
        enc.set_opt("fieldpic", 1)
        enc.set_opt("fieldstress", pattern)
        pkts = enc.encode_all([mk(t) for t in range(4)])
        es = str(tmp_path / "field.m2v")
        with open(es, "wb") as fo:
            for p in pkts:
                fo.write(bytes(p.data))
        yuv = str(tmp_path / "ref.yuv")
        ref_run(["-i", es, "-f", "rawvideo", yuv])
        dec = MPEG2Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg2video")).open()
        outs = dec.decode_all([Packet(data=p.data, pts=i)
                               for i, p in enumerate(pkts)])
        raw = np.fromfile(yuv, dtype=np.uint8)
        fsz = W * H * 3 // 2
        nref = raw.size // fsz
        assert nref == len(outs) + 1      # +1 leading dummy
        for k, f in enumerate(outs):
            r = raw[(k + 1) * fsz:(k + 2) * fsz]
            o = np.concatenate(
                [np.asarray(f.to_host().planes[p]).reshape(-1)
                 for p in range(3)])
            np.testing.assert_array_equal(o, r)


class TestSwscaleParity:
    """swscale vs the reference's `-sws_flags +accurate_rnd+bitexact`
    (config 5; reference tests/fate-run.sh:127-129): our -s output must
    be byte-identical for down- and up-scale across algorithms."""

    @pytest.mark.parametrize("size,flags", [
        ("120x96", None),                 # default bicubic, downscale
        ("256x192", None),                # upscale
        ("100x82", None),                 # odd sizes
        ("120x96", "bilinear"),
        ("96x80", "lanczos"),
        ("64x48", "area"),
        ("130x110", "spline"),
    ])
    def test_scale(self, y4m, tmp_path, size, flags):
        from libav_tpu.tools import avconv
        swf = (flags or "bicubic") + "+accurate_rnd+bitexact"
        refyuv = str(tmp_path / "ref.yuv")
        ouryuv = str(tmp_path / "our.yuv")
        ref_run(["-i", y4m, "-s", size, "-sws_flags", swf,
                 "-f", "rawvideo", refyuv])
        args = ["-y", "-i", y4m, "-s", size]
        if flags:
            args += ["-sws_flags", flags]
        assert avconv.main(args + ["-f", "rawvideo", ouryuv]) == 0
        a = np.fromfile(refyuv, np.uint8)
        b = np.fromfile(ouryuv, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)


class TestAvresampleParity:
    """`-ar` resampling vs the reference: byte-identical s16 output
    (libavresample's Kaiser-1024-phase bank + mirror padding + s16
    accumulate, replicated exactly in avresample/refexact.py)."""

    @pytest.mark.parametrize("rate", [44100, 32000, 96000, 22050])
    def test_resample_s16(self, wav48, tmp_path, rate):
        from libav_tpu.tools import avconv
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", wav48, "-ar", str(rate), "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-i", wav48, "-ar", str(rate),
                            "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2")
        b = np.fromfile(ourpcm, dtype="<i2")
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("channels,args", [
        (2, ["-ar", "44100"]),                 # config-5 chain, stereo
        (6, ["-ar", "44100", "-ac", "2"]),     # + 5.1 float downmix
        (2, ["-ar", "32000"]),
    ])
    def test_resample_float_ac3(self, wav48, tmp_path, channels, args):
        """The float resample path config 5 actually uses: AC-3 decode
        (fltp) -> FLT-internal resample (+downmix) -> s16.  Same
        length to the sample and within 1 LSB of the reference (the
        float FIR is summed in a different association order, so the
        last ulp can land on the other side of a rounding boundary)."""
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "in.ac3")
        ref_run(["-i", wav48, "-ac", str(channels), "-c:a", "ac3",
                 "-b:a", "192k" if channels == 2 else "384k", enc])
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc] + args + ["-f", "s16le", refpcm])
        assert avconv.main(["-y", "-i", enc] + args +
                           ["-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1

    def test_raw_float_input_options(self, tmp_path):
        """Input-side -ar/-ac/-sample_fmt on raw PCM (the avconv
        option-parsing repro: they must configure the DEMUXER, not the
        output): f32le at 48 kHz stereo declared before -i resamples
        to the same sample count as the reference."""
        from libav_tpu.tools import avconv
        raw = str(tmp_path / "in.f32le")
        t = np.arange(48000 * 2) / 48000.0
        x = (0.4 * np.sin(2 * np.pi * 441 * t)).astype("<f4")
        np.repeat(x, 2).astype("<f4").tofile(raw)
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-f", "f32le", "-ar", "48000", "-ac", "2", "-i", raw,
                 "-ar", "44100", "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-f", "f32le", "-ar", "48000", "-ac",
                            "2", "-i", raw, "-ar", "44100", "-f",
                            "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1


class TestYadifParity:
    """yadif vs the reference's vf_yadif.c C kernel: byte-identical
    rawvideo output for frame- and field-rate modes, both parities,
    and the spatial-check-less modes 2/3 (ops/yadif.py)."""

    @pytest.mark.parametrize("vf", [
        "yadif",                    # mode 0, auto parity (tff)
        "yadif=1",                  # field rate
        "yadif=0:1",                # bff
        "yadif=2",                  # no spatial interlacing check
        "yadif=3:0",                # field rate + no check, tff
    ])
    def test_yadif(self, y4m, tmp_path, vf):
        from libav_tpu.tools import avconv
        refyuv = str(tmp_path / "ref.yuv")
        ouryuv = str(tmp_path / "our.yuv")
        ref_run(["-i", y4m, "-vf", vf, "-f", "rawvideo", refyuv])
        assert avconv.main(["-y", "-i", y4m, "-vf", vf,
                            "-f", "rawvideo", ouryuv]) == 0
        a = np.fromfile(refyuv, np.uint8)
        b = np.fromfile(ouryuv, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)


class TestSbrParity:
    """HE-AAC SBR decode vs the reference (aacsbr.c): our encoder emits
    legal SBR payloads (enc.py _write_sbr_fil stress profiles: grid
    classes, delta-time/freq coding, invf rotation, add_harmonic,
    limiter/interpolation/smoothing variants, CPE coupling), both
    decoders decode, PCM must agree at float32 precision.  The HF
    inverse filter is numerically unstable on pure tones (the reference
    says so itself), hence the broadband test signal."""

    @pytest.mark.parametrize("profile,nch,ps", [
        (1, 1, 0),   # FIXFIX/1env, defaults
        (2, 1, 0),   # FIXFIX/4env, amp_res=1, add_harmonic, fscale=1
        (3, 1, 0),   # VARVAR/3env, fscale=3, interpol_freq=0, smoothing
        (4, 1, 0),   # FIXVAR/2env + e_a, fscale=0 linear, limiter variants
        (5, 2, 0),   # FIXFIX/2env CPE with coupling
        (3, 2, 0),   # non-coupled CPE
        (1, 1, 1),   # HE-AACv2: PS 20-band HA matrices
        (2, 1, 2),   # PS fine-quant IID + HB (icc_mode >= 3) mixing
        (3, 1, 3),   # PS 34-band + IPD/OPD phase smoothing
    ])
    def test_sbr(self, tmp_path, profile, nch, ps):
        import subprocess
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.aac import AACEncoder, AACDecoder

        sr, nfr = 24000, 8
        n = nfr * 1024
        t = np.arange(n) / sr

        def mksig(seed):
            r = np.random.default_rng(seed)
            s = (np.sin(2 * np.pi * 440 * t) * 0.3 +
                 np.sin(2 * np.pi * 1200 * t) * 0.15 +
                 r.normal(0, 0.08, n))
            return np.clip(s, -0.95, 0.95)

        sigs = [mksig(7 + c) for c in range(nch)]
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=sr, channels=nch,
                              sample_fmt="fltp")
        enc = AACEncoder(par)
        enc.set_opt("sbr", profile)
        if ps:
            enc.set_opt("ps", ps)
        frames = []
        for i in range(0, n, 1024):
            f = Frame(nb_samples=1024, sample_rate=sr, format="fltp",
                      channels=nch)
            f.planes = [s[i:i + 1024].astype(np.float32) for s in sigs]
            frames.append(f)
        pkts = enc.encode_all(frames)
        path = str(tmp_path / "sbr.aac")
        open(path, "wb").write(b"".join(p.data for p in pkts))

        refpcm = str(tmp_path / "ref.f32")
        ref_run(["-i", path, "-f", "f32le", refpcm])
        ref = np.fromfile(refpcm, np.float32).astype(np.float64)
        # mono + implicit SBR decodes as HE-AACv2 (PS guess) = dup stereo
        refch = 2 if nch == 1 else nch
        ref = ref.reshape(-1, refch)

        dec = AACDecoder(CodecParameters(
            codec_type=MediaType.AUDIO, codec_id="aac", sample_rate=sr))
        out = dec.decode_all([Packet(data=p.data) for p in pkts])
        assert out[0].nb_samples == 2048
        assert out[0].sample_rate == 2 * sr
        onch = len(out[0].planes)
        if ps:
            assert onch == 2     # PS upmixes the mono element
        ours = np.stack(
            [np.concatenate([np.asarray(f.planes[c]) for f in out])
             for c in range(onch)], axis=1).astype(np.float64)
        if onch == 1 and refch == 2:
            ours = np.repeat(ours, 2, axis=1)
            onch = 2
        m = min(len(ours), len(ref))
        assert m >= (nfr - 1) * 2048
        for c in range(onch):
            d = np.abs(ours[:m, c] - ref[:m, c])
            assert d.max() < 2e-4, f"ch{c}: max diff {d.max()}"


class TestMpegAudioParity:
    """MPEG audio layers I-III vs the reference float decoders
    (mpegaudiodec_template.c): reference-encoded MP2 and our-encoded
    MP1/MP2/MP3 (incl. MS joint stereo) must decode identically in both
    decoders (codecs/mpegaudio/)."""

    @staticmethod
    def _sig(nch, n, sr):
        t = np.arange(n) / sr
        out = []
        for c in range(nch):
            r = np.random.default_rng(5 + c)
            out.append(np.clip(
                np.sin(2 * np.pi * (440 + 300 * c) * t) * 0.4 +
                np.sin(2 * np.pi * 3000 * t) * 0.1 +
                r.normal(0, 0.05, n), -0.95, 0.95))
        return out

    def _encode_ours(self, codec, nch, js, tmp_path):
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs import find_encoder
        sr = 44100
        fs = 384 if codec == "mp1" else 1152
        n = 24 * 1152
        sigs = self._sig(nch, n, sr)
        enc = find_encoder(codec)(CodecParameters(
            codec_type=MediaType.AUDIO, codec_id=codec, sample_rate=sr,
            channels=nch, sample_fmt="fltp"))
        if js:
            enc.set_opt("js", 1)
        frames = []
        for i in range(0, n - n % fs, fs):
            f = Frame(nb_samples=fs, sample_rate=sr, format="fltp",
                      channels=nch)
            f.planes = [s[i:i + fs].astype(np.float32) for s in sigs]
            frames.append(f)
        pkts = enc.encode_all(frames)
        path = str(tmp_path / f"our.{codec}")
        open(path, "wb").write(b"".join(p.data for p in pkts))
        return path, pkts

    def _compare(self, codec, path, pkts, nch, tmp_path):
        from libav_tpu.avutil.frame import Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs import find_decoder
        refpcm = str(tmp_path / "ref.f32")
        ref_run(["-c:a", codec + "float", "-i", path,
                 "-f", "f32le", refpcm])
        ref = np.fromfile(refpcm, np.float32).astype(
            np.float64).reshape(-1, nch)
        dec = find_decoder(codec)(CodecParameters(
            codec_type=MediaType.AUDIO, codec_id=codec))
        out = dec.decode_all([Packet(data=p.data) for p in pkts])
        mine = np.stack(
            [np.concatenate([np.asarray(f.planes[c]) for f in out])
             for c in range(nch)], axis=1)
        m = min(len(mine), len(ref))
        assert m > 10000
        d = np.abs(mine[:m] - ref[:m])
        assert d.max() < 1e-4, f"max diff {d.max()}"

    @pytest.mark.parametrize("codec,nch,js", [
        ("mp1", 2, 0),
        ("mp2", 1, 0),
        ("mp2", 2, 0),
        ("mp3", 1, 0),
        ("mp3", 2, 0),
        ("mp3", 2, 1),     # MS joint stereo
    ])
    def test_our_encode(self, tmp_path, codec, nch, js):
        path, pkts = self._encode_ours(codec, nch, js, tmp_path)
        self._compare(codec, path, pkts, nch, tmp_path)

    @pytest.mark.parametrize("nch,kbps", [(1, 96), (2, 224), (2, 64)])
    def test_ref_encoded_mp2(self, tmp_path, nch, kbps):
        """reference mp2 encoder -> both decoders agree (covers the
        allocation tables our encoder does not pick)."""
        from libav_tpu.avutil.frame import Packet
        from libav_tpu.codecs.mpegaudio.dec import parse_header
        sr = 44100
        n = 24 * 1152
        sigs = self._sig(nch, n, sr)
        import wave
        wavpath = str(tmp_path / "in.wav")
        w = wave.open(wavpath, "wb")
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        data = np.stack(sigs, axis=1)
        w.writeframes((data * 32767).astype("<i2").tobytes())
        w.close()
        path = str(tmp_path / "ref.mp2")
        ref_run(["-i", wavpath, "-c:a", "mp2", "-b:a", f"{kbps}k", path])
        raw = open(path, "rb").read()
        pkts = []
        i = 0
        while i + 4 <= len(raw):
            hdr = parse_header(int.from_bytes(raw[i:i + 4], "big"))
            if hdr is None:
                break
            pkts.append(Packet(data=raw[i:i + hdr["frame_size"]]))
            i += hdr["frame_size"]
        assert len(pkts) > 10
        self._compare("mp2", path, pkts, nch, tmp_path)


class TestGmcParity:
    """MPEG-4 GMC (S-VOPs): our encoder emits sprite trajectories +
    mcsel macroblocks (1-3 warping points, all accuracies, GMC skip);
    decode must be bit-exact vs the reference decoder (ops/gmc.py warp
    kernels, mpeg4videodec.c sprite trajectory/get_amv/gmc_motion)."""

    @pytest.mark.parametrize("points,acc,bf", [
        (1, 3, 0),   # translation fast path (gmc1), 1/16 pel
        (1, 0, 0),   # half-pel phases -> put_pixels fallback + RSHIFT amv
        (2, 3, 0),   # general affine warp
        (3, 1, 0),   # 3-point warp, 1/4 pel
        (3, 3, 2),   # GMC anchors with B-VOPs (amv colocated motion)
    ])
    def test_gmc(self, tmp_path, points, acc, bf):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg4 import MPEG4Encoder, MPEG4Decoder
        w, h, n = 96, 64, 8
        rng = np.random.default_rng(11)
        base = rng.integers(16, 235, (h * 3 // 2, w)).astype(np.uint8)
        frames = []
        for t in range(n):
            fl = np.roll(np.roll(base, 3 * t, axis=1), t, axis=0)
            f = Frame(width=w, height=h, format="yuv420p")
            f.planes = [fl[:h].copy(),
                        fl[h:h + h // 4].reshape(h // 2, w // 2).copy(),
                        fl[h + h // 4:].reshape(h // 2, w // 2).copy()]
            f.pts = t
            frames.append(f)
        enc = MPEG4Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="mpeg4",
            width=w, height=h))
        enc.set_opt("gmc", points)
        enc.set_opt("gmc_acc", acc)
        enc.set_opt("gop_size", n)
        enc.set_opt("b_frames", bf)
        pkts = enc.encode_all(frames)
        path = str(tmp_path / "gmc.m4v")
        open(path, "wb").write(b"".join(p.data for p in pkts))

        dec = MPEG4Decoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="mpeg4",
            width=w, height=h))
        out = dec.decode_all([Packet(data=p.data, pts=p.pts)
                              for p in pkts])
        out.sort(key=lambda f: f.pts if f.pts is not None else 0)

        refyuv = str(tmp_path / "ref.yuv")
        ref_run(["-flags", "+bitexact", "-idct", "simple",
                 "-i", path, "-f", "rawvideo", refyuv])
        ref = np.fromfile(refyuv, np.uint8)
        fsz = w * h * 3 // 2
        assert len(ref) // fsz == len(out) == n
        for k, f in enumerate(out):
            o = np.concatenate([np.asarray(f.planes[i]).reshape(-1)
                                for i in range(3)])
            np.testing.assert_array_equal(o, ref[k * fsz:(k + 1) * fsz])


class TestFilterParity:
    """Filter batch vs the reference C filters — byte-identical rawvideo
    output (drawbox/fade/boxblur/negate/lutyuv; filters/vf.py)."""

    @pytest.mark.parametrize("vf", [
        "drawbox=10:8:40:30:red",
        "drawbox=x=-4:y=-4:width=30:height=30:color=0x3366AA",
        "fade=in:0:10",
        "fade=out:4:6",
        "negate",
        "lutyuv=y=negval",
        "lutyuv=y=val/2:u=clipval:v=maxval-val+minval",
        "unsharp",
        "unsharp=7:7:-1.5:5:5:1.0",
        "gradfun",
        "gradfun=3.0:8",
    ])
    def test_filter(self, y4m, tmp_path, vf):
        from libav_tpu.tools import avconv
        refyuv = str(tmp_path / "ref.yuv")
        ouryuv = str(tmp_path / "our.yuv")
        ref_run(["-i", y4m, "-vf", vf, "-f", "rawvideo", refyuv])
        assert avconv.main(["-y", "-i", y4m, "-vf", vf,
                            "-f", "rawvideo", ouryuv]) == 0
        a = np.fromfile(refyuv, np.uint8)
        b = np.fromfile(ouryuv, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)


class TestTrellisParity:
    """-trellis RD quantization (codecs/trellis.py, reference
    dct_quantize_trellis_c role): streams stay bit-exact-decodable by
    the reference and spend fewer bits than the baseline quantizer."""

    def test_trellis(self, tmp_path):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg4 import MPEG4Encoder, MPEG4Decoder
        w, h, n = 96, 64, 8
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n):
            y = ((xx * 2 + yy + t * 5) % 220 + 16).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p")
            f.planes = [y, np.full((h // 2, w // 2), 110, np.uint8),
                        np.full((h // 2, w // 2), 140, np.uint8)]
            f.pts = t
            frames.append(f)
        sizes = {}
        for tr in (0, 1):
            enc = MPEG4Encoder(CodecParameters(
                codec_type=MediaType.VIDEO, codec_id="mpeg4",
                width=w, height=h))
            enc.set_opt("gop_size", n)
            enc.set_opt("trellis", tr)
            pkts = enc.encode_all(frames)
            sizes[tr] = sum(len(p.data) for p in pkts)
            path = str(tmp_path / f"tr{tr}.m4v")
            open(path, "wb").write(b"".join(p.data for p in pkts))
            dec = MPEG4Decoder(CodecParameters(
                codec_type=MediaType.VIDEO, codec_id="mpeg4",
                width=w, height=h))
            out = dec.decode_all([Packet(data=p.data, pts=p.pts)
                                  for p in pkts])
            out.sort(key=lambda f: f.pts)
            refyuv = str(tmp_path / "ref.yuv")
            ref_run(["-flags", "+bitexact", "-idct", "simple",
                     "-i", path, "-f", "rawvideo", refyuv])
            ref = np.fromfile(refyuv, np.uint8)
            fsz = w * h * 3 // 2
            for k, f in enumerate(out):
                o = np.concatenate([np.asarray(f.planes[i]).reshape(-1)
                                    for i in range(3)])
                np.testing.assert_array_equal(
                    o, ref[k * fsz:(k + 1) * fsz])
        assert sizes[1] < sizes[0], sizes


class TestPixFmtParity:
    """-pix_fmt conversions vs the reference (packing layer
    swscale/packing.py + pixfmt descriptor breadth): rearrangements and
    bit-depth expansions are byte-identical."""

    @pytest.mark.parametrize("pf", [
        "nv12", "nv21", "gray", "gray16le", "yuyv422", "uyvy422",
        "yuv444p", "yuv440p", "yuv420p9le", "yuv420p10le",
        "yuv420p12le", "yuv420p16le",
    ])
    def test_pixfmt(self, y4m, tmp_path, pf):
        from libav_tpu.tools import avconv
        ref = str(tmp_path / "ref.raw")
        our = str(tmp_path / "our.raw")
        ref_run(["-i", y4m, "-pix_fmt", pf,
                 "-sws_flags", "+accurate_rnd+bitexact",
                 "-f", "rawvideo", ref])
        assert avconv.main(["-y", "-i", y4m, "-pix_fmt", pf,
                            "-f", "rawvideo", our]) == 0
        a = np.fromfile(ref, np.uint8)
        b = np.fromfile(our, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)


class TestGplFilterParity:
    """hqdn3d/interlace vs the GPL reference build (these filters are
    GPL-only, absent from the base .refbuild binary) — byte-identical
    rawvideo output across the 6-frame fixture."""

    @pytest.mark.parametrize("vf", [
        "hqdn3d",
        "hqdn3d=3:2:5:4",
        "hqdn3d=8:6:12:9",
        "hqdn3d=2:1:0:0",
        "interlace",
        "interlace=scan=bff",
        "interlace=lowpass=0",
        "delogo=x=30:y=20:w=60:h=40",
        "delogo=x=30:y=20:w=60:h=40:band=8",
        "delogo=x=30:y=20:w=60:h=40:show=1",
        "lut=c0=negval:c1=val:c2=maxval-val",
        "lut=c0=gammaval(0.7)",
        "lutyuv=y=gammaval(0.5):u=val:v=negval",
    ])
    def test_filter(self, y4m, tmp_path, vf):
        from tests.fate_util import gpl_run
        from libav_tpu.tools import avconv
        refyuv = str(tmp_path / "ref.yuv")
        ouryuv = str(tmp_path / "our.yuv")
        gpl_run(["-i", y4m, "-vf", vf, "-f", "rawvideo", refyuv])
        assert avconv.main(["-y", "-i", y4m, "-vf", vf,
                            "-f", "rawvideo", ouryuv]) == 0
        a = np.fromfile(refyuv, np.uint8)
        b = np.fromfile(ouryuv, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("vf", [
        "lutrgb=r=negval:g=val/2:b=maxval-val",
        "lutrgb=r=2*val:g=val+100:b=val-64",
        "lut=c0=negval:c1=val/2:c2=clipval",
    ])
    def test_lut_rgb24(self, tmp_path, vf):
        """The packed-RGB lut path (vf_lut.c:302) — raw rgb24 in/out so
        no swscale conversion muddies the comparison."""
        from tests.fate_util import gpl_run
        from libav_tpu.tools import avconv
        rng = np.random.default_rng(7)
        raw = str(tmp_path / "in.raw")
        rng.integers(0, 256, (4, 64, 48, 3), dtype=np.uint8).tofile(raw)
        src = ["-f", "rawvideo", "-pix_fmt", "rgb24", "-s", "48x64",
               "-r", "25", "-i", raw]
        refraw = str(tmp_path / "ref.raw")
        ourraw = str(tmp_path / "our.raw")
        gpl_run(src + ["-vf", vf, "-f", "rawvideo", refraw])
        assert avconv.main(["-y"] + src + ["-vf", vf, "-f", "rawvideo",
                            ourraw]) == 0
        a = np.fromfile(refraw, np.uint8)
        b = np.fromfile(ourraw, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)

    def test_cropdetect(self, tmp_path, capsys):
        """vf_cropdetect.c semantics: integer line means vs limit,
        2-frame warmup, even-rounded origin, round-divisible size."""
        from tests.fate_util import gpl_run_stderr
        from libav_tpu.tools import avconv
        rng = np.random.default_rng(3)
        y4mf = str(tmp_path / "bord.y4m")
        w, h = 96, 80
        with open(y4mf, "wb") as f:
            f.write(b"YUV4MPEG2 W96 H80 F25:1 Ip A1:1 C420jpeg\n")
            for _ in range(6):
                y = np.zeros((h, w), np.uint8)
                y[10:70, 14:82] = rng.integers(60, 220, (60, 68),
                                               dtype=np.uint8)
                u = np.full((h // 2, w // 2), 128, np.uint8)
                f.write(b"FRAME\n" + y.tobytes() + u.tobytes() +
                        u.tobytes())
        err = gpl_run_stderr(["-i", y4mf, "-vf",
                              "cropdetect=limit=24:round=16",
                              "-f", "null", "-"])
        ref = [l.split("]")[-1].split(" pts")[0].strip()
               for l in err.splitlines() if "crop=" in l]
        assert avconv.main(["-y", "-i", y4mf, "-vf",
                            "cropdetect=limit=24:round=16",
                            "-f", "null", "-"]) == 0
        ours = [l.split("]")[-1].split(" crop=")[0].strip()
                for l in capsys.readouterr().err.splitlines()
                if "crop=" in l]
        assert ours and ours == ref


class TestResyncDataPartitioning:
    """MPEG-4 error-resilience tools (mpeg4/dec.py _VopPred slice
    semantics + _decode_partitions; mpeg4/enc.py ps/data_partitioning):
    reference -ps/-data_partitioning streams decode pixel-identically,
    and our own resync/partitioned streams are conformant (reference
    decode == our decode)."""

    @pytest.mark.parametrize("args", [
        ["-ps", "500", "-g", "4", "-q:v", "5"],
        ["-ps", "200", "-g", "4", "-q:v", "5"],
        ["-ps", "500", "-g", "6", "-bf", "2", "-q:v", "5"],
        ["-ps", "300", "-g", "4", "-q:v", "5", "-flags",
         "+bitexact+mv4"],
        ["-data_partitioning", "1", "-g", "4", "-q:v", "5"],
        ["-data_partitioning", "1", "-ps", "300", "-g", "4",
         "-q:v", "5"],
        ["-data_partitioning", "1", "-ps", "300", "-g", "6", "-bf",
         "2", "-q:v", "5"],
        ["-data_partitioning", "1", "-ps", "400", "-g", "4", "-q:v",
         "5", "-flags", "+bitexact+mv4"],
    ])
    def test_decode_reference_streams(self, y4m, tmp_path, args):
        enc = str(tmp_path / "ref.m4v")
        ref_run(["-i", y4m, "-flags", "+bitexact", "-c:v", "mpeg4"]
                + args + [enc])
        assert crc_column(our_framecrc(enc)) == \
            crc_column(ref_framecrc(enc))

    @staticmethod
    def _frames(w=96, h=80, n=6):
        from libav_tpu.avutil.frame import Frame
        yy, xx = np.mgrid[0:h, 0:w]
        out = []
        for t in range(n):
            y = ((xx * 2 + yy + t * 7) % 220 + 16).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p", pts=t)
            f.planes = [y,
                        ((xx[:h // 2, :w // 2] + t) % 200 + 20)
                        .astype(np.uint8),
                        np.full((h // 2, w // 2), 140, np.uint8)]
            out.append(f)
        return out

    @pytest.mark.parametrize("opts", [
        {"ps": 250},
        {"ps": 120},
        {"data_partitioning": 1},
        {"data_partitioning": 1, "ps": 250},
        {"data_partitioning": 1, "ps": 250, "acpred": 1},
        {"ps": 250, "acpred": 1},
    ])
    def test_encode_conformance(self, tmp_path, opts):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg4 import MPEG4Encoder
        frames = self._frames()
        enc = MPEG4Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="mpeg4",
            width=96, height=80))
        enc.set_opt("gop_size", 3)
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        path = str(tmp_path / "our.m4v")
        open(path, "wb").write(b"".join(p.data for p in pkts))
        a = crc_column(ref_framecrc(path))
        b = crc_column(our_framecrc(path))
        assert len(a) == len(frames)
        assert a == b

    def test_resync_bounds_damage(self, tmp_path):
        """Corrupting one video packet must not destroy the others:
        the decoder resynchronizes at the next marker and conceals only
        the damaged span (the reference's er_add_slice model)."""
        from libav_tpu.avutil.frame import Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg4 import MPEG4Encoder, MPEG4Decoder
        frames = self._frames(n=2)
        enc = MPEG4Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="mpeg4",
            width=96, height=80))
        enc.set_opt("gop_size", 2)
        enc.set_opt("ps", 120)
        pkts = enc.encode_all(frames)

        def decode(datas):
            dec = MPEG4Decoder(CodecParameters(
                codec_type=MediaType.VIDEO, codec_id="mpeg4"))
            return dec.decode_all([Packet(data=d, pts=i)
                                   for i, d in enumerate(datas)])

        clean = decode([p.data for p in pkts])
        # flip bits in the middle of the I-VOP (inside some packet,
        # past the headers)
        data = bytearray(pkts[0].data)
        mid = len(data) // 2
        for off in range(3):
            data[mid + off] ^= 0xFF
        dirty = decode([bytes(data), pkts[1].data])
        assert len(dirty) == len(clean) == 2
        diff = (np.abs(dirty[0].planes[0].astype(int) -
                       clean[0].planes[0].astype(int)) > 0).mean()
        # damage is bounded: resync recovered well under the whole frame
        assert diff < 0.9


class TestMpeg12Trellis:
    """MPEG-1/2 -trellis RD quantization (codecs/trellis.py mpeg1/mpeg2
    kinds: table B.14 run/level costs + EOB + dct_coeff_first, MPEG-1
    oddified / MPEG-2 half-step dequant distortion): streams stay
    reference-decodable and spend fewer bits than the baseline."""

    @pytest.mark.parametrize("codec", ["mpeg1video", "mpeg2video"])
    def test_trellis(self, tmp_path, codec):
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs import find_encoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        w, h, n = 96, 64, 8
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n):
            y = ((xx * 2 + yy + t * 5) % 220 + 16).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p", pts=t)
            f.planes = [y, np.full((h // 2, w // 2), 110, np.uint8),
                        np.full((h // 2, w // 2), 140, np.uint8)]
            frames.append(f)
        sizes = {}
        for tr in (0, 1):
            enc = find_encoder(codec)(CodecParameters(
                codec_type=MediaType.VIDEO, codec_id=codec,
                width=w, height=h))
            enc.set_opt("gop_size", n)
            enc.set_opt("trellis", tr)
            pkts = enc.encode_all(frames)
            sizes[tr] = sum(len(p.data) for p in pkts)
            path = str(tmp_path / f"tr{tr}.bin")
            open(path, "wb").write(b"".join(p.data for p in pkts))
            a = crc_column(ref_framecrc(path))
            b = crc_column(our_framecrc(path))
            assert len(a) == n and a == b, f"trellis={tr} not conformant"
        assert sizes[1] < sizes[0]


class TestH264Paff:
    """H.264 PAFF interlaced coding (h264/enc.py fieldpic, h264/dec.py
    field pictures): field_pic_flag slice headers, per-parity prediction
    chains with the 8.2.4.2.5 field ref list, field-scan coefficients,
    field deblock rules (bS3 horizontal intra edges, mvy_limit 2),
    CABAC field context banks (sig/last 277/338 + field 8x8 ctx map),
    cross-parity chroma MV offset (fieldref=pair: 1-frame window makes
    bottom fields reference the top field), complementary-pair weave — our streams decode identically in the
    reference and in our decoder."""

    @pytest.mark.parametrize("opts", [
        {"fieldpic": 1, "gop_size": 1},
        {"fieldpic": 1, "gop_size": 6},
        {"fieldpic": 1, "gop_size": 6, "deblock": 1},
        {"fieldpic": 1, "gop_size": 3, "i4x4": 1},
        {"fieldpic": 1, "gop_size": 3, "i4x4": 1, "deblock": 1},
        {"fieldpic": 1, "gop_size": 1, "entropy": "cabac"},
        {"fieldpic": 1, "gop_size": 6, "entropy": "cabac"},
        {"fieldpic": 1, "gop_size": 6, "entropy": "cabac",
         "deblock": 1},
        {"fieldpic": 1, "gop_size": 3, "entropy": "cabac", "i4x4": 1},
        {"fieldpic": 1, "gop_size": 6, "fieldref": "pair"},
        {"fieldpic": 1, "gop_size": 6, "fieldref": "pair",
         "entropy": "cabac"},
    ])
    def test_paff(self, tmp_path, opts):
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.h264 import H264Encoder
        w, h, n = 96, 64, 6
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n):
            y = ((xx * 2 + yy * 3 + t * 6) % 215 + 20).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p", pts=t)
            f.planes = [y,
                        ((xx[:h // 2, :w // 2] + yy[:h // 2, :w // 2]
                          + t * 2) % 200 + 20).astype(np.uint8),
                        ((yy[:h // 2, :w // 2] * 2 + t) % 190 + 25)
                        .astype(np.uint8)]
            frames.append(f)
        enc = H264Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="h264",
            width=w, height=h))
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        assert len(pkts) == 2 * n        # two field pictures per frame
        path = str(tmp_path / "paff.264")
        open(path, "wb").write(b"".join(p.data for p in pkts))
        a = crc_column(ref_framecrc(path))
        b = crc_column(our_framecrc(path))
        assert len(a) == n               # fields weave to frames
        assert a == b


class TestH264Mbaff:
    """H.264 MBAFF (mb_adaptive_frame_field_flag): frame pictures of MB
    pairs, every pair field-coded — pair-interleaved walk over the
    stacked field layout, mb_field_decoding_flag (CABAC ctx 70-72 /
    CAVLC u(1)), per-MB field residual contexts and field coefficient
    scan, end_of_slice per pair.  Our streams decode byte-identically
    in the reference decoder and in ours (full-line framecrc)."""

    @pytest.mark.parametrize("opts", [
        {"mbaff": 1, "entropy": "cabac"},
        {"mbaff": 1, "entropy": "cabac", "i4x4": 1},
        {"mbaff": 1, "entropy": "cavlc"},
        {"mbaff": 1, "entropy": "cavlc", "i4x4": 1},
    ])
    def test_mbaff_intra(self, tmp_path, opts):
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.h264 import H264Encoder
        w, h, n = 96, 64, 3
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n):
            # per-line phase: interlace-typical content where field and
            # frame coding differ
            y = ((xx * 2 + yy * 5 + t * 6 + (yy % 2) * 31) % 215
                 + 20).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p", pts=t)
            f.planes = [y,
                        ((xx[:h // 2, :w // 2] + yy[:h // 2, :w // 2]
                          + t * 2) % 200 + 20).astype(np.uint8),
                        ((yy[:h // 2, :w // 2] * 2 + t) % 190 + 25)
                        .astype(np.uint8)]
            frames.append(f)
        enc = H264Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="h264",
            width=w, height=h))
        enc.set_opt("gop_size", 1)
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        assert len(pkts) == n
        path = str(tmp_path / "mbaff.264")
        open(path, "wb").write(b"".join(p.data for p in pkts))
        ref = ref_framecrc(path)
        assert crc_column(ref).__len__() == n
        assert our_framecrc(path) == ref      # full line incl. stamps

    @pytest.mark.parametrize("opts", [
        {"mbaff": 1, "entropy": "cabac"},
        {"mbaff": 1, "entropy": "cabac", "i4x4": 1},
        {"mbaff": 1, "entropy": "cavlc"},
        {"mbaff": 1, "entropy": "cavlc", "i4x4": 1},
    ])
    def test_mbaff_inter_p(self, tmp_path, opts):
        """MBAFF P frames: per-parity field P coding (MbaffRefPicList
        index 0 = same-parity field of the previous frame, coded
        ref_idx against the DOUBLED field list per 7.4.5.1), P_Skip
        with the 7.3.4 mb_skip-before-field-flag ordering, across a
        GOP boundary (IDR mid-stream)."""
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.h264 import H264Encoder
        w, h, n = 96, 64, 7                  # 2 GOPs: IDR at 0 and 4
        rng = np.random.RandomState(3)
        noise = rng.randint(0, 40, (h, w)).astype(np.int32)
        yy, xx = np.mgrid[0:h, 0:w]
        cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
        frames = []
        for t in range(n):
            # textured pan: real MVs, residuals AND skippable statics
            y = np.clip((xx * 2 + yy + 7 * t) % 180 + noise + 10,
                        0, 255).astype(np.uint8)
            f = Frame(width=w, height=h, format="yuv420p", pts=t)
            f.planes = [y,
                        (110 + 30 * np.sin((cxx + 2 * t) / 5.0))
                        .astype(np.uint8),
                        (130 + 30 * np.cos((cyy + 3 * t) / 4.0))
                        .astype(np.uint8)]
            frames.append(f)
        enc = H264Encoder(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id="h264",
            width=w, height=h))
        enc.set_opt("gop_size", 4)
        enc.set_opt("qp", 26)
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        assert len(pkts) == n
        path = str(tmp_path / "mbaff_p.264")
        open(path, "wb").write(b"".join(p.data for p in pkts))
        ref = ref_framecrc(path)
        assert len(crc_column(ref)) == n
        assert our_framecrc(path) == ref      # full line incl. stamps


class TestFlac:
    """FLAC (codecs/flac): lossless, so cross-validation is exact —
    our decode of a reference-encoded file equals the source PCM
    bit-for-bit, and the reference's decode of our fixed-predictor
    streams equals its decode of its own encode of the same source
    (this build's raw-flac pipeline repeats output 5x on ALL inputs,
    which the equal-comparison normalizes)."""

    def test_decode_reference_flac(self, wav48, tmp_path):
        enc = str(tmp_path / "ref.flac")
        ref_run(["-i", wav48, "-c:a", "flac", enc])
        srcpcm = str(tmp_path / "src.pcm")
        ref_run(["-i", wav48, "-f", "s16le", srcpcm])
        ourpcm = str(tmp_path / "our.pcm")
        from libav_tpu.tools import avconv
        assert avconv.main(["-y", "-v", "error", "-i", enc,
                            "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(srcpcm, "<i2")
        b = np.fromfile(ourpcm, "<i2")
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)

    def test_encode_conformance(self, wav48, tmp_path):
        from libav_tpu.tools import avconv
        ours = str(tmp_path / "our.flac")
        assert avconv.main(["-y", "-v", "error", "-i", wav48,
                            "-c:a", "flac", ours]) == 0
        theirs = str(tmp_path / "ref.flac")
        ref_run(["-i", wav48, "-c:a", "flac", theirs])
        a = ref_run(["-i", theirs, "-f", "s16le", "-"])
        b = ref_run(["-i", ours, "-f", "s16le", "-"])
        assert len(a) > 0 and a == b

    def test_self_roundtrip(self, wav48, tmp_path):
        from libav_tpu.tools import avconv
        ours = str(tmp_path / "our.flac")
        assert avconv.main(["-y", "-v", "error", "-i", wav48,
                            "-c:a", "flac", ours]) == 0
        srcpcm = str(tmp_path / "src.pcm")
        ref_run(["-i", wav48, "-f", "s16le", srcpcm])
        back = str(tmp_path / "back.pcm")
        assert avconv.main(["-y", "-v", "error", "-i", ours,
                            "-f", "s16le", back]) == 0
        np.testing.assert_array_equal(np.fromfile(srcpcm, "<i2"),
                                      np.fromfile(back, "<i2"))


class TestH263:
    """H.263 baseline + H.263+ decode (codecs/h263dec.py):
    reference-encoded streams decode pixel-identically (I/P, INTRADC
    FLC, 22-bit escapes with the -128 extension, 6-bit MV wrap, fixed
    DC scaler 8; PLUSPTYPE with UFEP/OPPTYPE persistence, CPFMT custom
    sizes, custom PCF, RTYPE rounding)."""

    @pytest.mark.parametrize("codec,size,args", [
        ("h263", "176x144", ["-q:v", "4"]),
        ("h263", "176x144", ["-q:v", "8"]),
        ("h263", "352x288", ["-q:v", "6"]),
        ("h263", "128x96", ["-q:v", "5", "-g", "3"]),
        ("h263p", "176x144", ["-q:v", "5"]),
        ("h263p", "192x160", ["-q:v", "6"]),   # CPFMT custom size
        ("h263p", "352x288", ["-q:v", "8"]),
    ])
    def test_decode(self, y4m, tmp_path, codec, size, args):
        ext = "h263" if codec == "h263" else "avi"
        enc = str(tmp_path / f"t.{ext}")
        ref_run(["-i", y4m, "-flags", "+bitexact", "-s", size,
                 "-c:v", codec] + args + [enc])
        a = crc_column(ref_framecrc(enc))
        b = crc_column(our_framecrc(enc))
        assert len(a) > 0 and a == b


class TestFlv:
    """FLV container + FLV1/Sorenson decode (formats/flv.py,
    codecs/h263dec.py FLV1Decoder): reference flv1-in-flv streams decode
    pixel-identically (incl. non-multiple-of-16 sizes and the 7/11-bit
    Sorenson escape); our mp3-in-flv mux is reference-readable."""

    @pytest.mark.parametrize("args", [
        ["-q:v", "5"],
        ["-s", "180x140", "-q:v", "6"],
        ["-s", "160x120", "-q:v", "4", "-g", "3"],
    ])
    def test_decode(self, y4m, tmp_path, args):
        enc = str(tmp_path / "t.flv")
        ref_run(["-i", y4m, "-flags", "+bitexact", "-c:v", "flv1",
                 "-an"] + args + [enc])
        a = crc_column(ref_framecrc(enc))
        b = crc_column(our_framecrc(enc))
        assert len(a) > 0 and a == b

    def test_mux_audio(self, wav48, tmp_path):
        from libav_tpu.tools import avconv
        ours = str(tmp_path / "our.flv")
        assert avconv.main(["-y", "-v", "error", "-i", wav48,
                            "-ar", "44100", "-c:a", "mp3", ours]) == 0
        out = ref_run(["-i", ours, "-f", "s16le", "-"])
        assert len(out) > 4096


class TestMsmpeg4:
    """MSMPEG4 family decode (codecs/msmpeg4dec.py): reference-encoded
    MP42/MP43/WMV1-in-AVI decodes pixel-identically — 6 RL codebooks
    with the level/run-extension escapes, per-version DC codebooks and
    divide-style prediction (v3 <=, v4 <), paired-MV tables, I-frame
    cbp prediction, flipflop rounding, WMV1 scans + stateful ESC3 +
    bitrate-gated per-MB RL selection."""

    @pytest.mark.parametrize("codec,args", [
        ("msmpeg4", ["-q:v", "5"]),
        ("msmpeg4", ["-q:v", "10", "-g", "4"]),
        ("msmpeg4", ["-q:v", "3", "-g", "6"]),
        ("msmpeg4", ["-q:v", "16"]),
        ("msmpeg4v2", ["-q:v", "5"]),
        ("msmpeg4v2", ["-q:v", "8", "-g", "4"]),
        ("wmv1", ["-s", "352x288", "-q:v", "5"]),
        ("wmv1", ["-s", "352x288", "-q:v", "2", "-g", "12"]),
        ("wmv1", ["-s", "352x288", "-q:v", "16", "-g", "4"]),
    ])
    def test_decode(self, y4m, tmp_path, codec, args):
        enc = str(tmp_path / "t.avi")
        ref_run(["-i", y4m, "-flags", "+bitexact", "-c:v", codec]
                + args + [enc])
        a = crc_column(ref_framecrc(enc))
        b = crc_column(our_framecrc(enc))
        assert len(a) > 0 and a == b


class TestCompandParity:
    """af_compand.c transcription vs the reference binary: envelope
    (update_volume), piecewise soft-knee transfer (get_volume), delay
    path with drain.  Tolerance 1 LSB — the reference computes in
    float32 libm (logf/expf), which differs from our float64-then-cast
    path by an occasional ulp."""

    @pytest.fixture(scope="class")
    def tone(self, tmp_path_factory):
        import wave
        p = str(tmp_path_factory.mktemp("compand") / "tone.wav")
        sr = 8000
        n = sr * 2
        t = np.arange(n) / sr
        env = 0.1 + 0.85 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t))
        sig = np.sin(2 * np.pi * 440 * t) * env
        st = np.stack([sig, sig * 0.6], -1)
        s16 = np.clip(np.rint(st * 32767), -32768, 32767
                      ).astype(np.int16)
        with wave.open(p, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(s16.tobytes())
        return p

    @pytest.mark.parametrize("af", [
        "compand",
        "compand=attacks=0.01|0.01:decays=0.1|0.1:"
        "points=-80/-80|-20/-10|0/-5:gain=2",
        "compand=attacks=0.05:decays=0.2:"
        "points=-60/-60|-30/-15|0/-10:soft-knee=6",
        "compand=attacks=0.02:decays=0.15:"
        "points=-70/-70|-25/-12|0/-6:delay=0.05",
        "compand=attacks=0.1|0.1:decays=0.3|0.3:"
        "points=-70/-70|-30/-20|0/-8:volume=-20",
        "compand=delay=0.1",
    ])
    def test_compand(self, tone, tmp_path, af):
        from tests.fate_util import ref_run
        from libav_tpu.tools import avconv
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", tone, "-af", af, "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-v", "error", "-i", tone, "-af", af,
                            "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, np.int16)
        b = np.fromfile(ourpcm, np.int16)
        assert a.size == b.size and a.size > 0
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1, f"max diff {d.max()}, {np.sum(d > 1)} >1"


class TestFramepackParity:
    """vf_framepack.c — all five packing modes byte-identical through
    -filter_complex with two inputs."""

    @pytest.mark.parametrize("mode",
                             ["sbs", "tab", "lines", "columns",
                              "frameseq"])
    def test_framepack(self, y4m, tmp_path, mode):
        from tests.fate_util import ref_run
        from libav_tpu.tools import avconv
        flip = str(tmp_path / "flip.y4m")
        ref_run(["-i", y4m, "-vf", "vflip", flip])
        fc = f"[0:v][1:v]framepack=format={mode}"
        refout = str(tmp_path / "ref.raw")
        ourout = str(tmp_path / "our.raw")
        ref_run(["-i", y4m, "-i", flip, "-filter_complex", fc,
                 "-f", "rawvideo", refout])
        assert avconv.main(["-y", "-v", "error", "-i", y4m, "-i", flip,
                            "-filter_complex", fc, "-f", "rawvideo",
                            ourout]) == 0
        a = np.fromfile(refout, np.uint8)
        b = np.fromfile(ourout, np.uint8)
        assert a.size == b.size and a.size > 0
        np.testing.assert_array_equal(a, b)


class TestSourceParity:
    """Generator sources vs the reference: color (CCIR limited-range
    fill) and rgbtestsrc (gradient bands) byte-identical."""

    def test_color(self, tmp_path):
        from tests.fate_util import ref_run
        from libav_tpu.filters.graph import get_filter
        refout = str(tmp_path / "ref.raw")
        ref_run(["-filter_complex", "color=color=red:size=64x48",
                 "-t", "0.08", "-pix_fmt", "yuv420p", "-f", "rawvideo",
                 refout])
        f = next(get_filter("color")("color=red:size=64x48").generate())
        ours = np.concatenate([np.asarray(p).ravel() for p in f.planes])
        ref = np.fromfile(refout, np.uint8)
        np.testing.assert_array_equal(ours, ref[:ours.size])

    def test_rgbtestsrc(self, tmp_path):
        from tests.fate_util import ref_run
        from libav_tpu.filters.graph import get_filter
        refout = str(tmp_path / "ref.raw")
        ref_run(["-filter_complex", "rgbtestsrc=size=64x48",
                 "-t", "0.08", "-pix_fmt", "rgb24", "-f", "rawvideo",
                 refout])
        f = next(get_filter("rgbtestsrc")("size=64x48").generate())
        ours = np.asarray(f.planes[0]).ravel()
        ref = np.fromfile(refout, np.uint8)
        np.testing.assert_array_equal(ours, ref[:ours.size])


class TestFragmentedMP4:
    """Fragmented MP4 (moof/tfhd/trun/tfdt) + edit lists — VERDICT r3
    missing #4; reference mov.c:872 mov_read_moof, :3129 mov_read_elst.
    The reference muxes one source both flat and fragmented; our demux
    of the fmp4 must decode byte-identically to the flat twin."""

    @pytest.mark.parametrize("movflags", [
        "frag_keyframe+empty_moov",
        "frag_keyframe+empty_moov+default_base_moof",
        "frag_keyframe",                       # moov samples + moofs
    ])
    def test_fmp4_matches_flat(self, y4m, tmp_path, movflags):
        flat = str(tmp_path / "flat.mp4")
        frag = str(tmp_path / "frag.mp4")
        enc = ["-i", y4m, "-c:v", "mpeg4", "-g", "3", "-q:v", "5"] + \
            BITEXACT
        ref_run(enc + [flat])
        ref_run(enc + ["-movflags", movflags, frag])
        ours_flat = our_framecrc(flat)
        ours_frag = our_framecrc(frag)
        assert ours_frag == ours_flat
        # and the flat decode is honest vs the reference decoder
        assert crc_column(ours_flat) == crc_column(ref_framecrc(flat))

    def test_fmp4_h264_avcc(self, y4m, tmp_path):
        """h264 track: extradata from moov only (empty_moov), samples
        in moofs, through the mp4toannexb BSF."""
        import tempfile
        from libav_tpu.tools import avconv
        es = str(tmp_path / "t.h264")
        assert avconv.main(["-y", "-i", y4m, "-c:v", "h264",
                            "-qp", "22", "-f", "h264", es]) == 0
        frag = str(tmp_path / "frag.mp4")
        flat = str(tmp_path / "flat.mp4")
        ref_run(["-framerate", "25", "-i", es, "-c:v", "copy", flat])
        ref_run(["-framerate", "25", "-i", es, "-c:v", "copy",
                 "-movflags", "frag_keyframe+empty_moov", frag])
        assert crc_column(our_framecrc(frag)) == \
            crc_column(our_framecrc(flat))
        assert crc_column(our_framecrc(flat)) == \
            crc_column(ref_framecrc(flat))

    def test_elst_timestamps(self, y4m, tmp_path):
        """B-frames in mp4: the reference writes an edts/elst (negative
        start_dts, movenc.c:1577) — our demux must shift the dts
        timeline exactly as the reference's own demuxer does (full
        framecrc line compare incl. dts/pts columns)."""
        path = str(tmp_path / "b.mp4")
        ref_run(["-i", y4m, "-c:v", "mpeg4", "-bf", "2", "-g", "6",
                 "-q:v", "5"] + BITEXACT + [path])
        assert b"elst" in open(path, "rb").read()
        ours = our_framecrc(path)
        ref = ref_framecrc(path)
        assert ours.strip().splitlines()[1:] == \
            ref.strip().splitlines()[1:]


class TestMatroskaCues:
    """Our mkv must carry a Cues index the reference demuxer seeks by
    (VERDICT r3 missing #7; reference matroskaenc.c:415 mkv_write_cues,
    matroskadec.c matroska_read_seek uses the cue index)."""

    def _our_mkv(self, y4m, tmp_path, n=24, gop=6):
        import tempfile
        from libav_tpu.tools import avconv
        src = str(tmp_path / "long.y4m")
        from tests.fate_util import write_y4m
        write_y4m(src, w=96, h=80, n=n)
        out = str(tmp_path / "ours.mkv")
        assert avconv.main(["-y", "-i", src, "-c:v", "mpeg4",
                            "-g", str(gop), "-q:v", "5", out]) == 0
        return out

    def test_ref_demuxes_full(self, y4m, tmp_path):
        out = self._our_mkv(y4m, tmp_path)
        lines = ref_framecrc(out).strip().splitlines()
        assert len([ln for ln in lines if ln and ln[0].isdigit()]) == 24

    def test_ref_seeks_by_cues(self, y4m, tmp_path):
        out = self._our_mkv(y4m, tmp_path)
        data = open(out, "rb").read()
        assert b"\x1C\x53\xBB\x6B" in data          # Cues element
        assert b"\x11\x4D\x9B\x74" in data          # SeekHead
        # seek to 0.6s @25fps, gop 6 -> keyframe at frame 12 (0.48s)
        got = ref_run(["-ss", "0.6", "-i", out,
                       "-f", "framecrc", "-"]).decode()
        rows = [ln.split(",") for ln in got.strip().splitlines()
                if ln and ln[0].isdigit()]
        assert rows, "reference produced no frames after seek"
        # must start at a mid-file cue point, not frame 0 (a demuxer
        # that can't use the index restarts from the beginning and
        # emits all 24 frames — the observed no-Cues behavior).  The
        # reference lands on the 480ms cue keyframe and trims the 3
        # decoded frames before the 600ms target: 24 - 15 = 9 out.
        n_after = len(rows)
        assert n_after < 24
        assert n_after == 9


class TestMpegTSInterop:
    """The reference demuxes our TS (PCR'd, PSI-retransmitted) and
    decodes every frame (VERDICT r3 missing #7)."""

    def test_ref_demuxes_our_ts(self, y4m, tmp_path):
        from libav_tpu.tools import avconv
        out = str(tmp_path / "ours.ts")
        assert avconv.main(["-y", "-i", y4m, "-c:v", "mpeg2video",
                            "-g", "3", "-q:v", "5", out]) == 0
        lines = [ln for ln in ref_framecrc(out).strip().splitlines()
                 if ln and ln[0].isdigit()]
        assert len(lines) == 6
        # and our decode of our own ts matches the reference's decode
        assert crc_column(our_framecrc(out)) == \
            crc_column(ref_framecrc(out))


class TestAacLtp:
    """AAC LTP (AOT 4) — VERDICT r3 missing #3 tail; reference
    aacdec.c:1156 decode_ltp, :2342 apply_ltp, :2374 update_ltp.
    Our -ltp streams must decode identically in the reference."""

    @pytest.mark.parametrize("mono", [True, False])
    def test_ltp_cross(self, wav48, tmp_path, mono):
        from libav_tpu.tools import avconv
        enc = str(tmp_path / "t.aac")
        args = ["-y", "-i", wav48, "-c:a", "aac", "-ltp", "1"]
        if mono:
            args += ["-af", "channelmap=0"]
        assert avconv.main(args + ["-f", "adts", enc]) == 0
        refpcm = str(tmp_path / "ref.pcm")
        ourpcm = str(tmp_path / "our.pcm")
        ref_run(["-i", enc, "-f", "s16le", refpcm])
        assert avconv.main(["-y", "-i", enc, "-f", "s16le", ourpcm]) == 0
        a = np.fromfile(refpcm, dtype="<i2").astype(int)
        b = np.fromfile(ourpcm, dtype="<i2").astype(int)
        assert a.size == b.size and a.size > 0
        assert np.abs(a - b).max() <= 1
        # guard against a vacuous pass: the stream must really carry
        # applied LTP data (decode again and inspect the counter)
        from libav_tpu.codecs import find_decoder
        from libav_tpu.formats import FormatContext
        ic = FormatContext.open_input(enc)
        dec = find_decoder("aac")(ic.streams[0].codecpar).open()
        dec.decode_all(list(ic.packets()))
        assert dec.ltp_frames > 0
