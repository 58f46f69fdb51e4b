"""H.264 kernel tests — checkasm pattern: jitted vs golden, plus spec
sanity (round trips through the integer transform)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libav_tpu.ops import h264mc, h264pred, h264transform as ht
from libav_tpu.ops.mc import pad_plane_ref


class TestTransform:
    def test_idct_matches_ref(self):
        rng = np.random.default_rng(0)
        blocks = rng.integers(-512, 512, (64, 4, 4)).astype(np.int32)
        ref = ht.idct4x4_ref(blocks)
        got = np.asarray(ht.idct4x4(jnp.asarray(blocks)))
        np.testing.assert_array_equal(ref, got)

    def test_fdct_matches_ref(self):
        rng = np.random.default_rng(1)
        blocks = rng.integers(-255, 256, (64, 4, 4)).astype(np.int32)
        np.testing.assert_array_equal(
            ht.fdct4x4_ref(blocks),
            np.asarray(ht.fdct4x4(jnp.asarray(blocks))))

    @pytest.mark.parametrize("qp", [0, 10, 20, 26, 35, 51])
    def test_quant_dequant_idct_roundtrip(self, qp):
        """fdct -> quant -> dequant -> idct must approximate input within
        the quantizer step size."""
        rng = np.random.default_rng(qp)
        resid = rng.integers(-100, 101, (32, 4, 4)).astype(np.int32)
        w = ht.fdct4x4_ref(resid)
        lv = ht.quant4x4_ref(w, qp, intra=True)
        deq = ht.dequant4x4_ref(lv, qp)
        rec = ht.idct4x4_ref(deq)
        step = (2 ** (qp / 6.0))
        err = np.abs(rec - resid)
        assert err.mean() <= max(1.0, step), f"qp {qp}: mean {err.mean()}"

    @pytest.mark.parametrize("qp", [0, 12, 26, 40])
    def test_quant_jax_matches_ref(self, qp):
        rng = np.random.default_rng(2)
        w = rng.integers(-20000, 20000, (32, 4, 4)).astype(np.int32)
        np.testing.assert_array_equal(
            ht.quant4x4_ref(w, qp, True),
            np.asarray(ht.quant4x4(jnp.asarray(w), qp, True)))
        np.testing.assert_array_equal(
            ht.dequant4x4_ref(w // 64, qp),
            np.asarray(ht.dequant4x4(jnp.asarray(w // 64), qp)))

    def test_luma_dc_jax_matches_ref(self):
        rng = np.random.default_rng(3)
        dc = rng.integers(-200, 200, (16, 4, 4)).astype(np.int32)
        for qp in (0, 10, 26, 43):
            np.testing.assert_array_equal(
                ht.luma_dc_dequant_ref(dc, qp),
                np.asarray(ht.luma_dc_transform(jnp.asarray(dc), qp)))

    def test_chroma_dc_jax_matches_ref(self):
        rng = np.random.default_rng(4)
        dc = rng.integers(-200, 200, (16, 2, 2)).astype(np.int32)
        for qp in (0, 10, 26, 39):
            np.testing.assert_array_equal(
                ht.chroma_dc_transform_ref(dc, qp),
                np.asarray(ht.chroma_dc_transform(jnp.asarray(dc), qp)))


class TestQpelMC:
    def test_all_16_phases_match_ref(self):
        rng = np.random.default_rng(5)
        plane = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        padded = pad_plane_ref(plane)
        B = 16
        xs = np.full(B, 16, dtype=np.int32)
        ys = np.full(B, 16, dtype=np.int32)
        mvx = np.array([(i % 4) + 4 for i in range(B)], dtype=np.int32)
        mvy = np.array([(i // 4) - 8 for i in range(B)], dtype=np.int32)
        ref = h264mc.qpel_mc_ref(padded, xs, ys, mvx, mvy, 16)
        got = np.asarray(h264mc.qpel_mc(jnp.asarray(padded), jnp.asarray(xs),
                                        jnp.asarray(ys), jnp.asarray(mvx),
                                        jnp.asarray(mvy), 16))
        np.testing.assert_array_equal(ref, got)

    def test_integer_mv_is_copy(self):
        rng = np.random.default_rng(6)
        plane = rng.integers(0, 256, (48, 48)).astype(np.uint8)
        padded = pad_plane_ref(plane)
        xs = np.array([8], dtype=np.int32)
        ys = np.array([8], dtype=np.int32)
        out = h264mc.qpel_mc_ref(padded, xs, ys,
                                 np.array([8], np.int32),
                                 np.array([-4], np.int32), 16)
        np.testing.assert_array_equal(out[0], plane[7:23, 10:26])

    def test_chroma_mc_matches_ref(self):
        rng = np.random.default_rng(7)
        plane = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        padded = pad_plane_ref(plane)
        B = 8
        xs = rng.integers(0, 24, B).astype(np.int32)
        ys = rng.integers(0, 24, B).astype(np.int32)
        mvx = rng.integers(-30, 31, B).astype(np.int32)
        mvy = rng.integers(-30, 31, B).astype(np.int32)
        ref = h264mc.chroma_mc_ref(padded, xs, ys, mvx, mvy, 8)
        got = np.asarray(h264mc.chroma_mc(jnp.asarray(padded),
                                          jnp.asarray(xs), jnp.asarray(ys),
                                          jnp.asarray(mvx), jnp.asarray(mvy),
                                          8))
        np.testing.assert_array_equal(ref, got)


class TestIntraPred:
    def _neighbors(self, B, seed=0):
        rng = np.random.default_rng(seed)
        top = rng.integers(0, 256, (B, 16)).astype(np.int32)
        left = rng.integers(0, 256, (B, 16)).astype(np.int32)
        tl = rng.integers(0, 256, B).astype(np.int32)
        return top, left, tl

    def test_pred16x16_all_modes(self):
        B = 12
        top, left, tl = self._neighbors(B)
        mode = np.array([0, 1, 2, 3] * 3, dtype=np.int32)
        at = np.ones(B, dtype=bool)
        al = np.ones(B, dtype=bool)
        ref = h264pred.pred16x16_ref(mode, top, left, tl, at, al)
        got = np.asarray(h264pred.pred16x16(
            jnp.asarray(mode), jnp.asarray(top), jnp.asarray(left),
            jnp.asarray(tl), jnp.asarray(at), jnp.asarray(al)))
        np.testing.assert_array_equal(ref, got)

    def test_pred16x16_dc_availability(self):
        B = 4
        top, left, tl = self._neighbors(B, 1)
        mode = np.full(B, 2, dtype=np.int32)
        at = np.array([True, True, False, False])
        al = np.array([True, False, True, False])
        ref = h264pred.pred16x16_ref(mode, top, left, tl, at, al)
        got = np.asarray(h264pred.pred16x16(
            jnp.asarray(mode), jnp.asarray(top), jnp.asarray(left),
            jnp.asarray(tl), jnp.asarray(at), jnp.asarray(al)))
        np.testing.assert_array_equal(ref, got)
        assert got[3, 0, 0] == 128   # nothing available -> mid gray

    def test_pred8x8_chroma_all_modes(self):
        B = 8
        rng = np.random.default_rng(2)
        top = rng.integers(0, 256, (B, 8)).astype(np.int32)
        left = rng.integers(0, 256, (B, 8)).astype(np.int32)
        tl = rng.integers(0, 256, B).astype(np.int32)
        mode = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int32)
        at = np.array([True] * 6 + [False] * 2)
        al = np.array([True, True, False, True] * 2)
        ref = h264pred.pred8x8_chroma_ref(mode, top, left, tl, at, al)
        got = np.asarray(h264pred.pred8x8_chroma(
            jnp.asarray(mode), jnp.asarray(top), jnp.asarray(left),
            jnp.asarray(tl), jnp.asarray(at), jnp.asarray(al)))
        np.testing.assert_array_equal(ref, got)


class TestDeblock:
    def test_edge_filter_matches_ref(self):
        from libav_tpu.ops import h264deblock as db
        rng = np.random.default_rng(8)
        for qp in (20, 30, 40, 51):
            lines = rng.integers(0, 256, (64, 8)).astype(np.int32)
            # make half the edges smooth so the filter activates
            lines[::2] = lines[::2, :1] + rng.integers(-3, 4, (32, 8))
            lines = np.clip(lines, 0, 255)
            bs = rng.integers(0, 5, 64).astype(np.int32)
            ref = db.filter_edge_ref(lines, qp, bs, chroma=False)
            got = np.asarray(db.filter_edge(jnp.asarray(lines), qp,
                                            jnp.asarray(bs), chroma=False))
            np.testing.assert_array_equal(ref, got)

    def test_chroma_edge_filter_matches_ref(self):
        from libav_tpu.ops import h264deblock as db
        rng = np.random.default_rng(9)
        lines = np.clip(rng.integers(0, 256, (32, 1)) +
                        rng.integers(-4, 5, (32, 8)), 0, 255).astype(np.int32)
        bs = rng.integers(0, 5, 32).astype(np.int32)
        ref = db.filter_edge_ref(lines, 30, bs, chroma=True)
        got = np.asarray(db.filter_edge(jnp.asarray(lines), 30,
                                        jnp.asarray(bs), chroma=True))
        np.testing.assert_array_equal(ref, got)

    def test_flat_edge_untouched_when_bs0(self):
        from libav_tpu.ops import h264deblock as db
        lines = np.full((4, 8), 100, dtype=np.int32)
        bs = np.zeros(4, dtype=np.int32)
        out = db.filter_edge_ref(lines, 30, bs)
        np.testing.assert_array_equal(out, lines)


class TestDeblockExact:
    """checkasm pattern: wavefront deblock kernel vs the scalar
    raster-order golden (spec §8.7 MB-serial semantics)."""

    def test_matches_serial_golden(self):
        import numpy as np
        from libav_tpu.ops.h264deblock import (deblock_frame_exact_jit,
                                               deblock_frame_exact_ref)
        rng = np.random.default_rng(123)
        for (mb_w, mb_h, a_off, b_off) in ((4, 3, 0, 0), (6, 2, 2, -2),
                                           (2, 5, -4, 4)):
            H, W = mb_h * 16, mb_w * 16
            yp = rng.integers(0, 256, (H, W)).astype(np.int32)
            up = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
            vp = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
            nmb = mb_w * mb_h
            intra = rng.random(nmb) < 0.4
            qp = rng.integers(18, 48, nmb).astype(np.int32)
            nnz4 = rng.integers(0, 2, (4 * mb_h, 4 * mb_w)).astype(np.int32)
            mv = rng.integers(-20, 20, (nmb, 2)).astype(np.int32)
            got = [np.asarray(p) for p in
                   deblock_frame_exact_jit(mb_w, mb_h, a_off, b_off)(
                       yp, up, vp, intra, qp, nnz4, mv)]
            ref = deblock_frame_exact_ref(yp, up, vp, intra, qp, nnz4,
                                          mv, mb_w, mb_h, a_off, b_off)
            for g, r in zip(got, ref):
                np.testing.assert_array_equal(g, r)


class TestPallasEdgeFilter:
    """The Pallas luma edge-filter kernel (production path on TPU for
    wave-scale batches) must be bit-identical to the golden filter —
    interpret mode exercises the kernel body on CPU."""

    def test_kernel_matches_ref(self):
        import numpy as np
        from libav_tpu.ops.h264deblock import (_filter_edge_qp_pallas,
                                               filter_edge_ref)
        rng = np.random.default_rng(11)
        B = 700                      # deliberately not lane-aligned
        lines = rng.integers(0, 256, (B, 8)).astype(np.int32)
        lines[::2] = np.clip(lines[::2, :1] +
                             rng.integers(-6, 7, (B - B // 2, 8)), 0, 255)
        bs = rng.integers(0, 5, (B,)).astype(np.int32)
        for qp in (20, 30, 44):
            for a_off, b_off in ((0, 0), (4, -2)):
                import jax.numpy as jnp
                got = np.asarray(_filter_edge_qp_pallas(
                    jnp.asarray(lines), jnp.asarray(
                        np.full((B,), qp, np.int32)),
                    jnp.asarray(bs), a_off, b_off, interpret=True))
                qa = int(np.clip(qp + a_off, 0, 51))
                qb = int(np.clip(qp + b_off, 0, 51))
                from libav_tpu.ops.h264deblock import ALPHA, BETA
                # golden path takes one qp: emulate offsets by filtering
                # with the production XLA path instead
                from libav_tpu.ops.h264deblock import filter_edge_qp
                import libav_tpu.ops.h264deblock as D
                orig = D._on_tpu
                D._on_tpu = lambda: False
                try:
                    want = np.asarray(filter_edge_qp(
                        jnp.asarray(lines),
                        jnp.asarray(np.full((B,), qp, np.int32)),
                        jnp.asarray(bs), False, a_off, b_off))
                finally:
                    D._on_tpu = orig
                np.testing.assert_array_equal(got, want)
        # and against the true golden scalar reference at zero offsets
        from libav_tpu.ops.h264deblock import filter_edge_ref
        import jax.numpy as jnp
        got = np.asarray(_filter_edge_qp_pallas(
            jnp.asarray(lines),
            jnp.asarray(np.full((B,), 30, np.int32)),
            jnp.asarray(bs), 0, 0, interpret=True))
        want = filter_edge_ref(lines, 30, bs)
        np.testing.assert_array_equal(got, want)
