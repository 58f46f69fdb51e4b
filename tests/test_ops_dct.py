"""DCT/IDCT kernel tests — the checkasm pattern (SURVEY.md §4 tier 3):
every jitted kernel vs its NumPy golden reference, plus IEEE-1180-style
accuracy bounds vs the double-precision transform (mirrors reference
libavcodec/tests/dct.c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libav_tpu.ops import fdct, idct, quant


def ieee1180_blocks(n, lo=-256, hi=255, seed=0):
    """Random pixel blocks -> valid DCT coefficient blocks (the IEEE 1180
    test methodology used by libavcodec/tests/dct.c)."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(lo, hi + 1, size=(n, 8, 8)).astype(np.float64)
    C = idct.idct_matrix_float()
    coeffs = np.round(C @ pix @ C.T).clip(-2048, 2047).astype(np.int32)
    return pix, coeffs


class TestIdctInt:
    def test_matches_golden_ref(self):
        _, coeffs = ieee1180_blocks(64)
        ref = idct.idct8x8_int_ref(coeffs)
        out = np.asarray(jax.jit(idct.idct8x8_int)(jnp.asarray(coeffs)))
        np.testing.assert_array_equal(ref, out)

    def test_batch_size_invariance(self):
        """Determinism across batch sizes — our analogue of FATE's
        same-checksum-across-thread-counts requirement."""
        _, coeffs = ieee1180_blocks(33)
        full = np.asarray(idct.idct8x8_int(jnp.asarray(coeffs)))
        a = np.asarray(idct.idct8x8_int(jnp.asarray(coeffs[:10])))
        b = np.asarray(idct.idct8x8_int(jnp.asarray(coeffs[10:])))
        np.testing.assert_array_equal(full, np.concatenate([a, b]))

    def test_ieee1180_accuracy(self):
        """IEEE 1180 bounds: peak error <= 1, mean error <= 0.0015,
        pmse <= 0.06 per coefficient position."""
        pix, coeffs = ieee1180_blocks(10000)
        exact = idct.idct8x8_float_ref(coeffs)
        got = idct.idct8x8_int_ref(coeffs).astype(np.float64)
        ref_rounded = np.clip(np.round(exact), -256, 255)
        got = np.clip(got, -256, 255)
        err = got - ref_rounded
        assert np.abs(err).max() <= 1, "peak error"
        assert np.abs(err.mean()) <= 0.0015, "overall mean error"
        pmse = (err ** 2).mean(axis=0)
        assert pmse.max() <= 0.06, f"pmse {pmse.max()}"

    def test_dc_only(self):
        blocks = np.zeros((3, 8, 8), dtype=np.int32)
        blocks[0, 0, 0] = 8 * 100   # DC scaled x8 -> flat 100
        blocks[1, 0, 0] = 8 * 255
        blocks[2, 0, 0] = -8 * 100
        out = idct.idct8x8_int_ref(blocks)
        np.testing.assert_array_equal(out[0], np.full((8, 8), 100))
        np.testing.assert_array_equal(out[1], np.full((8, 8), 255))
        np.testing.assert_array_equal(out[2], np.full((8, 8), -100))

    def test_idct_put_clamps(self):
        # DC must stay inside the int16 row range (the reference's
        # simple_idct stores rows in int16_t and wraps beyond it); 4000
        # is in-range and saturates every pixel after the +128 bias
        blocks = np.zeros((1, 8, 8), dtype=np.int32)
        blocks[0, 0, 0] = 4000
        out = np.asarray(idct.idct_put(jnp.asarray(blocks), bias=128))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out[0], np.full((8, 8), 255))

    def test_simple_idct_int16_wrap_semantics(self):
        # out-of-range DC wraps exactly like the reference's int16_t rows
        blocks = np.zeros((1, 8, 8), dtype=np.int32)
        blocks[0, 0, 0] = 8 * 2000      # wraps: (16000<<3)&0xffff -> -3072
        ref = idct.idct8x8_int_ref(blocks)
        got = np.asarray(jax.jit(idct.idct8x8_int)(jnp.asarray(blocks)))
        np.testing.assert_array_equal(ref, got)
        assert ref[0, 0, 0] < 0


class TestFdctInt:
    def test_matches_golden_ref(self):
        rng = np.random.default_rng(1)
        pix = rng.integers(-255, 256, size=(64, 8, 8)).astype(np.int32)
        ref = fdct.fdct8x8_int_ref(pix)
        out = np.asarray(jax.jit(fdct.fdct8x8_int)(jnp.asarray(pix)))
        np.testing.assert_array_equal(ref, out)

    def test_accuracy_vs_float(self):
        rng = np.random.default_rng(2)
        pix = rng.integers(-255, 256, size=(1000, 8, 8)).astype(np.int32)
        exact = fdct.fdct8x8_float_ref(pix)
        got = fdct.fdct8x8_int_ref(pix)
        assert np.abs(got - exact).max() < 8, "fdct error must stay below 1 unit at x8 scale"

    def test_fdct_idct_roundtrip(self):
        """encode(decode) loop: fdct -> /8 -> idct must reproduce pixels
        within +-1 (lossless path of the codec pipeline)."""
        rng = np.random.default_rng(3)
        pix = rng.integers(-128, 128, size=(500, 8, 8)).astype(np.int32)
        coeffs = fdct.fdct8x8_int_ref(pix)
        # undo the x8 fdct scale with rounding
        coeffs8 = np.sign(coeffs) * ((np.abs(coeffs) + 4) >> 3)
        rec = idct.idct8x8_int_ref(coeffs8.astype(np.int32))
        assert np.abs(rec - pix).max() <= 2


class TestQuant:
    def test_zigzag_is_permutation(self):
        z = quant.zigzag_scan()
        assert sorted(z.tolist()) == list(range(64))
        # spot check the canonical start of the zigzag
        assert z[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]

    def test_alternate_scan_is_permutation(self):
        a = quant.alternate_scan()
        assert sorted(a.tolist()) == list(range(64))

    def test_dezigzag(self):
        scan_order = np.arange(64, dtype=np.int32)[None]  # coeff k = k
        block = quant.dezigzag(scan_order)
        z = quant.zigzag_scan()
        flat = block.reshape(64)
        # raster position z[k] must hold value k
        for k in range(64):
            assert flat[z[k]] == k

    def test_jpeg_quant_roundtrip(self):
        rng = np.random.default_rng(4)
        qmat = rng.integers(1, 32, size=64).astype(np.int32)
        coeffs = rng.integers(-1000, 1000, size=(100, 64)).astype(np.int32)
        q = quant.jpeg_quant_ref(coeffs, qmat)
        deq = q * qmat
        assert np.abs(deq - coeffs).max() <= qmat.max() // 2 + 1

    def test_jpeg_quant_jax_matches_ref(self):
        rng = np.random.default_rng(5)
        qmat = rng.integers(1, 64, size=64).astype(np.int32)
        coeffs = rng.integers(-2000, 2000, size=(64, 64)).astype(np.int32)
        ref = quant.jpeg_quant_ref(coeffs, qmat)
        out = np.asarray(quant.jpeg_quant(jnp.asarray(coeffs), qmat))
        np.testing.assert_array_equal(ref, out)

    def test_mpeg1_dequant_intra_jax_matches_ref(self):
        rng = np.random.default_rng(6)
        qmat = rng.integers(1, 64, size=64).astype(np.int32)
        coeffs = rng.integers(-255, 256, size=(32, 64)).astype(np.int32)
        qscale = np.full((32,), 8, dtype=np.int32)
        ref = quant.mpeg1_dequant_intra_ref(coeffs, qscale, qmat)
        out = np.asarray(quant.mpeg1_dequant_intra(jnp.asarray(coeffs), qscale, qmat))
        np.testing.assert_array_equal(ref, out)

    def test_mpeg1_dequant_oddification(self):
        # every nonzero AC output must be odd (mismatch control)
        rng = np.random.default_rng(7)
        qmat = np.full(64, 16, dtype=np.int32)
        coeffs = rng.integers(-255, 256, size=(16, 64)).astype(np.int32)
        out = quant.mpeg1_dequant_inter_ref(coeffs, 6, qmat)
        nz = out[coeffs != 0]
        nz = nz[np.abs(nz) < 2047]
        assert np.all(np.abs(nz) % 2 == 1)

    def test_mpeg2_mismatch_control(self):
        blocks = jnp.zeros((2, 8, 8), dtype=jnp.int32)
        blocks = blocks.at[0, 0, 0].set(2)   # even sum -> toggle [7,7]
        blocks = blocks.at[1, 0, 0].set(3)   # odd sum -> untouched
        out = np.asarray(quant.mpeg2_mismatch_control(blocks))
        assert out[0, 7, 7] == 1
        assert out[1, 7, 7] == 0

    def test_mpeg_quant_dequant_consistency(self):
        """Encoder quant then decoder dequant must approximate the input."""
        rng = np.random.default_rng(8)
        qmat = np.full(64, 16, dtype=np.int32)
        pix = rng.integers(-128, 128, size=(64, 8, 8)).astype(np.int32)
        coeffs = fdct.fdct8x8_int_ref(pix).reshape(64, 64)
        qscale = 4
        lvl = quant.mpeg_quant_ref(coeffs, qscale, qmat, intra=True)
        deq = np.asarray(quant.mpeg1_dequant_intra(
            jnp.asarray(lvl), np.int32(qscale), qmat))
        deq_dc_fixed = deq.copy()
        rec = idct.idct8x8_int_ref(deq_dc_fixed.reshape(64, 8, 8))
        # quantization at qscale 4 keeps error bounded
        assert np.abs(rec - pix).mean() < 6
