import numpy as np
import pytest

from weaver_spark.codec import decode_image, encode_image, phash64, psnr
from weaver_spark.webgen import gen_pixels


@pytest.mark.parametrize("i", [0, 3, 7])
def test_png_roundtrip_lossless(i):
    px = gen_pixels(f"img_{i:08d}")
    assert (decode_image(encode_image(px, "png")) == px).all()


@pytest.mark.parametrize("i", [1, 5, 9])
def test_lossy_roundtrip_psnr_above_40db(i):
    """BASELINE.json input_hint: decoded-pixel PSNR >= 40 dB for lossy."""
    px = gen_pixels(f"img_{i:08d}")
    dec = decode_image(encode_image(px, "jpeg"))
    assert dec.shape == px.shape
    p = psnr(px, dec)
    assert 40.0 <= p < 60.0  # genuinely lossy but above the gate


def test_phash_deterministic_and_locality():
    px = gen_pixels("img_00000002")
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # mild noise keeps the hash close; unrelated image is far
    noisy = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    other = gen_pixels("img_00000044")
    d_noisy = bin(h1 ^ phash64(noisy)).count("1")
    d_other = bin((h1 ^ phash64(other)) & ((1 << 64) - 1)).count("1")
    assert d_noisy <= 8
    assert d_other > 10


def test_phash_is_signed_int64():
    for i in range(20):
        h = phash64(gen_pixels(f"img_{i:08d}"))
        assert -(1 << 63) <= h < (1 << 63)


def test_phash_float32_matches_float64_reference():
    """The production phash runs in float32 (DRAM-bandwidth win in the
    fetch UDF); assert zero bit flips vs a float64 re-derivation across
    the generator's full side range (32..96) and both fmts' pixel paths."""
    from weaver_spark.codec import _DCT_M, _DCT_N, quantize_lossy

    def phash_f64(pixels):
        g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        h, w = g.shape
        ph, pw = (-h) % _DCT_N, (-w) % _DCT_N
        if ph or pw:
            g = np.pad(g, ((0, ph), (0, pw)), mode="edge")
        bh, bw = g.shape[0] // _DCT_N, g.shape[1] // _DCT_N
        small = g.reshape(_DCT_N, bh, _DCT_N, bw).mean(axis=(1, 3))
        m8 = _DCT_M[:8]
        tmp = np.einsum("ij,jk->ik", m8, small, optimize=False)
        dct = np.einsum("ik,lk->il", tmp, m8, optimize=False)
        block = dct.flatten()[1:]
        med = np.median(block)
        val = 0
        for b in block > med:
            val = (val << 1) | int(b)
        return val - (1 << 64) if val >= 1 << 63 else val

    for i in range(40):  # covers all 5 sides, png and jpeg ids
        px = gen_pixels(f"img_{i:08d}")
        assert phash64(px) == phash_f64(px)
        q = quantize_lossy(px)
        assert phash64(q) == phash_f64(q)


def test_lossy_decode_equals_quantize():
    """gen_payload hashes post-quantization pixels WITHOUT a decode pass;
    sound because the lossy container is quantize-then-lossless-pack."""
    from weaver_spark.codec import quantize_lossy

    for i in (1, 13, 29):
        px = gen_pixels(f"img_{i:08d}")
        assert (decode_image(encode_image(px, "jpeg")) == quantize_lossy(px)).all()
