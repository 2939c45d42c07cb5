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
