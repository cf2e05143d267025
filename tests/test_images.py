"""Codec invariants: PNG lossless roundtrip, DCTQ PSNR>=40dB, phash
stability — the input_hint per-row invariants (BASELINE.json)."""

import numpy as np
import pytest

from film_crawler_spark.functions.images import (
    dctq_decode,
    dctq_encode,
    decode_image,
    hamming64,
    phash64,
    png_decode,
    png_encode,
    psnr,
)


def _natural(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.sin(xx / 11.0) * 60 + np.cos(yy / 7.0) * 50 + 128
    img = np.stack([base, base * 0.8 + 20, 255 - base], -1) + rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(24, 32), (33, 47), (8, 8), (1, 1), (97, 5)])
def test_png_roundtrip_exact(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


@pytest.mark.parametrize("shape", [(24, 32), (33, 47), (72, 96)])
def test_dctq_psnr_above_40(shape):
    img = _natural(*shape, seed=shape[0])
    dec = dctq_decode(dctq_encode(img, q=2.0))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0


def test_dctq_psnr_noise_worst_case():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    assert psnr(img, dctq_decode(dctq_encode(img, q=2.0))) >= 40.0


def test_decode_dispatch():
    img = _natural(16, 16, 3)
    px, fmt = decode_image(png_encode(img))
    assert fmt == "png" and np.array_equal(px, img)
    px2, fmt2 = decode_image(dctq_encode(img))
    assert fmt2 == "dctq" and px2.shape == img.shape
    with pytest.raises(ValueError):
        decode_image(b"garbage-bytes")


def test_phash_deterministic_and_robust():
    img = _natural(64, 64, 11)
    h1, h2 = phash64(img), phash64(img.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    # lossy recompression should stay near
    lossy = dctq_decode(dctq_encode(img, q=2.0))
    assert hamming64(h1, phash64(lossy)) <= 10
    # a different image should be far
    other = _natural(64, 64, 99)
    assert hamming64(h1, phash64(other)) > 10
