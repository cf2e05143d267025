"""Pure-NumPy image codecs, perceptual hash, and PSNR.

The sandbox has no Pillow/OpenCV, and the reference never decodes images
at all — it streams JPEG bytes straight to disk (reference
spiders.py:2981-2998). The engine's images table (BASELINE.json
input_hint) requires decoded (w, h, fmt) plus a phash and, for lossy
formats, a PSNR>=40dB round-trip invariant — so we carry two codecs:

* ``png``  — a real, spec-conformant subset of PNG (8-bit RGB, zlib,
  scanline filters 0-4 on decode, filter 0 on encode). Lossless: decoded
  pixels are exactly the source array.
* ``dctq`` — a deliberately simple JPEG-class lossy codec: 8x8 blockwise
  DCT-II, uniform quantization, zlib-packed int16 coefficients. Chosen
  because its PSNR is tunable and its arithmetic is exactly reproducible
  across runs/machines (pure float64 NumPy), which a bit-exact baseline
  JPEG would not make any easier without a decoder dependency.

Everything here is plain ndarray-in/ndarray-out so the Spark layer can
wrap it in Arrow-batched pandas UDFs (no per-row Python visible to
Spark; the loops below run per *image*, inside a batch).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
DCTQ_MAGIC = b"DCQ1"

# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit truecolor PNG."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need left-to-right recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG into (h, w, 3) uint8."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bitdepth = coltype = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, coltype = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if bitdepth != 8 or coltype != 2:
        raise ValueError("only 8-bit RGB PNGs supported")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(h, 1 + stride)
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# DCTQ (lossy)
# ---------------------------------------------------------------------------


def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / np.sqrt(2)
    return m * np.sqrt(2.0 / n)


_DCT8 = _dct_mat(8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    H, W = padded.shape
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks, H, W


def dctq_encode(rgb: np.ndarray, q: float = 4.0) -> bytes:
    """Lossy-encode (h, w, 3) uint8. q is the uniform quantization step;
    q=4 keeps PSNR comfortably above 40 dB on natural-ish content."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("dctq_encode expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    coefs = []
    for c in range(3):
        blocks, _, _ = _blockify(rgb[:, :, c].astype(np.float64) - 128.0)
        f = _DCT8 @ blocks @ _DCT8.T
        coefs.append(np.round(f / q).astype(np.int16))
    payload = np.stack(coefs).tobytes()
    head = DCTQ_MAGIC + struct.pack(">IIf", w, h, q)
    return head + zlib.compress(payload, 6)


def dctq_decode(data: bytes) -> np.ndarray:
    if data[:4] != DCTQ_MAGIC:
        raise ValueError("not a DCTQ payload")
    w, h, q = struct.unpack(">IIf", data[4:16])
    H, W = h + ((-h) % 8), w + ((-w) % 8)
    arr = np.frombuffer(zlib.decompress(data[16:]), dtype=np.int16)
    arr = arr.reshape(3, H // 8, W // 8, 8, 8).astype(np.float64) * q
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for c in range(3):
        spatial = _DCT8.T @ arr[c] @ _DCT8
        plane = spatial.transpose(0, 2, 1, 3).reshape(H, W) + 128.0
        out[:, :, c] = np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# format dispatch / metrics / phash
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode bytes by sniffing the magic; returns (pixels, fmt)."""
    if data[:8] == PNG_MAGIC:
        return png_decode(data), "png"
    if data[:4] == DCTQ_MAGIC:
        return dctq_decode(data), "dctq"
    raise ValueError("unknown image format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_DCT32 = _dct_mat(32)


def mean_pool_2d(plane: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Resample a 2-D float plane to (oh, ow): area-average when
    shrinking an axis, nearest-neighbor replication when growing one
    (exact for integer factors). Bincount on index grids — an exact
    partition of input pixels — after pre-expanding any growing axis so
    every output cell receives >= 1 input pixel. Without the expansion,
    an input smaller than the target left output cells empty (0.0):
    phash64 on a sub-32px rendition hashed black stripes instead of the
    image (renditions of the SAME picture landed ~28/64 bits apart)."""
    h, w = plane.shape
    if oh > h:
        plane = plane[np.arange(oh) * h // oh, :]
        h = oh
    if ow > w:
        plane = plane[:, np.arange(ow) * w // ow]
        w = ow
    yi = (np.arange(h) * oh // h)[:, None]
    xi = (np.arange(w) * ow // w)[None, :]
    idx = (yi * ow + xi).ravel()
    sums = np.bincount(idx, weights=plane.ravel(), minlength=oh * ow)
    cnts = np.bincount(idx, minlength=oh * ow)
    return (sums / np.maximum(cnts, 1)).reshape(oh, ow)


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 mean-pool resize ->
    32x32 DCT -> top-left 8x8 (skipping DC) -> median threshold.

    Signed int64 so it fits Spark LongType.
    """
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = mean_pool_2d(gray, 32, 32)
    f = _DCT32 @ small @ _DCT32.T
    block = f[:8, :8].ravel()[1:]  # drop DC
    bits = block > np.median(block)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    val <<= 1  # pad to 64 bits
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
