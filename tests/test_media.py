"""Multimodal media operators: resize / embed / frame-sample plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from film_crawler_spark.functions import images as IMG
from film_crawler_spark.operators import media as M
from film_crawler_spark.operators import similarity as SIM


def _rgb(seed: int, h: int = 24, w: int = 40) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # smooth a little so dctq stays high-PSNR
    f = base.astype(np.float64)
    f = (f + np.roll(f, 1, 0) + np.roll(f, 1, 1)) / 3.0
    return f.astype(np.uint8)


def _images_df(spark):
    rows = [
        ("im1", bytearray(IMG.png_encode(_rgb(1)))),
        ("im2", bytearray(IMG.dctq_encode(_rgb(2)))),
        ("im3", bytearray(IMG.png_encode(_rgb(1)))),  # exact dup of im1
    ]
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_resize_exact_vs_local(spark):
    out = {
        r["image_id"]: r
        for r in M.resize_images(_images_df(spark), 16, 16).collect()
    }
    assert set(out) == {"im1", "im2", "im3"}
    for iid, payload in (("im1", IMG.png_encode(_rgb(1))), ("im2", IMG.dctq_encode(_rgb(2)))):
        rgb, _ = IMG.decode_image(payload)
        expect = M.resize_rgb(rgb, 16, 16)
        got, fmt = IMG.decode_image(bytes(out[iid]["bytes"]))
        assert fmt == "png" and out[iid]["w"] == 16 and out[iid]["h"] == 16
        assert np.array_equal(got, expect)  # PNG re-encode is lossless


def test_image_embed_matches_local_and_ranks(spark):
    embs = {r["image_id"]: np.array(r["emb"], dtype=np.float32)
            for r in M.image_embed(_images_df(spark)).collect()}
    local = M.embed_rgb(IMG.decode_image(IMG.png_encode(_rgb(1)))[0])
    assert np.allclose(embs["im1"], local, atol=1e-6)
    for e in embs.values():
        assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5
    # exact dup is the nearest neighbor, far above an unrelated image
    cos_dup = float(embs["im1"] @ embs["im3"])
    cos_other = float(embs["im1"] @ embs["im2"])
    assert cos_dup > 0.999 > cos_other


def test_embed_feeds_similarity_ops(spark):
    import pyspark.sql.functions as F

    emb = M.image_embed(_images_df(spark)).select(
        F.col("image_id").alias("vec_id"), F.col("emb").alias("embedding")
    )
    topk = SIM.cosine_topk(emb, emb.filter(F.col("vec_id") == "im1"), k=2)
    got = sorted(topk.collect(), key=lambda r: -r["score"])
    # the exact dup im3 is the top neighbor at cosine ~1.0
    assert got[0]["neighbor_id"] == "im3" and got[0]["score"] > 0.999
    assert got[1]["neighbor_id"] == "im2"


def test_sample_frames_deterministic_fanout(spark):
    rng = np.random.default_rng(7)
    body = rng.integers(0, 256, size=256 * 5 + 40, dtype=np.uint8).tobytes()
    payload = M._SYNTH_MP4_MAGIC + body
    df = spark.createDataFrame(
        [("vi1", bytearray(payload))], "vi string, bytes binary"
    )
    out = sorted(
        M.sample_frames(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    expect = [f for i, f in enumerate(M.decode_video_frames(payload)) if i % 2 == 0]
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r, f in zip(out, expect):
        got, fmt = IMG.decode_image(bytes(r["bytes"]))
        assert fmt == "png" and np.array_equal(got, f)


def test_real_mp4_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        next(M.decode_video_frames(b"\x00\x00\x00\x20ftypisom" + b"x" * 64))


def test_mean_pool_upscale_and_mixed():
    """Growing an axis replicates source cells (nearest, exact for
    integer factors) — the pooling-only version left upscaled cells
    empty and emitted black stripes."""
    p = np.arange(12, dtype=float).reshape(3, 4)
    up = M._mean_pool(p, 6, 8)
    assert np.array_equal(up, np.repeat(np.repeat(p, 2, 0), 2, 1))
    mixed = M._mean_pool(p, 6, 2)  # rows up, cols down
    assert np.allclose(mixed, np.repeat(p, 2, 0).reshape(6, 2, 2).mean(2))


def test_resize_upscale_no_black_stripes(spark):
    out = {
        r["image_id"]: r
        for r in M.resize_images(_images_df(spark), 64, 64).collect()
    }
    rgb, _ = IMG.decode_image(IMG.png_encode(_rgb(1)))  # 24x40 source
    expect = rgb[np.arange(64) * 24 // 64][:, np.arange(64) * 40 // 64]
    got, fmt = IMG.decode_image(bytes(out["im1"]["bytes"]))
    assert fmt == "png" and np.array_equal(got, expect)


def test_embed_feeds_ann_lsh_string_ids(spark):
    """image_embed output must plug into ann_topk_lsh directly — string
    image_ids included (the bucket UDF derives its id dtype from the
    input instead of hardcoding long)."""
    import pyspark.sql.functions as F

    emb = M.image_embed(_images_df(spark)).select(
        F.col("image_id").alias("vec_id"), F.col("emb").alias("embedding")
    )
    rows = sorted(
        SIM.ann_topk_lsh(
            emb, emb.filter(F.col("vec_id") == "im1"), k=2, dim=63
        ).collect(),
        key=lambda r: -r["score"],
    )
    # im3 is an exact dup of im1: identical embedding -> identical buckets
    # in every table, so it is always a candidate and always ranks first
    assert rows and rows[0]["neighbor_id"] == "im3" and rows[0]["score"] > 0.999
