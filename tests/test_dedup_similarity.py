"""Verification for the non-SQL-expressible ops (the driver records
rows-only checks for these, so pytest carries their correctness):

* MinHash+LSH near-dup pairs: every reported pair's Jaccard is exact
  (the operator verifies candidates), and recall vs the exact blocked
  scan is high at high similarity;
* SimHash: identical texts collide, near-identical texts are close,
  unrelated texts are far;
* LSH-ANN: bucketed top-k achieves reasonable recall vs exact cosine;
* phash near-dups: lossy recompressions of the same image are caught.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from film_crawler_spark.functions.images import dctq_decode, dctq_encode, phash64
from film_crawler_spark.operators import dedup as D
from film_crawler_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        ("the quick brown fox jumps over the lazy dog and runs far away into the woods tonight", 0),
        ("the quick brown fox jumps over the lazy dog and runs far away into the woods today", 1),
        ("a completely different sentence about spark shuffles and partition pruning at scale", 2),
        ("the quick brown fox jumps over the lazy dog and runs far away into the woods tonight", 3),
        ("yet another unrelated document mentioning bloom filters cuckoo hashing and politeness", 4),
    ]
    rows = [(i, t_, "src0") for t_, i in base]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.minhash_lsh_dups(docs, jaccard_threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5  # near dup
    assert (2, 4) not in pairs


def test_minhash_lsh_jaccards_are_exact(spark, docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, block_col="source", threshold=0.0).collect()
    }
    for r in D.minhash_lsh_dups(docs, jaccard_threshold=0.3).collect():
        assert exact[(r["id_a"], r["id_b"])] == r["jaccard"]


def test_minhash_null_text_matches_oracle(spark):
    """NULL text is empty text on BOTH engines: without the shared
    coalesce rule, Spark's shingle path gives NULL-text docs a
    config-dependent signature while the DuckDB oracle's unnest(NULL)
    drops them entirely — a silent oracle-parity break the sf0.01
    testdata (no NULLs) never exercises."""
    import duckdb

    rows = [
        (0, None, "s"),
        (1, None, "s"),
        (2, "", "s"),
        (3, "totally distinct words here about nothing in particular at all", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["id_a"], r["id_b"], float(r["jaccard"]))
        for r in D.minhash_lsh_dups(docs, jaccard_threshold=0.4).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        (a, b, float(j))
        for a, b, j in con.sql(
            D.minhash_oracle_sql("documents", jaccard_threshold=0.4)
        ).fetchall()
    }
    assert got == want
    assert (0, 1, 1.0) in got  # NULL-text docs pair deterministically
    assert (0, 2, 1.0) in got  # NULL == ''


def test_minhash_lsh_recall_on_testdata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, block_col="source", threshold=0.6).collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_dups(docs, jaccard_threshold=0.6).collect()
    }
    if exact:
        recall = len(exact & found) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall} over {len(exact)} true pairs"
    # precision is 1.0 by construction (candidates are exact-verified)
    for p in found:
        assert p[0] < p[1]


def test_simhash_properties(spark, docs):
    rows = {r["id"]: r["simhash"] for r in D.simhash64(docs).collect()}
    assert rows[0] == rows[3]  # identical text
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(rows[0], rows[1]) <= 12  # near-identical
    assert ham(rows[0], rows[2]) > 12  # unrelated


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ann_topk_lsh(emb, q, k=5, n_planes=4, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 12 tables x 4 planes: union of tables drives recall up
    assert recall >= 0.6, f"ANN recall {recall}"
    # every approx hit must be a genuinely scored pair, not noise
    assert all(qid != nid for qid, nid in approx)


def test_phash_near_dups(spark):
    rng = np.random.default_rng(5)
    imgs = []
    for i in range(6):
        yy, xx = np.mgrid[0:48, 0:64]
        base = np.sin(xx / (3 + i)) * 60 + np.cos(yy / (2 + i)) * 50 + 128
        px = np.clip(np.stack([base] * 3, -1) + rng.normal(0, 2, (48, 64, 3)), 0, 255).astype(np.uint8)
        imgs.append((f"rm{i}", int(phash64(px))))
        # lossy recompression of the same content -> near-dup pair
        lossy = dctq_decode(dctq_encode(px, q=2.0))
        imgs.append((f"rm{i}x", int(phash64(lossy))))
    df = spark.createDataFrame(imgs, "image_id string, phash long")
    pairs = {(r["id_a"], r["id_b"]) for r in SIM.phash_near_dups(df, max_hamming=12, n_bands=13).collect()}
    found_same = sum(1 for i in range(6) if (f"rm{i}", f"rm{i}x") in pairs or (f"rm{i}x", f"rm{i}") in pairs)
    assert found_same == 6  # <=12-bit flips guaranteed by the 13-band index
    # asking for more distance than the bands guarantee must raise
    with pytest.raises(ValueError):
        SIM.phash_near_dups(df, max_hamming=10, n_bands=8)


def test_cosine_near_dups(spark):
    """Embedding-cosine near-dup: recall 1.0 on planted perturbed copies
    (cosine >= 0.9998), precision exact (verification stage), and zero
    pairs from the unrelated background (max natural cosine ~0.6)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dup = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(1.001) + F.lit(0.002)).alias("v"),
    )
    n_planted = dup.count()
    pairs = SIM.cosine_near_dups(
        emb.unionByName(dup), threshold=0.99, vec_col="v"
    ).collect()
    assert len(pairs) == n_planted
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {
        (i, i + 1000000) for i in range(0, 500, 5)
    }
    assert all(r["score"] >= 0.99 for r in pairs)


def test_ann_ivf_recall(spark):
    """IVF ANN: k-means cells + nprobe probing reaches the same recall
    gate as the LSH variant, and probing ALL cells is exhaustive (the
    candidate set then covers the corpus, so top-k == exact top-k)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ann_topk_ivf(emb, q, k=5, n_centroids=8, nprobe=3, iters=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall}"
    assert all(qid != nid for qid, nid in approx)
    # nprobe == n_centroids degenerates to exact brute force
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ann_topk_ivf(emb, q, k=5, n_centroids=4, nprobe=4, iters=1).collect()
    }
    assert full == exact
