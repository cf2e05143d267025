"""Partitioned Bloom-filter URL-seen set.

The reference's "have I crawled this?" check is an in-memory ``set()``
of seed ids plus a filesystem existence probe per id (reference
spiders.py:92, 304-308) — O(1) lookups that only work on one machine.
The engine's seen set is designed for the north_rule's 10^10-URL scale:

* identity = 64-bit xxhash64 of the *canonical* URL (plus the URL string
  in the exact table for the identical-seen-set assertion);
* a sharded Bloom filter (``shard = murmur3(canon_url) mod n_shards``,
  the same murmur3 as Spark's ``hash()``) gives a cheap, shuffle-local
  membership pre-test: each shard's bitmap travels ONCE per task via
  cogrouped ``applyInPandas``, never once per row;
* Bloom "maybe" rows fall through to an exact ``left_anti`` join against
  the seen table — Bloom false positives therefore cost a lookup, never
  a lost URL (no false negatives by construction, asserted in tests).

At sandbox scale the exact anti-join alone would win; the Bloom path is
the 10^10 design: the exact join's probe side shrinks from |discovered|
to |discovered ∩ maybe|, and the bitmap shards are a fixed-size
broadcastable/co-partitioned structure, not a 10^10-row shuffle.

Sizing: with the default 1 MiB bitmap per shard (2^23 bits) and k=7,
one shard holds ~10^6 URLs at <1% FPR; 10^10 URLs => ~10^4 shards =>
~10 GiB of bitmaps spread across executors — exactly the "explicit
partitioning of the seen-set filter shards" the north_star names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per int64 hash via double hashing (h1 + i*h2).
    Vectorized: returns (n, k) int64 array."""
    u = hashes.astype(np.uint64)
    h1 = u & np.uint64(0xFFFFFFFF)
    h2 = (u >> np.uint64(32)) | np.uint64(1)  # odd => full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    pos = _positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    pos = _positions(hashes, m_bits, k)
    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


class BloomSeenSet:
    """Build/merge/probe over DataFrames of (shard int, url_hash long)."""

    def __init__(self, n_shards: int = 64, m_bits: int = 1 << 23, k: int = 7):
        # 2^23 bits = 1 MiB per shard: ~10^6 URLs/shard at <1% FPR with
        # k=7 (the module-docstring sizing). The old 2^20 default put the
        # FPR near 1 at that load — a probe pass that filtered nothing.
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k

    def shard_col(self, canon_url_col):
        return F.pmod(F.hash(canon_url_col), F.lit(self.n_shards)).cast("int")

    def hash_col(self, canon_url_col):
        return F.xxhash64(canon_url_col)

    def merge(self, prev_bloom: DataFrame | None, new_hashes: DataFrame) -> DataFrame:
        """prev_bloom: BLOOM_SCHEMA or None; new_hashes: (shard, url_hash).
        Returns the updated snapshot (all shards present in either side).
        Cogrouped so each shard's bitmap is materialized once per task."""
        m_bits, k, spark = self.m_bits, self.k, new_hashes.sparkSession
        if prev_bloom is None:
            prev_bloom = spark.createDataFrame([], BLOOM_SCHEMA)

        def _merge(key, new_pdf: pd.DataFrame, prev_pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            if len(prev_pdf) > 0:
                bits = np.frombuffer(prev_pdf["bits"].iloc[0], dtype=np.uint8).copy()
                n = int(prev_pdf["n_items"].iloc[0])
            else:
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
                n = 0
            if len(new_pdf) > 0:
                h = new_pdf["url_hash"].to_numpy(dtype=np.int64)
                _set_bits(bits, h, m_bits, k)
                n += len(h)
            return pd.DataFrame({"shard": [shard], "bits": [bits.tobytes()], "n_items": [n]})

        return (
            new_hashes.select("shard", "url_hash")
            .groupBy("shard")
            .cogroup(prev_bloom.groupBy("shard"))
            .applyInPandas(_merge, BLOOM_SCHEMA)
        )

    def probe(self, candidates: DataFrame, bloom: DataFrame | None) -> DataFrame:
        """candidates must carry (shard, url_hash, ...). Adds boolean
        ``maybe_seen``: False is definitive (skip the exact join), True
        needs the exact check. Missing shard bitmap => False."""
        if bloom is None:
            return candidates.withColumn("maybe_seen", F.lit(False))
        m_bits, k = self.m_bits, self.k
        out_schema = T.StructType(
            candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
        )
        cand_cols = [f.name for f in candidates.schema.fields]

        def _probe(key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(cand_pdf) == 0:
                return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
            if len(bloom_pdf) == 0:
                cand_pdf = cand_pdf.copy()
                cand_pdf["maybe_seen"] = False
                return cand_pdf
            bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8)
            h = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
            cand_pdf = cand_pdf.copy()
            cand_pdf["maybe_seen"] = _test_bits(bits, h, m_bits, k)
            return cand_pdf

        return (
            candidates.groupBy("shard")
            .cogroup(bloom.groupBy("shard"))
            .applyInPandas(_probe, out_schema)
        )


def filter_unseen(
    candidates: DataFrame,
    seen_exact: DataFrame | None,
    bloom_set: BloomSeenSet,
    bloom: DataFrame | None,
    delta_exact: DataFrame | None = None,
) -> DataFrame:
    """The J1 anti-join with Bloom pre-filter (reference spiders.py:304-308
    semantics — skip-if-crawled — made exact at scale).

    candidates: must carry (canon_url, shard, url_hash, ...).
    seen_exact: (canon_url, ...) committed seen rows, or None.
    delta_exact: (canon_url) rows seen AFTER the ``bloom`` snapshot was
      built (e.g. the current iteration's fetch delta). Bloom "definitely
      unseen" is only definitive w.r.t. the snapshot, so when the
      snapshot lags, the bloom-negative branch must still be anti-joined
      against the lag window — otherwise a URL fetched and re-discovered
      in the same iteration is re-enqueued (a T7 exactly-once violation).
      The delta is iteration-sized (politeness-budget-bounded), so this
      extra anti-join stays cheap at any frontier scale.
    Returns candidates provably not yet seen, original columns only.

    Plan shape: ONE probe pass. The bloom split is expressed as
    conditional anti-joins (equi-key AND maybe_seen / AND NOT maybe_seen)
    on a single linear plan, not as a union of two filters over the
    probed set — the union form re-executed the cogrouped Python probe
    UDF once per branch (bitmap deserialize + k-bit test over every
    candidate, twice). With bloom=None the probe is skipped entirely and
    the exact anti-joins run unconditionally (probe's all-False stamp
    means "no snapshot", NOT "definitely unseen" — treating it as the
    latter silently skipped the seen_exact check for bloom-less callers).
    """
    if bloom is None:
        out = candidates
        if seen_exact is not None:
            out = out.join(seen_exact.select("canon_url"), "canon_url", "left_anti")
        if delta_exact is not None:
            out = out.join(delta_exact.select("canon_url"), "canon_url", "left_anti")
        return out
    out = bloom_set.probe(candidates, bloom)
    if seen_exact is not None:
        s = seen_exact.select(F.col("canon_url").alias("_seen_url"))
        out = out.join(
            s, (out["canon_url"] == s["_seen_url"]) & out["maybe_seen"], "left_anti"
        )
    if delta_exact is not None:
        # Unconditional: a delta URL that is also a bloom false positive
        # (maybe_seen=True, absent from seen_exact) would survive a
        # ~maybe_seen-conditioned join and be re-enqueued — the T7
        # violation. The delta is iteration-sized, so the unconditional
        # join costs nothing extra.
        out = out.join(delta_exact.select("canon_url"), "canon_url", "left_anti")
    return out.drop("maybe_seen")
