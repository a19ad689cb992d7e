"""Deduplication operators for large-scale text pipelines.

Families (each oracle-mirrorable in ANSI SQL because every hash is
md5-based and every step is deterministic):

- exact:   hash-groupBy on a normalized fingerprint
- minhash: word-shingle MinHash signatures + LSH banding → candidate
           pairs via equi-join on (band, band_hash) → Jaccard verify
- simhash: per-bit majority over token md5 bits → fixed-width bitstring
- ngram:   direct Jaccard on distinct shingle sets (verification /
           small-scale baseline)

Scale posture: candidate generation is an equi-join on band hashes
(shuffle on a well-distributed key), never an all-pairs product. The
verify step only touches candidate pairs. MinHash uses the *lexicographic
min of md5 hex strings* as the min-hash value — deterministic, portable
to any SQL engine, and uniform enough for banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid_custom_sql_engine_spark.functions.text import fingerprint

# 12 hash functions → 4 bands × 3 rows (tunable).
DEFAULT_NUM_HASHES = 12
DEFAULT_BAND_ROWS = 3
DEFAULT_SHINGLE_N = 3


def normalized(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def word_shingles(text_col: str | Column, n: int = DEFAULT_SHINGLE_N) -> Column:
    """Distinct word n-grams of the normalized text; docs shorter than n
    tokens contribute their full token string as a single shingle."""
    toks = F.split(normalized(text_col), " ")
    k = F.size(toks)
    ngrams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(k >= n, ngrams).otherwise(whole))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by normalized-text fingerprint, keep the min-id
    representative and the copy count. One hash-shuffle on a 32-char key
    regardless of document size."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signature(
    shingles_col: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> list[Column]:
    """MinHash: for seed i, min over shingles of md5('{i}:' || shingle),
    compared lexicographically (md5 hex is fixed-width, so lexicographic
    min == numeric min of the 128-bit value)."""
    return [
        F.array_min(
            F.transform(shingles_col, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle_n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """(id, band, band_hash) — one row per document per band."""
    sigs = df.select(
        F.col(id_col),
        *minhash_signature(word_shingles(text_col, shingle_n), num_hashes),
    )
    n_bands = num_hashes // band_rows
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat(*[F.col(f"mh_{b * band_rows + r}") for r in range(band_rows)])
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.
    Equi-join on (band, band_hash) — a plain shuffled hash join whose key
    cardinality grows with corpus size, so it stays balanced at scale."""
    bands = minhash_bands(df, id_col, text_col, **kw)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step)."""
    sh = df.select(F.col(id_col), word_shingles(text_col, shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: band → candidates → verify."""
    cand = lsh_candidate_pairs(df, id_col, text_col, **kw)
    verified = jaccard_pairs(df, cand, id_col, text_col)
    return verified.filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 32  # one bit per md5 hex nibble's high bit


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash: per-bit majority vote over token-occurrence md5 bits.

    Bit j of a token = high bit of hex nibble j of md5(token) (nibble
    ≥ 8). Documents with no tokens are dropped (no votes). Output: a
    32-char '0'/'1' bitstring — hamming distance on it = simhash
    distance. One explode + one hash aggregate; no UDFs.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalized(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = toks.withColumn("th", F.md5("tok"))
    votes = [
        F.sum(
            F.when(F.substring("th", j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v_{j}") > 0, "1").otherwise("0") for j in range(SIMHASH_BITS)]
    )
    return agg.select(F.col(id_col), bits.alias("simhash"))
