"""Deduplication operators over ``documents`` (extension surface: exact,
MinHash+LSH, SimHash, n-gram Jaccard).

Design for 100 TB:
- Exact dedup is a hash-groupBy on an md5 fingerprint — one shuffle on the
  fingerprint, map-side partial agg.
- MinHash: per-doc signatures are a narrow map + one groupBy(doc); LSH
  banding turns the quadratic all-pairs problem into equi-joins on band
  keys, so candidate generation is shuffle-on-band-key — the only scalable
  shape for near-dedup at pretraining scale.
- SimHash: one aggregation pass producing a 16-bit locality-sensitive
  fingerprint per doc; Hamming-bucket joins (not shown) extend it.
- Raw pairwise Jaccard is O(n²) by nature and kept only as the small-subset
  ground-truth for the LSH estimates.

Cross-engine determinism: the shingle hash is ``int(md5(seed|shingle)[:12
hex])`` — bit-identical in Spark (``conv(substring(md5(..)))``) and DuckDB
(``('0x'||substr(md5(..)))::BIGINT``), so even the MinHash signatures have
exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

K_HASHES = 8
N_BANDS = 4  # bands of 2 rows each
SIMHASH_BITS = 16


def _hash48(col: Column, seed: int) -> Column:
    """48-bit deterministic hash shared with the DuckDB oracle."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 12), 16, 10
    ).cast("long")


def _hash48_sql(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5('{seed}|' || {expr}), 1, 12))::BIGINT"


#: Word-3-gram shingles, lowercased — shared shape with the DuckDB CTE below.
def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs: whitespace tokens, lowercased,
    3-gram windows. Narrow map + explode; distinct shuffles on (doc,shingle)
    only within the dedup pipeline that consumes it."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


SHINGLES_CTE = """
WITH tokens AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM tokens WHERE len(toks) >= 3
)
"""


@register(
    "dedup_exact",
    """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
""",
    doc="exact dedup: hash-groupBy on normalized-text fingerprint",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5 of normalized text → keep min(doc_id).
    One shuffle on the 128-bit fingerprint; at 100 TB this is the cheapest
    dedup pass and always runs first."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.groupBy(F.md5(norm).alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir)
    aggs = [
        F.min(_hash48(F.col("shingle"), i)).alias(f"m{i}") for i in range(K_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


_MINHASH_SIGS_SQL = SHINGLES_CTE + (
    ", sigs AS (\n  SELECT doc_id, "
    + ", ".join(
        f"min({_hash48_sql('shingle', i)}) AS m{i}" for i in range(K_HASHES)
    )
    + "\n  FROM shingles GROUP BY doc_id\n)"
)


@register(
    "dedup_minhash_signatures",
    _MINHASH_SIGS_SQL + "\nSELECT * FROM sigs",
    doc="MinHash signatures (k=8) per document, exact cross-engine hashes",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_sigs(spark, sf_dir)


_BAND_JOINS_SQL = "\n  UNION\n".join(
    f"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a JOIN sigs b"
    f" ON a.m{2*b} = b.m{2*b} AND a.m{2*b+1} = b.m{2*b+1} AND a.doc_id < b.doc_id"
    for b in range(N_BANDS)
)

_MATCHES_SQL = " + ".join(
    f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(K_HASHES)
)


@register(
    "dedup_minhash_lsh_pairs",
    _MINHASH_SIGS_SQL
    + f"""
, cand AS (
{_BAND_JOINS_SQL}
)
SELECT c.doc_a, c.doc_b, ({_MATCHES_SQL}) / {K_HASHES}.0 AS est_sim
FROM cand c JOIN sigs a ON c.doc_a = a.doc_id JOIN sigs b ON c.doc_b = b.doc_id
WHERE ({_MATCHES_SQL}) >= 2
""",
    doc="MinHash-LSH near-dup candidate pairs (4 bands × 2 rows)",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs agreeing on any full band become candidates; the
    signature-agreement fraction estimates Jaccard. Each band join is an
    equi-join (shuffle on band key) — no all-pairs comparison anywhere."""
    sigs = _minhash_sigs(spark, sf_dir)
    pairs = None
    for b in range(N_BANDS):
        a, bb = sigs.alias("a"), sigs.alias("b")
        p = a.join(
            bb,
            (F.col(f"a.m{2*b}") == F.col(f"b.m{2*b}"))
            & (F.col(f"a.m{2*b+1}") == F.col(f"b.m{2*b+1}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.distinct()
    a, b = sigs.alias("sa"), sigs.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(K_HASHES)
    )
    return (
        cand.join(a, cand.doc_a == F.col("sa.doc_id"))
        .join(b, cand.doc_b == F.col("sb.doc_id"))
        .where(matches >= 2)
        .select("doc_a", "doc_b", (matches / K_HASHES).alias("est_sim"))
    )


_SIMHASH_BITSUMS_SQL = ", ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_COMBINE_SQL = " + ".join(
    f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    SHINGLES_CTE
    + f"""
, hashed AS (
  SELECT doc_id, {_hash48_sql('shingle', 0)} AS h FROM shingles
), bitsums AS (
  SELECT doc_id, {_SIMHASH_BITSUMS_SQL} FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_COMBINE_SQL} AS BIGINT) AS simhash FROM bitsums
""",
    doc="SimHash (16-bit) locality-sensitive fingerprint per document",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-bit majority vote over shingle hashes → near-identical
    docs land on nearby fingerprints. One explode + one groupBy(doc) —
    linear, shuffle only on doc_id."""
    sh = shingles(spark, sf_dir)
    h = _hash48(F.col("shingle"), 0)
    bitsums = sh.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    combined = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    )
    return bitsums.select("doc_id", combined.cast("bigint").alias("simhash"))


@register(
    "dedup_ngram_jaccard",
    SHINGLES_CTE
    + """
, sub AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 20 = 0),
sizes AS (SELECT doc_id, count(*) AS sz FROM sub GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n
  FROM sub a JOIN sub b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.05
""",
    doc="exact n-gram Jaccard on a 1/20 subset (ground truth for LSH)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Jaccard over shingle sets, restricted to a 1/20 doc
    subset: the inherently-quadratic ground truth used to validate the LSH
    estimates. At scale this never runs on the full corpus — MinHash-LSH
    (above) is the production path."""
    sh = shingles(spark, sf_dir).where(F.col("doc_id") % 20 == 0)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb")
    jac = F.col("n").cast("double") / (F.col("sza") + F.col("szb") - F.col("n"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= 0.05)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
