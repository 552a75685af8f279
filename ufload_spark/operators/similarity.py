"""Similarity search over the ``embeddings`` table (extension surface).

- Brute-force cosine top-k: the correctness baseline. The query set is
  broadcast; candidates never shuffle. O(Q×N) — fine for small Q, the
  benchmark shape for "embed a batch, look up neighbors".
- Random-hyperplane LSH: the scale path. Each vector gets an 8-bit bucket
  signature from sign(v·h_j) against deterministic md5-derived hyperplanes;
  ANN candidates are pairs sharing a bucket (equi-join on the bucket key, no
  all-pairs). At 100 TB this is shuffle-on-bucket — the same shape as
  MinHash-LSH dedup. An IVF variant (k-means centroids → probe nearest
  cells) drops in by replacing the bucket expression with a centroid id.

Vector math uses ``zip_with``/``aggregate`` (JVM-side fold, no UDF); floats
are cast to double before any arithmetic so Spark and DuckDB agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

DIM = 64
N_PLANES = 8
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sqnorm(a: Column) -> Column:
    return dot(a, a)


@register(
    "embedding_norms",
    """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
""",
    doc="per-vector L2 norm via array fold (sanity + normalization input)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(F.sqrt(sqnorm(F.col("embedding"))), 6).alias("l2_norm")
    )


@register(
    "similarity_topk_cosine",
    f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 5),
expl AS (
  SELECT qid, cid,
         sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
         sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS nq,
         sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS nc
  FROM q, c, (SELECT unnest(range(1, {DIM + 1})) AS i)
  GROUP BY qid, cid
), scored AS (
  SELECT qid, cid, round(dp / (sqrt(nq) * sqrt(nc)), 6) AS cosine FROM expl
)
SELECT qid, cid, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, cid) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
""",
    doc="brute-force cosine top-k: broadcast query batch × candidate scan",
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest candidates per query vector by cosine. The 5-vector
    query set is broadcast against the candidate scan — the candidate table
    never shuffles; ranking shuffles only (qid, cosine) pairs."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = e.where(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "cid",
        F.round(
            dot(F.col("qe"), F.col("ce"))
            / (F.sqrt(sqnorm(F.col("qe"))) * F.sqrt(sqnorm(F.col("ce")))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("qid", "cid", "cosine", "rnk")
    )


_PLANES_SQL = f"""
planes AS (
  SELECT j, i,
         ((('0x' || substr(md5(CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 2))::INT
           % 2) * 2 - 1) AS s
  FROM (SELECT unnest(range(0, {N_PLANES})) AS j),
       (SELECT unnest(range(1, {DIM + 1})) AS i)
), expl AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {DIM + 1})) AS i)
), dots AS (
  SELECT e.vec_id, p.j, sum(e.x * p.s) AS d
  FROM expl e JOIN planes p ON e.i = p.i GROUP BY 1, 2
), sigs AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
)
"""


def _lsh_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket signature per vector: bit j = sign(v · h_j), h_j a ±1
    hyperplane derived from md5(j_i) parity (identical in the oracle)."""
    e = table(spark, sf_dir, "embeddings")
    planes = (
        spark.range(0, N_PLANES)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(1, DIM + 1).select(F.col("id").cast("int").alias("i")))
        .select(
            "j",
            "i",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("j").cast("string"),
                                    F.lit("_"),
                                    F.col("i").cast("string"),
                                )
                            ),
                            1,
                            2,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 2
                )
                * 2
                - 1
            ).alias("s"),
        )
    )
    expl = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x")
    )
    dots = (
        expl.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("d"))
    )
    bucket = F.sum(
        F.when(F.col("d") > 0, F.expr("shiftleft(1, j)")).otherwise(F.lit(0))
    )
    return dots.groupBy("vec_id").agg(bucket.cast("bigint").alias("bucket"))


@register(
    "similarity_lsh_buckets",
    _PLANES_SQL.join(["WITH ", "SELECT bucket, count(*) AS n_vecs FROM sigs GROUP BY bucket"]),
    doc="random-hyperplane LSH bucket histogram (8-bit signatures)",
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _lsh_sigs(spark, sf_dir)
    return sigs.groupBy("bucket").agg(F.count("*").alias("n_vecs"))


@register(
    "similarity_lsh_ann_pairs",
    "WITH "
    + _PLANES_SQL
    + f"""
, pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
), pexpl AS (
  SELECT p.vec_a, p.vec_b,
         sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) AS dp,
         sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE)) AS na,
         sum(CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) AS nb
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.vec_a
  JOIN embeddings eb ON eb.vec_id = p.vec_b,
  (SELECT unnest(range(1, {DIM + 1})) AS i)
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
FROM pexpl
WHERE dp / (sqrt(na) * sqrt(nb)) >= 0.2
""",
    doc="ANN within LSH buckets: bucket equi-join → exact rescoring",
)
def similarity_lsh_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage ANN pattern: cheap bucket equi-join proposes candidate
    pairs, exact cosine rescoring keeps the real neighbors. All-pairs work
    is confined to within-bucket, bounded by bucket size."""
    sigs = _lsh_sigs(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt(sqnorm(F.col("emb_a"))) * F.sqrt(sqnorm(F.col("emb_b")))
    )
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .where(cos >= 0.2)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
    )
