"""Text-analysis operators over ``documents`` (extension surface: language
ID, quality scoring, token counting, fingerprinting).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python in the hot path. At 100 TB these run as pure
narrow maps over the document scan (no shuffle except the final per-language
aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import spread_scan, table

#: Stopword alternation shared by Spark and the DuckDB oracles.
_STOP = "the|a|and|of|to|in|is|it"
_PUNCT = "[.,;:!?]"


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def stopword_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(f"\\b({_STOP})\\b"), 0))


_TOKENS_SQL = """CASE WHEN length(trim(text)) = 0 THEN 0
  ELSE len(string_split_regex(trim(text), '\\s+')) END"""
_STOPS_SQL = f"len(regexp_extract_all(lower(text), '\\b({_STOP})\\b'))"


@register(
    "text_token_stats",
    f"""
SELECT lang, count(*) AS n_docs,
       round(avg({_TOKENS_SQL}), 4) AS avg_tokens,
       max({_TOKENS_SQL}) AS max_tokens,
       CAST(sum({_TOKENS_SQL}) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang
""",
    doc="token counting (whitespace tokenizer) aggregated per language",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
        F.max(toks).alias("max_tokens"),
        F.sum(toks).cast("bigint").alias("total_tokens"),
    )


@register(
    "text_quality_score",
    f"""
SELECT doc_id,
       {_TOKENS_SQL} AS n_tokens,
       round({_STOPS_SQL} / nullif({_TOKENS_SQL}, 0), 4) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')))
             / nullif(CAST(length(text) AS DOUBLE), 0), 4) AS punct_ratio,
       round(ln(1 + {_TOKENS_SQL}) / 10
             + {_STOPS_SQL} / nullif({_TOKENS_SQL}, 0), 4) AS quality
FROM documents
""",
    doc="quality scoring: length/punctuation/stopword signals per document",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (the filters a pretraining pipeline keys
    on): token count, stopword ratio, punctuation density, and a combined
    score. Pure projection — no shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = token_count(F.col("text")).cast("double")
    stops = stopword_count(F.col("text")).cast("double")
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", _PUNCT, ""))
    ).cast("double")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(stops / F.nullif(toks, F.lit(0.0)), 4).alias("stopword_ratio"),
        F.round(punct / F.nullif(F.length("text").cast("double"), F.lit(0.0)), 4).alias(
            "punct_ratio"
        ),
        F.round(
            F.log(toks + 1) / 10 + stops / F.nullif(toks, F.lit(0.0)), 4
        ).alias("quality"),
    )


@register(
    "text_lang_id",
    f"""
SELECT doc_id, lang,
       CASE WHEN {_STOPS_SQL} / nullif({_TOKENS_SQL}, 0) > 0.05
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents
""",
    doc="language ID: English function-word ratio heuristic",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language ID heuristic: classify as English when the
    English function-word ratio clears a threshold. (A production version
    extends the stopword tables per language; the dataflow is identical.)"""
    d = table(spark, sf_dir, "documents")
    toks = token_count(F.col("text")).cast("double")
    stops = stopword_count(F.col("text")).cast("double")
    ratio = stops / F.nullif(toks, F.lit(0.0))
    return d.select(
        "doc_id",
        "lang",
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
    doc="document fingerprint: md5 over whitespace-normalized text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form fingerprint (lowercase, collapse whitespace, md5) —
    the exact-dedup key. md5 is bit-identical across engines, so this also
    pins down the normalization."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


#: BPE-style pre-tokenizer (the GPT-2 shape, ASCII-reduced so Java and RE2
#: agree): a token is an optional leading space + letters, + digits, or
#: + punctuation run. Whitespace never merges into tokens.
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+"


@register(
    "text_bpe_tokens",
    f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       {_TOKENS_SQL} AS n_ws_tokens
FROM documents
""",
    doc="BPE-ish regex pre-tokenization vs whitespace tokens per document",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting the way a BPE pipeline pre-tokenizes (letter runs,
    digit runs, punctuation runs, space-attached) — the cost model input
    for training-data budgeting. Same narrow-map shape as the whitespace
    tokenizer; the regex runs JVM-side."""
    d = table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
    return d.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


#: High-frequency English character trigrams (with word-boundary spaces).
_EN_TRIGRAMS = (" th", "the", "he ", "ing", "nd ", " an", "er ", " to")
_TRIGRAM_RE = "|".join(_EN_TRIGRAMS)


@register(
    "text_ngram_lang_id",
    f"""
SELECT doc_id, lang,
       CASE WHEN len(regexp_extract_all(lower(text), '({_TRIGRAM_RE})'))
                 / nullif(CAST(length(text) AS DOUBLE), 0) > 0.02
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents
""",
    doc="character-trigram language ID: English trigram density heuristic",
)
def text_ngram_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language ID: density of high-frequency English character
    trigrams. A production system scores against per-language trigram
    tables; the dataflow — regex count + normalize, pure projection — is
    identical, and composes with the function-word heuristic
    (text_lang_id) as an ensemble."""
    d = table(spark, sf_dir, "documents")
    hits = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(f"({_TRIGRAM_RE})"), 0)
    ).cast("double")
    density = hits / F.nullif(F.length("text").cast("double"), F.lit(0.0))
    return d.select(
        "doc_id",
        "lang",
        F.when(density > 0.02, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


TOP_TERMS_K = 5


@register(
    "text_top_terms_per_lang",
    f"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
), counts AS (
  SELECT lang, term, count(*) AS n FROM toks GROUP BY 1, 2
)
SELECT lang, term, n, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk
  FROM counts
) WHERE rnk <= {TOP_TERMS_K}
""",
    doc=f"heavy hitters: top-{TOP_TERMS_K} most frequent terms per language "
    "(explode → count → windowed top-k)",
)
def text_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy-hitters — the corpus-inspection query behind
    stopword lists and contamination checks. Explode to (lang, term), one
    codegen hash-agg (map-side partials absorb the heavy skew of frequent
    terms before the shuffle), then a per-lang top-k window over the much
    smaller counts frame. At 100 TB the agg output is vocabulary-sized,
    orders of magnitude below the corpus; for a single-pass bounded-memory
    variant, a count-min sketch over mapInPandas slots into the same
    shape."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.where(F.length(F.trim("text")) > 0)
        .select("lang", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
    )
    counts = toks.groupBy("lang", "term").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_TERMS_K)
        .select("lang", "term", "n", "rnk")
    )


def _byte_stats_arrow(batches):
    """pyarrow-native batch map: zero-copy Arrow RecordBatches in and out,
    no pandas materialization at all — the leanest Python boundary Spark
    offers (mapInArrow). Compute stays in pyarrow.compute kernels (C++)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        n_bytes = pc.binary_length(pc.cast(text, pa.binary()))
        n_chars = pc.utf8_length(text)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(n_bytes, pa.int64()),
                pc.cast(n_chars, pa.int64()),
                pc.cast(
                    pc.equal(n_bytes, pc.cast(n_chars, pa.int32())), pa.bool_()
                ),
            ],
            names=["doc_id", "n_bytes", "n_chars", "ascii_only"],
        )


@register(
    "text_byte_stats_arrow",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       octet_length(encode(text)) = length(text) AS ascii_only
FROM documents
""",
    doc="mapInArrow byte/char stats: the pyarrow-native (no-pandas) UDF "
    "tier, kernels in C++",
)
def text_byte_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth Python-boundary tier (§2.10) after scalar pandas_udf,
    grouped-map, mapInPandas, and applyInPandasWithState: ``mapInArrow``
    hands raw Arrow RecordBatches to Python with no pandas conversion —
    lowest overhead when the computation is itself Arrow-kernel-shaped.
    UTF-8 byte length vs codepoint count (multibyte detection) per doc;
    narrow map, no shuffle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _byte_stats_arrow,
        schema="doc_id long, n_bytes long, n_chars long, ascii_only boolean",
    )


@register(
    "text_repetition_ratio",
    r"""
WITH tokens AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM tokens WHERE len(toks) >= 3
)
SELECT doc_id, count(*) AS n_ngrams,
       count(DISTINCT shingle) AS n_distinct,
       round(1.0 - count(DISTINCT shingle) * 1.0 / count(*), 6) AS repetition_ratio
FROM sh GROUP BY doc_id
""",
    doc="duplicate-3-gram fraction per document — the Gopher-style "
    "repetition quality signal (high ratio = boilerplate/spam)",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: 1 − distinct/total word-3-grams. The
    quality-filter complement of cross-document dedup — a document that
    repeats itself (listings, keyword stuffing, templated boilerplate)
    scores high and gets dropped before training. Reuses the shingle
    pipeline; distinct-counting is TWO stacked hash aggregates — partial
    agg on (doc_id, shingle) collapses repeats map-side, then a doc_id
    agg counts groups and sums their multiplicities — instead of
    ``count(*) + count(DISTINCT)`` in one agg, which Catalyst plans as an
    Expand that DOUBLES the shingle stream before the exchange (measured
    0.87→0.75 s at sf1; at 100 TB the expand is 2× shuffle bytes on the
    widest frame in the query). Both forms shuffle once on doc_id-keyed
    data. Linear at 100 TB."""
    from ufload_spark.operators.dedup import shingles

    sh = shingles(spark, sf_dir, distinct=False)
    per = sh.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count("*").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_ngrams"), 6
            ).alias("repetition_ratio"),
        )
    )


@register(
    "text_unigram_logprob",
    r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), freq AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT sum(c) AS t FROM freq
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln(c / t)), 4) AS avg_neg_logprob
FROM toks JOIN freq USING (tok) CROSS JOIN tot
GROUP BY doc_id
""",
    doc="unigram-LM quality score: corpus-trained token logprobs, per-doc "
    "mean negative logprob (KenLM-style perplexity-filter proxy)",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring — the filter tier between cheap
    surface heuristics (``text_quality_score``) and a real LM: train a
    unigram model ON the corpus itself (one aggregate), then score every
    document by its tokens' mean negative log-probability. Documents full
    of corpus-typical tokens score low; glossolalia and boilerplate-rare
    junk score high — the same decision KenLM-filter pipelines make, with
    the model-train + score phases as two aggregates in one plan.

    Scale shape: one shuffle on token for the frequency table; the model
    is VOCABULARY-sized (sub-linear in corpus bytes, Heaps' law), so the
    scoring join broadcasts it — the token stream re-aggregates by doc_id
    without ever shuffling on the unbounded token key a second time. The
    scalar total rides a one-row broadcast like the dataset-card
    denominator."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


TFIDF_TOP = 3


@register(
    "text_tfidf_top_terms",
    rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rnk
  FROM scored
) WHERE rnk <= {TFIDF_TOP}
""",
    doc="TF-IDF top terms per document: corpus document frequencies, "
    "smoothed idf, per-doc top-3 by score — the keyword-extraction tier "
    "of the text family",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF keyword extraction as one plan: term frequencies per
    doc, document frequencies over the corpus, smoothed
    ``idf = ln((N+1)/(df+1)) + 1`` (sklearn's formulation, public), top
    ``TFIDF_TOP`` terms per doc by rounded score with a lexicographic
    tie-break so ranking is deterministic on both engines.

    Scale shape: one token shuffle builds the per-doc TF table; DF is a
    vocabulary-sized aggregate of TF (sub-linear in corpus bytes, Heaps'
    law) and broadcasts back onto it, as does the one-row corpus count —
    the TF stream re-aggregates per doc_id only, the same broadcast-model
    shape as ``text_unigram_logprob``. The per-doc top-k is a
    WindowGroupLimit: only TFIDF_TOP rows per doc survive the window."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOP)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# --- distributed BPE merge learning ---------------------------------------

#: merge rounds learned by ``text_bpe_learn``. Each round is one weighted
#: pair-count shuffle + a 1-row TakeOrdered argmax; real tokenizer training
#: runs ~30-50k rounds with the same per-round plan (and per-round
#: checkpointing — see the docstring).
BPE_LEARN_ROUNDS = 4

_BPE_MERGE_TMPL = (
    "trim(regexp_replace(replace(' ' || replace({s}, ' ', '  ') || ' ', "
    "' ' || replace({p}, ' ', '  ') || ' ', "
    "' ' || replace({p}, ' ', '') || ' '), ' +', ' ', 'g'))"
)


def _bpe_oracle_ctes() -> str:
    """Unrolled per-round CTEs (the generated-oracle pattern the PQ/IVF
    Lloyd oracles use): words0 → (count, argmax, re-merge) × K. Shared by
    the learn and encode oracles so the merge chain cannot drift."""
    parts = [
        """
WITH words0 AS (
  SELECT w AS word, count(*) AS freq,
         trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' </w>' AS s
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w
)"""
    ]
    for k in range(1, BPE_LEARN_ROUNDS + 1):
        prev = f"words{k - 1}"
        parts.append(
            f""", c{k} AS (
  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(l)),
                                 i -> l[i] || ' ' || l[i + 1])) AS p, freq
    FROM (SELECT string_split(s, ' ') AS l, freq FROM {prev})
  ) GROUP BY p
), m{k} AS (
  SELECT p, cnt FROM c{k} ORDER BY cnt DESC, p LIMIT 1
), words{k} AS (
  SELECT word, freq,
         {_BPE_MERGE_TMPL.format(s="w.s", p="m.p")} AS s
  FROM {prev} w, m{k} m
)"""
        )
    return "".join(parts)


def _bpe_oracle() -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, p AS pair, replace(p, ' ', '') AS merged,"
        f" cnt AS weighted_count FROM m{k}"
        for k in range(1, BPE_LEARN_ROUNDS + 1)
    )
    return _bpe_oracle_ctes() + "\n" + sel


@register(
    "text_bpe_learn",
    _bpe_oracle(),
    doc=f"distributed BPE tokenizer training: {BPE_LEARN_ROUNDS} merge rounds "
    "over the word-frequency table; each round = one weighted pair-count "
    "shuffle + a 1-row argmax, merge applied via deterministic string "
    "rewrite identical on both engines",
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first :data:`BPE_LEARN_ROUNDS` BPE merges from the corpus —
    actual tokenizer *training* (Sennrich et al. 2016), not the fixed-regex
    tokenization of ``text_bpe_tokens``. Classic BPE trains on the
    word-frequency dictionary: each distinct word becomes a
    space-separated symbol string of its characters plus an end-of-word
    marker ``</w>``, and every round (1) counts adjacent symbol pairs
    weighted by word frequency, (2) picks the argmax pair (ties broken by
    pair text — bit-stable across engines and cluster sizes), (3) rewrites
    every word's symbol string with the pair merged.

    The merge rewrite is a plain string replace on a DOUBLE-SPACED symbol
    string: doubling separators gives every symbol its own flanking spaces,
    so consecutive disjoint occurrences all merge in one non-overlapping
    left-to-right ``replace`` pass (with single spaces the trailing space
    of one match would consume the leading space of the next). Overlapping
    occurrences (``a a a`` with pair ``a a``) resolve leftmost-first —
    exactly BPE's greedy scan. ``replace`` has identical
    scan-left/resume-after semantics in Spark and DuckDB, so the learned
    vocabulary is bit-identical (oracle: generated unrolled per-round
    CTEs, the same pattern as the PQ/IVF Lloyd oracles).

    Scale shape: the corpus is touched ONCE (the word-frequency groupBy —
    one shuffle on the word, map-side combined); every round after that
    runs on the distinct-word table, which is vocabulary-sized, not
    corpus-sized. Per round: one pair-count shuffle + a 1-row
    ``TakeOrderedAndProject`` argmax broadcast-cross-joined back — no
    driver collect, no global sort. The K rounds extend one lazy plan;
    at real training depth (30-50k merges) each round would checkpoint
    its words table (the ``min_label_components`` discipline) to keep
    lineage flat — documented here because at K=4 the doubled lineage is
    cheaper than the checkpoint writes.

    Reference analog: none — extension surface (the training-data brief's
    token-counting family: this is where the tokenizer those token counts
    assume comes from).
    """
    _, merges = _bpe_train(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """Run the BPE merge loop; returns (final word table with columns
    ``word, freq, s``, list of 1-row merge DataFrames). See
    :func:`text_bpe_learn` for semantics."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(
                F.trim(F.regexp_replace("word", "(.)", "$1 ")), F.lit(" </w>")
            ).alias("s"),
        )
        # The K-round loop's lineage references the word table 2^K-ish
        # times (round k's argmax subtree and its words subtree each
        # re-derive round k-1). Persisting the VOCABULARY-sized base table
        # collapses that to one corpus scan + cache reads; what still
        # recomputes per round is word-table-sized, not corpus-sized.
        # Spark's ContextCleaner unpersists when the query's frames are
        # GC'd; at real training depth each round's table would be
        # checkpointed instead (see docstring).
        .persist()
    )
    merges = []
    cur = words
    for k in range(1, BPE_LEARN_ROUNDS + 1):
        # adjacent symbol pairs; words are ~10 symbols so the per-element
        # re-eval of the split inside the lambda is bounded and cheaper
        # than materializing zipped slice copies
        l = F.split("s", " ")
        pairs = cur.select(
            "freq",
            F.explode(
                F.when(
                    F.size(l) >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size(l) - 2),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(l, i + 1),
                            F.element_at(l, i + 2),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("p"),
        )
        argmax = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
        )
        merges.append(
            argmax.select(
                F.lit(k).alias("merge_rank"),
                F.col("p").alias("pair"),
                F.replace("p", F.lit(" "), F.lit("")).alias("merged"),
                F.col("cnt").alias("weighted_count"),
            )
        )
        padded = F.concat(
            F.lit(" "), F.replace("s", F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        pat = F.concat(
            F.lit(" "), F.replace("_mp", F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        rep = F.concat(
            F.lit(" "), F.replace("_mp", F.lit(" "), F.lit("")), F.lit(" ")
        )
        cur = (
            cur.crossJoin(F.broadcast(argmax.select(F.col("p").alias("_mp"))))
            .withColumn(
                "s",
                F.trim(
                    F.regexp_replace(F.replace(padded, pat, rep), " +", " ")
                ),
            )
            .drop("_mp")
        )
    return cur, merges


@register(
    "text_bpe_encode",
    _bpe_oracle_ctes()
    + f""",
dw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_words,
       CAST(sum(len(string_split(v.s, ' '))) AS INT) AS n_bpe_tokens
FROM dw JOIN words{BPE_LEARN_ROUNDS} v ON dw.w = v.word
WHERE dw.w <> ''
GROUP BY doc_id
""",
    doc="encode documents with the corpus-trained BPE merges: per-doc token "
    "count under the learned vocabulary via a word-level join — the corpus "
    "is never re-tokenized per document",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the merges :func:`text_bpe_learn` trains — the encode half of
    the tokenizer lifecycle. BPE encoding is word-local, so documents are
    never re-tokenized individually: the final word table (word → merged
    symbol string) already IS the encoding of every distinct word, and
    per-document token counts come from a word-level equi-join + sum.
    Output: per-doc whitespace word count and BPE token count under the
    learned vocabulary.

    Scale shape: the encode side adds one shuffle (docs exploded to words,
    joined on the word — at 100 TB this is the standard
    corpus ⋈ vocabulary join; the vocabulary side is orders of magnitude
    smaller and AQE will broadcast it when it fits) and one doc_id
    aggregate. The training lineage rides along lazily exactly as in
    ``text_bpe_learn``; a production pipeline would read the persisted
    merge table instead (the ``similarity_ivf_incremental`` lifecycle
    split, documented rather than duplicated here).

    Reference analog: none — extension surface (token counting under a
    corpus-trained tokenizer; the oracle shares the generated merge-chain
    CTEs with ``text_bpe_learn`` so the two can never drift).
    """
    final_words, _ = _bpe_train(spark, sf_dir)
    vocab = final_words.select(
        "word", F.size(F.split("s", " ")).alias("n_sym")
    )
    dw = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("n_sym").cast("int").alias("n_bpe_tokens"),
        )
    )


#: Zipf fit: top-K words by frequency, log-log OLS in fixed-point micro-units
ZIPF_K = 1000


@register(
    "text_zipf_fit",
    f"""
WITH wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w
), ranked AS (
  SELECT row_number() OVER (ORDER BY freq DESC, w) AS rnk, freq
  FROM wc ORDER BY freq DESC, w LIMIT {ZIPF_K}
), pts AS (
  SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM ranked
), sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x*y) AS HUGEINT) AS sxy,
         CAST(sum(x*x) AS HUGEINT) AS sxx, CAST(sum(y*y) AS HUGEINT) AS syy
  FROM pts
), comps AS (
  SELECT n,
         CAST(n*sxy - sx*sy AS DOUBLE) AS cov_n,
         CAST(n*sxx - sx*sx AS DOUBLE) AS varx_n,
         CAST(n*syy - sy*sy AS DOUBLE) AS vary_n,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM sums
)
SELECT CAST(n AS BIGINT) AS k_words,
       round(cov_n / varx_n, 6) + 0.0 AS zipf_slope,
       round((syd - (cov_n / varx_n) * sxd) / CAST(n AS DOUBLE) / 1000000, 6)
         + 0.0 AS log_c,
       round(cov_n * cov_n / (varx_n * vary_n), 6) + 0.0 AS r2
FROM comps
""",
    doc=f"Zipf's-law fit: log-log OLS over the top-{ZIPF_K} word "
    "frequencies in exact fixed-point micro-units; slope ~ -1 on natural "
    "text, R^2 as the fit-quality audit",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics audit: fit ``ln(freq) = slope·ln(rank) + c`` over
    the top-:data:`ZIPF_K` words. Natural text gives slope ≈ −1 (Zipf's
    law); synthetic/templated corpora drift toward flatter slopes with
    high R² — a cheap distribution-level fingerprint that catches
    generator artifacts document-level quality scores miss.

    Numerics: logs are transcendental, so full cross-engine bit-equality
    is not available the way it is for the integer operators — instead
    each log is snapped to fixed-point micro-units
    (``floor(ln(v)·10⁶ + 0.5)``, identical rule both engines) immediately,
    and from there the OLS runs on exact integer sufficient statistics
    (int64-safe at this scale, combined in decimal128 like
    `lineitem_ols_price_model`). A 1-ulp libm disagreement can only
    matter if a log lands within 1 ulp of a 0.5 micro-unit boundary —
    measure-zero in practice vs. the unconditioned float-sum drift it
    replaces.

    Scale shape: one word-count shuffle (map-side combined); the ranking
    is a top-K (vocabulary-sized input, K-bounded output), and the
    regression is one scalar aggregate over K rows. The global
    row_number is over the K-row result, never the corpus.

    Reference analog: none — extension surface (text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    topk = wc.orderBy(F.desc("freq"), F.asc("w")).limit(ZIPF_K)
    from pyspark.sql import Window as _W

    ranked = topk.select(
        F.row_number()
        .over(_W.orderBy(F.desc("freq"), F.asc("w")))
        .alias("rnk"),
        "freq",
    )
    x = F.floor(F.log(F.col("rnk").cast("double")) * 1000000 + 0.5).cast(
        "long"
    )
    y = F.floor(F.log(F.col("freq").cast("double")) * 1000000 + 0.5).cast(
        "long"
    )
    sums = ranked.select(x.alias("x"), y.alias("y")).groupBy().agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dec = "decimal(38,0)"
    n, sx, sy, sxy, sxx, syy = (
        F.col(c).cast(dec) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    cov_n = (n * sxy - sx * sy).cast("double")
    varx_n = (n * sxx - sx * sx).cast("double")
    vary_n = (n * syy - sy * sy).cast("double")
    slope = cov_n / varx_n
    return sums.select(
        F.col("n").cast("bigint").alias("k_words"),
        (F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
        (
            F.round(
                (sy.cast("double") - slope * sx.cast("double"))
                / F.col("n").cast("double")
                / 1000000,
                6,
            )
            + F.lit(0.0)
        ).alias("log_c"),
        (F.round(cov_n * cov_n / (varx_n * vary_n), 6) + F.lit(0.0)).alias(
            "r2"
        ),
    )


# --- BM25 ranked retrieval ---------------------------------------------------

#: Lucene-flavored BM25: k1 term-frequency saturation, b length norm.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
#: the fixed search query (terms from the corpus's synthetic vocabulary)
BM25_QUERY = ("hash", "join", "vector")

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "text_bm25_search",
    rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         avg(dl) AS avgdl
  FROM dl, (SELECT 1) one
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
), dfq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), term_scores AS (
  SELECT t.doc_id,
         CAST(
           ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                                  + {BM25_B} * l.dl / s.avgdl))
           AS DECIMAL(20, 10)) AS term_score
  FROM tf t JOIN dfq q USING (tok) JOIN dl l USING (doc_id)
  CROSS JOIN stats s
), scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         round(CAST(sum(term_score) AS DOUBLE), 4) AS score
  FROM term_scores GROUP BY doc_id
)
SELECT doc_id, n_terms, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= {BM25_TOPK}
""",
    doc=f"BM25 ranked retrieval: query {BM25_QUERY} over the corpus, "
    f"k1={BM25_K1} b={BM25_B}, decimal-summed term scores (order-free), "
    f"top-{BM25_TOPK}",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BM25 ranked retrieval over the documents corpus for a fixed
    query — the search tier above ``text_tfidf_top_terms``'s keyword
    extraction: Lucene-flavored idf ``ln(1 + (N - df + ½)/(df + ½))``,
    :data:`BM25_K1` term-frequency saturation and :data:`BM25_B` length
    normalization against the corpus mean document length.

    Determinism: each per-(doc, term) score is one fixed-shape double
    expression (bit-identical across engines), but the per-doc SUM over
    matched terms would be float-order-dependent — so term scores are
    cast to ``decimal(20,10)`` first and summed exactly (the decimal38
    trick from the OLS/Zipf queries), then rounded once at the end.

    Scale shape: the token stream shuffles once to build per-doc lengths;
    query-term postings are filtered BEFORE their aggregate (tf rows
    exist only for query terms, ~|query| rows per matching doc); the
    document-frequency table and the scalar (N, avgdl) stats ride
    broadcasts. The final top-k is TakeOrderedAndProject — never a global
    sort — and the rank window runs on the ≤ :data:`BM25_TOPK` collected
    survivors (SCALE GUARD: bounded input by construction).

    Reference analog: none (extension surface — text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    term_score = (
        idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / norm
    ).cast("decimal(20,10)")
    scored = (
        tf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("term_score").cast("double"), 4).alias("score"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK)
    # rank over the <= BM25_TOPK survivors only (SCALE GUARD: the
    # partition-less window's input is bounded by the limit above)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "n_terms",
        "score",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


@register(
    "text_bigram_logprob",
    r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
         unnest(range(1, len(string_split_regex(lower(trim(text)), '\s+')) + 1))
           AS pos
  FROM documents
), uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY 1
), v AS (
  SELECT CAST(count(*) AS BIGINT) AS vsize FROM uni
), bigr AS (
  SELECT doc_id, pos, lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         tok
  FROM toks
  QUALIFY prev IS NOT NULL
), bcnt AS (
  SELECT prev, tok, CAST(count(*) AS BIGINT) AS c12 FROM bigr GROUP BY 1, 2
), scored AS (
  SELECT g.doc_id,
         CAST(-ln((b.c12 + 1.0) / (u.c1 + v.vsize)) AS DECIMAL(20, 10))
           AS nll
  FROM bigr g
  JOIN bcnt b ON g.prev = b.prev AND g.tok = b.tok
  JOIN uni u ON g.prev = u.tok
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(nll) AS DOUBLE) / count(*), 4) AS avg_neg_logprob
FROM scored GROUP BY doc_id
""",
    doc="bigram-LM quality scoring: corpus-trained add-one-smoothed bigram "
    "model, per-doc mean negative log-probability — the perplexity tier "
    "above the unigram scorer; decimal-summed NLLs (order-free)",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity scoring — one tier above
    ``text_unigram_logprob``: train an add-one-smoothed bigram model ON
    the corpus (``P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V)``), then score every
    document by its bigrams' mean negative log-probability. Catches
    word-salad that unigram frequency can't (corpus-typical tokens in
    atypical ORDER score high).

    Determinism: each bigram NLL is a fixed-shape double expression; the
    per-doc mean would be float-order-dependent, so NLLs are cast to
    ``decimal(20,10)``, summed exactly, and divided once (the BM25/OLS
    discipline).

    Scale shape: the token stream exchanges ONCE on doc_id for the
    lag window (adjacency needs document order); unigram and bigram
    counts are vocabulary-sized aggregates that broadcast back into the
    scoring join (Heaps' law — sub-linear in corpus bytes; a corpus whose
    bigram table outgrows broadcast switches that one join to a shuffle
    on the bigram key, everything else unchanged).

    Reference analog: none (extension surface — text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("pos", "tok"),
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    vsize = uni.agg(F.count("*").alias("vsize"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigr = (
        toks.withColumn("prev", F.lag("tok").over(w))
        .where(F.col("prev").isNotNull())
        .select("doc_id", "prev", "tok")
    )
    bcnt = bigr.groupBy("prev", "tok").agg(F.count("*").alias("c12"))
    nll = (
        -F.log(
            (F.col("c12") + F.lit(1.0))
            / (F.col("c1") + F.col("vsize"))
        )
    ).cast("decimal(20,10)")
    return (
        bigr.join(F.broadcast(bcnt), ["prev", "tok"])
        .join(
            F.broadcast(uni.select(F.col("tok").alias("prev"), "c1")), "prev"
        )
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum("nll").cast("double") / F.count("*"), 4
            ).alias("avg_neg_logprob"),
        )
    )


#: PMI: only terms in the top-PMI_VOCAB by document frequency participate
#: in the pair join — the a-priori prefilter that bounds the within-doc
#: self-join at any corpus size
PMI_VOCAB = 40
PMI_MIN_PAIR_DOCS = 5


@register(
    "text_pmi_cooccurrence",
    rf"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1
), vocab AS (
  SELECT term, df FROM (
    SELECT term, df,
           row_number() OVER (ORDER BY df DESC, term) AS rnk
    FROM df
  ) WHERE rnk <= {PMI_VOCAB}
), pruned AS (
  SELECT t.doc_id, t.term, v.df FROM toks t JOIN vocab v USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         any_value(a.df) AS df_a, any_value(b.df) AS df_b,
         CAST(count(*) AS BIGINT) AS co_docs
  FROM pruned a JOIN pruned b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT term_a, term_b, co_docs,
       round(ln((CAST(co_docs AS DOUBLE) * n_docs)
                / (CAST(df_a AS DOUBLE) * df_b)), 6) + 0.0 AS pmi
FROM pairs CROSS JOIN nd
WHERE co_docs >= {PMI_MIN_PAIR_DOCS}
""",
    doc=f"PMI term co-occurrence: document-level pointwise mutual "
    f"information over the top-{PMI_VOCAB} vocabulary (a-priori "
    "prefilter bounds the within-doc pair join), exact integer counts, "
    "one ln per output row",
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: pointwise mutual information
    ``ln(P(a,b) / (P(a)·P(b)))`` over document-level co-occurrence, the
    standard phrase/topic signal (and the doc-level sibling of
    ``text_bigram_logprob``'s adjacency model).

    Scale shape — the a-priori discipline from ``basket_part_pairs``:
    only the top-:data:`PMI_VOCAB` terms by document frequency enter the
    within-document self-join, so the pair space is bounded by
    vocab²/2 regardless of corpus size, and the distinct-presence
    projection collapses each document to ≤ vocab rows BEFORE the join.
    All probabilities come from exact integer counts with one ``ln`` per
    output row (no float reductions anywhere); the
    :data:`PMI_MIN_PAIR_DOCS` support floor mirrors collocation practice
    (PMI is unstable at tiny counts).

    Reference analog: none (extension surface — text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    ).distinct()
    nd = d.agg(F.count("*").alias("n_docs"))
    df_ = toks.groupBy("term").agg(F.count("*").alias("df"))
    # SCALE GUARD: vocabulary cut via orderBy+limit =
    # TakeOrderedAndProject, a distributed per-partition top-k merge —
    # NOT a partition-less rank window, which would sort every distinct
    # token (10^8-10^9 web-scale) on one partition. (df DESC, term) is
    # a total order, so the cut is deterministic.
    vocab = (
        df_.orderBy(F.desc("df"), "term")
        .limit(PMI_VOCAB)
        .select("term", "df")
    )
    pruned = toks.join(F.broadcast(vocab), "term")
    a = pruned.select(
        "doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    b = pruned.select(
        "doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, ["doc_id"])
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.any_value("df_a").alias("df_a"),
            F.any_value("df_b").alias("df_b"),
            F.count("*").alias("co_docs"),
        )
        .where(F.col("co_docs") >= PMI_MIN_PAIR_DOCS)
    )
    pmi = F.log(
        (F.col("co_docs").cast("double") * F.col("n_docs"))
        / (F.col("df_a").cast("double") * F.col("df_b"))
    )
    return pairs.crossJoin(F.broadcast(nd)).select(
        "term_a",
        "term_b",
        "co_docs",
        (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"),
    )


#: Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to the
#: synthetic corpus's 10-99-word documents). All integer so every rule is an
#: exact comparison in both engines.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 80
GOPHER_MIN_MEANLEN = 3  # mean word length bounds, applied as integer
GOPHER_MAX_MEANLEN = 10  # cross-multiplied inequalities
GOPHER_MIN_STOPWORDS = 2  # distinct stopwords required
_ALPHA_WORD = r"\S*[A-Za-z]\S*"

_NONWS_SQL = "length(regexp_replace(trim(text), '\\s+', '', 'g'))"
_ALPHA_WORDS_SQL = f"len(regexp_extract_all(text, '{_ALPHA_WORD}'))"
_DSTOPS_SQL = (
    f"len(list_distinct(regexp_extract_all(lower(text), '\\b({_STOP})\\b')))"
)


@register(
    "text_gopher_filters",
    f"""
WITH sig AS (
  SELECT lang,
         {_TOKENS_SQL} AS nw,
         {_NONWS_SQL} AS nc,
         {_DSTOPS_SQL} AS dstops,
         {_ALPHA_WORDS_SQL} AS alphaw
  FROM documents
), rules AS (
  SELECT lang,
         CASE WHEN nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
              THEN 1 ELSE 0 END AS r_len,
         CASE WHEN nc BETWEEN {GOPHER_MIN_MEANLEN} * nw
                          AND {GOPHER_MAX_MEANLEN} * nw
              THEN 1 ELSE 0 END AS r_meanlen,
         CASE WHEN dstops >= {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END AS r_stop,
         CASE WHEN 5 * alphaw >= 4 * nw THEN 1 ELSE 0 END AS r_alpha
  FROM sig
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(r_len) AS BIGINT) AS pass_len,
       CAST(sum(r_meanlen) AS BIGINT) AS pass_meanlen,
       CAST(sum(r_stop) AS BIGINT) AS pass_stopwords,
       CAST(sum(r_alpha) AS BIGINT) AS pass_alpha,
       CAST(sum(r_len * r_meanlen * r_stop * r_alpha) AS BIGINT) AS pass_all
FROM rules GROUP BY lang
""",
    doc="Gopher-style quality rule panel: word count, mean word length, "
    "stopword presence, alphabetic-word fraction; per-language pass counts",
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public), the
    standard pretraining quality gate: word-count bounds, mean-word-length
    bounds, minimum distinct-stopword presence, and minimum fraction of
    words containing an alphabetic character. Emits per-language pass
    counts for each rule plus the conjunction — the shape a curation
    pipeline monitors while tuning thresholds.

    Numeric discipline: every rule is an integer comparison (mean word
    length and the 0.8 alpha fraction are cross-multiplied, never divided),
    so rule outcomes are bit-identical across engines — no float ratios
    anywhere.

    Scale shape: a pure narrow projection over the document scan (token
    and character counts per document) followed by one small per-language
    aggregate — the same one-shuffle profile as ``text_token_stats``. At
    100 TB the projection is embarrassingly parallel and the aggregate
    output is bounded by the language set.

    Reference analog: none (extension surface — text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    nw = token_count(F.col("text"))
    nc = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    dstops = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(f"\\b({_STOP})\\b"), 0
            )
        )
    )
    alphaw = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_ALPHA_WORD), 0)
    )
    as_int = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    rules = d.select(
        "lang",
        as_int(nw.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("r_len"),
        as_int(
            nc.between(GOPHER_MIN_MEANLEN * nw, GOPHER_MAX_MEANLEN * nw)
        ).alias("r_meanlen"),
        as_int(dstops >= GOPHER_MIN_STOPWORDS).alias("r_stop"),
        as_int(5 * alphaw >= 4 * nw).alias("r_alpha"),
    )
    return rules.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("r_len").cast("bigint").alias("pass_len"),
        F.sum("r_meanlen").cast("bigint").alias("pass_meanlen"),
        F.sum("r_stop").cast("bigint").alias("pass_stopwords"),
        F.sum("r_alpha").cast("bigint").alias("pass_alpha"),
        F.sum(
            F.col("r_len") * F.col("r_meanlen") * F.col("r_stop") * F.col("r_alpha")
        )
        .cast("bigint")
        .alias("pass_all"),
    )


#: JS-divergence vocabulary: token count over the whole corpus picks the
#: top-N terms both distributions are restricted to (fixed-size model).
JSD_VOCAB = 50


@register(
    "text_js_divergence_by_lang",
    f"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
), tc AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT term, CAST(sum(n) AS BIGINT) AS cn
  FROM tc GROUP BY term
  ORDER BY cn DESC, term LIMIT {JSD_VOCAB}
), vtc AS (
  SELECT tc.lang, tc.term, tc.n, v.cn FROM tc JOIN vocab v USING (term)
), ltot AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS ln_tot FROM vtc GROUP BY lang
), ctot AS (
  SELECT CAST(sum(cn) AS BIGINT) AS cn_tot FROM vocab
), terms AS (
  SELECT t.lang,
         CAST(round(CASE WHEN t.n = 0 THEN 0 ELSE
           0.5 * (CAST(t.n AS DOUBLE) / l.ln_tot)
           * ln((CAST(t.n AS DOUBLE) / l.ln_tot)
                / (0.5 * CAST(t.n AS DOUBLE) / l.ln_tot
                   + 0.5 * CAST(t.cn AS DOUBLE) / c.cn_tot)) END, 12)
           AS DECIMAL(38, 12)) AS p_term,
         CAST(round(
           0.5 * (CAST(t.cn AS DOUBLE) / c.cn_tot)
           * ln((CAST(t.cn AS DOUBLE) / c.cn_tot)
                / (0.5 * CAST(t.n AS DOUBLE) / l.ln_tot
                   + 0.5 * CAST(t.cn AS DOUBLE) / c.cn_tot)), 12)
           AS DECIMAL(38, 12)) AS q_term
  FROM vtc t JOIN ltot l ON t.lang = l.lang, ctot c
), qmiss AS (
  -- vocab terms ABSENT from a language still contribute the Q-side mass
  SELECT l.lang,
         CAST(round(0.5 * (CAST(v.cn AS DOUBLE) / c.cn_tot) * ln(2.0), 12)
              AS DECIMAL(38, 12)) AS q_term
  FROM ltot l, vocab v, ctot c
  WHERE NOT EXISTS (
    SELECT 1 FROM vtc t WHERE t.lang = l.lang AND t.term = v.term
  )
)
SELECT lang,
       round(CAST(
         (SELECT coalesce(sum(p_term + q_term), 0) FROM terms WHERE terms.lang = x.lang)
         + (SELECT coalesce(sum(q_term), 0) FROM qmiss WHERE qmiss.lang = x.lang)
         AS DOUBLE), 6) + 0.0 AS jsd_nats
FROM ltot x
""",
    doc=f"Jensen-Shannon divergence of each language's top-{JSD_VOCAB}-term "
    "distribution vs the corpus distribution — drift monitoring with "
    "order-free decimal term sums",
)
def text_js_divergence_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift monitoring: the Jensen-Shannon divergence (nats)
    between each language's term distribution and the whole-corpus
    distribution, restricted to the global top-:data:`JSD_VOCAB` terms —
    the fixed-size-model discipline every text operator here follows
    (Heaps-bounded vocabulary, broadcastable). JSD is the symmetric,
    bounded KL variant curation pipelines watch to catch a source or
    language shard drifting from the mixture.

    Numeric discipline: both KL halves decompose into per-(lang, term)
    terms; each is a fixed-shape double expression over exact integer
    counts, rounded to 12dp and cast ``decimal(38,12)`` BEFORE summation
    (order-free; the NLL pattern). Vocabulary terms a language never
    emits still carry Q-side mass ``0.5·q·ln 2`` — omitting them would
    undercount the divergence — contributed by an anti-join branch.

    Scale shape: one (lang, term) count shuffle, a top-N vocabulary
    via orderBy+limit (TakeOrderedAndProject — distributed top-k, the
    ``text_rake_keywords`` SCALE GUARD), broadcast vocabulary joins,
    and per-language sums over ≤ |langs|·|vocab| rows.

    Reference analog: none (extension surface — text-analysis family).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "lang",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    tc = toks.groupBy("lang", "term").agg(
        F.count("*").cast("bigint").alias("n")
    )
    # SCALE GUARD: vocabulary cut via orderBy+limit =
    # TakeOrderedAndProject (distributed per-partition top-k merge),
    # never a partition-less rank window sorting every distinct token
    # on one partition. (cn DESC, term) is a total order.
    df_ = tc.groupBy("term").agg(F.sum("n").cast("bigint").alias("cn"))
    vocab = (
        df_.orderBy(F.desc("cn"), "term")
        .limit(JSD_VOCAB)
        .select("term", "cn")
    )
    vtc = tc.join(F.broadcast(vocab), "term")
    ltot = vtc.groupBy("lang").agg(F.sum("n").cast("bigint").alias("ln_tot"))
    ctot = vocab.agg(F.sum("cn").cast("bigint").alias("cn_tot"))
    pl = F.col("n").cast("double") / F.col("ln_tot")
    pc = F.col("cn").cast("double") / F.col("cn_tot")
    mid = 0.5 * pl + 0.5 * pc
    present = (
        vtc.join(ltot, "lang")
        .crossJoin(F.broadcast(ctot))
        .select(
            "lang",
            F.round(0.5 * pl * F.log(pl / mid), 12)
            .cast("decimal(38,12)")
            .alias("p_term"),
            F.round(0.5 * pc * F.log(pc / mid), 12)
            .cast("decimal(38,12)")
            .alias("q_term"),
        )
    )
    # vocab terms a language never emits: Q-side mass only (P = 0)
    missing = (
        ltot.select("lang")
        .crossJoin(F.broadcast(vocab))
        .join(vtc.select("lang", "term"), ["lang", "term"], "left_anti")
        .crossJoin(F.broadcast(ctot))
        .select(
            "lang",
            F.lit(None).cast("decimal(38,12)").alias("p_term"),
            F.round(0.5 * pc * F.log(F.lit(2.0)), 12)
            .cast("decimal(38,12)")
            .alias("q_term"),
        )
    )
    allterms = present.unionByName(missing)
    return allterms.groupBy("lang").agg(
        (
            F.round(
                (
                    F.coalesce(F.sum("p_term"), F.lit(0))
                    + F.coalesce(F.sum("q_term"), F.lit(0))
                ).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("jsd_nats")
    )


#: fuzzy search: probe sampling modulus, rarest-trigram prefix size,
#: results per probe
FUZZY_PROBE_MOD = 199
FUZZY_PREFIX_K = 2
FUZZY_TOP_K = 3


@register(
    "search_fuzzy_partnames",
    f"""
WITH names AS (
  SELECT p_partkey AS key, p_name AS name FROM part
), dnames AS (
  SELECT DISTINCT name FROM names
), grams AS (
  SELECT DISTINCT name, substr(name, CAST(i AS BIGINT), 3) AS g
  FROM (SELECT name, unnest(range(1, length(name) - 1)) AS i FROM dnames)
), gram_df AS (
  SELECT g, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY g
), probes AS (
  SELECT key AS probe_key,
         substr(name, 1, 2) || substr(name, 4) AS probe_text
  FROM names
  WHERE key % {FUZZY_PROBE_MOD} = 0 AND length(name) >= 4
), dprobes AS (
  SELECT DISTINCT probe_text FROM probes
), probe_grams AS (
  SELECT DISTINCT probe_text,
         substr(probe_text, CAST(i AS BIGINT), 3) AS g
  FROM (SELECT probe_text, unnest(range(1, length(probe_text) - 1)) AS i
        FROM dprobes)
), probe_prefix AS (
  SELECT probe_text, g FROM (
    SELECT pg.probe_text, pg.g, d.df
    FROM probe_grams pg JOIN gram_df d USING (g)
  ) t
  QUALIFY row_number() OVER (PARTITION BY probe_text ORDER BY df, g)
          <= {FUZZY_PREFIX_K}
), cands AS (
  SELECT DISTINCT pp.probe_text, gr.name AS match_name
  FROM probe_prefix pp JOIN grams gr USING (g)
), verified AS (
  SELECT probe_text, match_name,
         CAST(levenshtein(probe_text, match_name) AS INT) AS dist
  FROM cands
), champions AS (
  SELECT name AS match_name, key AS match_key FROM (
    SELECT name, key,
           row_number() OVER (PARTITION BY name ORDER BY key) AS rn
    FROM names
  ) WHERE rn <= {FUZZY_TOP_K}
), ranked AS (
  SELECT p.probe_key, p.probe_text, ch.match_key, v.match_name, v.dist,
         CAST(row_number() OVER (
           PARTITION BY p.probe_key
           ORDER BY v.dist, ch.match_key) AS INT) AS rank
  FROM probes p
  JOIN verified v USING (probe_text)
  JOIN champions ch USING (match_name)
)
SELECT probe_key, probe_text, match_key, match_name, dist, rank
FROM ranked WHERE rank <= {FUZZY_TOP_K}
""",
    doc=f"fuzzy name search: distinct-string dedup BEFORE retrieval, "
    f"rarest-{FUZZY_PREFIX_K} trigram candidates over the distinct-name "
    f"index, levenshtein on distinct pairs only, fan-out back to keys via "
    f"per-name champion lists — top-{FUZZY_TOP_K} per probe, integer ties",
)
def search_fuzzy_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate string search over part names — the search-box shape:
    probes are a deterministic corpus sample (every
    :data:`FUZZY_PROBE_MOD`-th part) corrupted by deleting their third
    character; retrieval joins each probe's :data:`FUZZY_PREFIX_K` RAREST
    trigrams (by distinct-name document frequency, ties by trigram — the
    PPJoin rarest-first prefix discipline from ``dedup_containment``)
    against the corpus trigram index; verification is exact Levenshtein,
    ranked ``(dist, match_key)`` for a deterministic
    top-:data:`FUZZY_TOP_K`.

    Scale shape — dedup BEFORE the expensive work (r6 rewrite): the
    index, the probes and the Levenshtein verify all operate on DISTINCT
    STRINGS, and keys re-enter only at the end. The first version indexed
    per-KEY rows; on a corpus whose name domain is much smaller than its
    row count (TPC-H part names draw from ~64 strings — and real corpora
    repeat titles/SKUs just as hard) every posting list was
    O(corpus/|domain|) and the candidate join went quadratic — measured
    134 s at sf1, 61× the sf0.1 cost for 10× the data. With distinct-name
    retrieval the candidate volume is bounded by |name domain|², the
    verify count by distinct (probe, name) pairs, and corpus size enters
    only through two dedup shuffles and the final champion fan-out. Key
    expansion is exact: ties on dist break by match_key, so only each
    name's :data:`FUZZY_TOP_K` smallest keys (a WindowGroupLimit per
    name) can ever reach a top-k — the champion-list device from IR.
    All joins stay UNHINTED (round-6 broadcast policy) — at true scale
    the distinct-name index is large and AQE picks the build side.

    Reference analog: none — extension surface (the string sibling of
    ``similarity_lsh_topk``; same retrieve-then-verify shape).
    """
    names = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), F.col("p_name").alias("name")
    )
    dnames = names.select("name").distinct()

    def trigrams(df: DataFrame, text: str) -> DataFrame:
        i = F.explode(F.sequence(F.lit(1), F.length(text) - 2)).alias("i")
        return (
            df.where(F.length(text) >= 3)
            .select(F.col(text), i)
            .select(F.col(text), F.col(text).substr(F.col("i"), F.lit(3)).alias("g"))
            .distinct()
        )

    grams = trigrams(dnames, "name")
    gram_df = grams.groupBy("g").agg(F.count("*").cast("bigint").alias("df"))
    probes = names.where(
        (F.col("key") % FUZZY_PROBE_MOD == 0) & (F.length("name") >= 4)
    ).select(
        F.col("key").alias("probe_key"),
        F.concat(
            F.col("name").substr(1, 2), F.expr("substr(name, 4)")
        ).alias("probe_text"),
    )
    dprobes = probes.select("probe_text").distinct()
    probe_grams = trigrams(dprobes, "probe_text").join(gram_df, "g")
    # rarest-K prefix per DISTINCT probe text (WindowGroupLimit frames are
    # the probe's gram count, never corpus-sized)
    w_rare = Window.partitionBy("probe_text").orderBy("df", "g")
    probe_prefix = (
        probe_grams.withColumn("rn", F.row_number().over(w_rare))
        .where(F.col("rn") <= FUZZY_PREFIX_K)
        .select("probe_text", "g")
    )
    cands = (
        probe_prefix.join(grams, "g")
        .select("probe_text", F.col("name").alias("match_name"))
        .distinct()
    )
    verified = cands.select(
        "probe_text",
        "match_name",
        F.levenshtein(F.col("probe_text"), F.col("match_name"))
        .cast("int")
        .alias("dist"),
    )
    # champion list: ties on dist break by key, so only each name's
    # FUZZY_TOP_K smallest keys can reach any top-k (one name exchange)
    w_champ = Window.partitionBy("name").orderBy("key")
    champions = (
        names.withColumn("rn", F.row_number().over(w_champ))
        .where(F.col("rn") <= FUZZY_TOP_K)
        .select(F.col("name").alias("match_name"), F.col("key").alias("match_key"))
    )
    w_rank = Window.partitionBy("probe_key").orderBy("dist", "match_key")
    return (
        probes.join(verified, "probe_text")
        .join(champions, "match_name")
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rank") <= FUZZY_TOP_K)
        .select(
            "probe_key", "probe_text", "match_key", "match_name", "dist", "rank"
        )
    )



#: RAKE: phrases returned (top-N by score)
RAKE_TOP_N = 20


@register(
    "text_rake_keywords",
    f"""
WITH frag AS (
  SELECT unnest(string_split(regexp_replace(lower(text),
           '\\b({_STOP})\\b', '|', 'g'), '|')) AS ph
  FROM documents
), phrases AS (
  SELECT trim(ph) AS phrase FROM frag WHERE trim(ph) <> ''
), occw AS (
  SELECT unnest(string_split_regex(phrase, ' +')) AS w,
         CAST(len(string_split_regex(phrase, ' +')) AS BIGINT) AS plen
  FROM phrases
), wstats AS (
  SELECT w,
         CAST(sum(plen) AS BIGINT) * 1000000 // count(*) AS w_score_micro
  FROM occw GROUP BY w
), dp AS (
  SELECT DISTINCT phrase FROM phrases
), dpw AS (
  SELECT phrase, unnest(string_split_regex(phrase, ' +')) AS w FROM dp
), scored AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(ws.w_score_micro) AS BIGINT) AS score_micro
  FROM dpw JOIN wstats ws USING (w) GROUP BY phrase
)
SELECT phrase, n_words, score_micro, rnk FROM (
  SELECT phrase, n_words, score_micro,
         CAST(row_number() OVER (ORDER BY score_micro DESC, phrase) AS INT)
           AS rnk
  FROM scored
) WHERE rnk <= {RAKE_TOP_N}
""",
    doc=f"RAKE keyword extraction: stopword-delimited candidate phrases, "
    "word score = co-occurrence degree / frequency in exact integer "
    f"micro-units, phrase score = sum of word scores; top {RAKE_TOP_N} "
    "phrases corpus-wide",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al.) over the
    corpus: candidate phrases are the maximal stopword-free runs (text
    split where a stopword occurs), each word scores degree/frequency —
    degree sums the lengths of every phrase occurrence containing the
    word (itself + co-occurring words), frequency counts occurrences —
    and a candidate phrase scores the sum of its word scores. The
    division happens once per WORD in exact integer micro-units
    (degree·10^6 div freq), so phrase scores are exact integer sums and
    the top-:data:`RAKE_TOP_N` cut is a total order with no float ties.

    Scale shape: phrase extraction is a row-local map (regexp replace +
    split + explode) that runs ONCE — occurrences fold to (phrase, cnt)
    first, so the word-stats and distinct-phrase branches both derive
    from that single aggregate's exchange instead of each replanning the
    corpus scan (r11); word stats are ONE hash aggregate on the word key
    over the vocabulary-sized distinct-phrase frame (occurrence weights
    carried by cnt); phrase scores re-join the deduped phrase table to
    the word table on the same key — both sides shuffle once on the
    word. The ranked cut is orderBy+limit (TakeOrderedAndProject — a
    per-partition top-N and a single reduce, never a global sort), and
    the rank window runs over the returned ≤:data:`RAKE_TOP_N`-row frame.

    Reference analog: none (extension surface — text-analysis family,
    beside `text_tfidf_top_terms`, which ranks single terms by corpus
    rarity; RAKE ranks multi-word phrases by within-phrase cohesion).
    """
    docs = table(spark, sf_dir, "documents")
    frag = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower("text"), f"\\b({_STOP})\\b", "|"),
                "\\|",
            )
        ).alias("ph")
    )
    phrases = frag.select(F.trim("ph").alias("phrase")).where(
        F.col("phrase") != ""
    )
    # ONE corpus pass (r11 optimization): the word-stats branch and the
    # distinct-phrase branch used to each replan the stopword-regexp +
    # explode subtree (two full document scans — no shared exchange below
    # them, so not even AQE stage reuse could collapse the pair). Folding
    # occurrences to (phrase, cnt) FIRST makes both branches derive from
    # that one aggregate: Σ_occurrences plen == Σ_distinct-phrases plen·cnt
    # and count(occurrences) == Σ cnt, so w_score_micro is the identical
    # exact integer. The phrase aggregate's exchange is shared by both
    # consumers; word rows now explode from the distinct-phrase frame
    # (vocabulary-sized), not the occurrence stream.
    pc = phrases.groupBy("phrase").agg(F.count("*").alias("cnt"))
    arr = F.split("phrase", " +")
    pw = pc.select(
        "phrase",
        "cnt",
        F.explode(arr).alias("w"),
        F.size(arr).cast("bigint").alias("plen"),
    )
    wstats = pw.groupBy("w").agg(
        F.expr(
            "CAST(sum(plen * cnt) AS BIGINT) * 1000000 div sum(cnt)"
        ).alias("w_score_micro")
    )
    scored = pw.select("phrase", "w").join(wstats, "w").groupBy("phrase").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("w_score_micro").cast("bigint").alias("score_micro"),
    )
    # TakeOrderedAndProject: top-N, no full sort materializes
    top = scored.orderBy(F.desc("score_micro"), "phrase").limit(RAKE_TOP_N)
    # SCALE GUARD: partition-less window over the RAKE_TOP_N-row frame only.
    w_rank = Window.orderBy(F.desc("score_micro"), "phrase")
    return top.withColumn("rnk", F.row_number().over(w_rank).cast("int"))


#: domain router lexicon (database jargon) and the routing floor:
#: docs whose lexicon density crosses 30% route to the domain corpus
_DOMAIN_LEX = "select|join|table|query|scan|sort|merge|agg|hash|window"
DOMAIN_ROUTE_PCT = 30


@register(
    "text_domain_route",
    rf"""
WITH stats AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         CAST(len(regexp_extract_all(lower(text),
              '\b({_DOMAIN_LEX})\b')) AS BIGINT) AS n_hits
  FROM documents
)
SELECT doc_id, lang, n_tokens, n_hits,
       n_hits * 100 >= n_tokens * {DOMAIN_ROUTE_PCT} AS route_domain
FROM stats
""",
    doc=f"corpus routing by domain-lexicon density: database-jargon hits "
    f"per token, route when hits*100 >= tokens*{DOMAIN_ROUTE_PCT} — integer "
    "cross-multiplied threshold, one row-local map",
)
def text_domain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus ROUTER every mixture pipeline runs before the mixture
    math: classify each document against a domain lexicon (here database
    jargon — which the synthetic fixture is genuinely rich in, so the
    routing decision is non-degenerate) and flag documents whose lexicon
    density crosses the floor for the domain-specific corpus. The same
    shape with a code lexicon routes code vs prose; with a science
    lexicon, papers vs web — the lexicon is the parameter, the plan is
    identical. Downstream, `corpus_quota_apportion` turns the routed
    populations into exact token budgets.

    The decision is an integer cross-multiplied comparison
    (hits·100 ≥ tokens·floor) — the Gopher-filter discipline: no float
    ratio, no rounding boundary to disagree on.

    Scale shape: one narrow row-local map (two regexp passes per doc),
    no exchange at all — the cheapest possible tier of the text family,
    meant to run inline with ingestion.

    Reference analog: none (extension surface — text family, beside
    `text_gopher_filters` / `text_lang_id`).
    """
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast(
        "bigint"
    )
    n_hits = F.size(
        F.regexp_extract_all(
            F.lower("text"), F.lit(rf"\b({_DOMAIN_LEX})\b"), 0
        )
    ).cast("bigint")
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_hits.alias("n_hits"),
        (F.col("n_hits") * 100 >= F.col("n_tokens") * DOMAIN_ROUTE_PCT).alias(
            "route_domain"
        ),
    ).select("doc_id", "lang", "n_tokens", "n_hits", "route_domain")


@register(
    "text_langid_confusion",
    f"""
WITH pred AS (
  SELECT lang AS true_lang,
         CASE WHEN len(regexp_extract_all(lower(text), '({_TRIGRAM_RE})'))
                   / nullif(CAST(length(text) AS DOUBLE), 0) > 0.02
              THEN 'en' ELSE 'unk' END AS pred_lang
  FROM documents
), cells AS (
  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST(sum(CASE WHEN (true_lang = 'en') = (pred_lang = 'en')
                       THEN n ELSE 0 END) AS BIGINT) AS agree
  FROM cells
)
SELECT c.true_lang, c.pred_lang, c.n,
       CAST(c.n * 1000000 // t.total AS BIGINT) AS share_micro,
       CAST(t.agree * 1000000 // t.total AS BIGINT) AS accuracy_micro
FROM cells c, tot t
""",
    doc="language-ID model evaluation: true-vs-predicted confusion cells "
    "with exact micro-unit shares and overall binary (en vs not-en) "
    "accuracy — one aggregate, one |langs|²-bounded frame",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVALUATION tier for the language-ID classifiers (the sibling of
    `similarity_quantized_recall_eval` and `similarity_knn_label_vote`'s
    accuracy audit): cross-tabulate the n-gram classifier's prediction
    against the fixture's labeled lang, emit every confusion cell with
    its exact micro-unit share, and carry the overall binary accuracy
    (classifier only separates en vs not-en, so agreement is scored on
    that axis) on every row for the dashboard join. The heuristic's
    failure modes become visible per true language — exactly the table a
    pipeline owner reads before trusting `corpus_language_rebalance`'s
    input.

    Exactness: cells are exact integers; shares and accuracy are single
    integer floor divisions to micro-units — no float anywhere.

    Scale shape: ONE hash aggregate on the (true, pred) pair (bounded by
    |langs|², never docs), a 1-row broadcast for the totals, row-local
    division. The classifier expression is inlined, so the corpus is
    scanned ONCE.

    Reference analog: none (extension surface — text family).
    """
    d = table(spark, sf_dir, "documents")
    hits = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(f"({_TRIGRAM_RE})"), 0)
    ).cast("double")
    density = hits / F.nullif(F.length("text").cast("double"), F.lit(0.0))
    pred = d.select(
        F.col("lang").alias("true_lang"),
        F.when(density > 0.02, F.lit("en")).otherwise(F.lit("unk")).alias(
            "pred_lang"
        ),
    )
    cells = pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    agree = F.sum(
        F.when(
            (F.col("true_lang") == "en") == (F.col("pred_lang") == "en"),
            F.col("n"),
        ).otherwise(0)
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("total"),
        agree.cast("bigint").alias("agree"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "true_lang",
        "pred_lang",
        "n",
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("share_micro"),
        F.expr("CAST(agree * 1000000 div total AS BIGINT)").alias(
            "accuracy_micro"
        ),
    )


#: Naive Bayes language classifier: vocabulary cap (top words by corpus
#: frequency, deterministic (count DESC, word) order) and Laplace +1
NB_VOCAB = 512


@register(
    "text_nb_lang_classifier",
    rf"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents
), toks_ne AS (
  SELECT * FROM toks WHERE w <> ''
), vocab AS (
  SELECT w FROM (
    SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks_ne GROUP BY w
  ) ORDER BY cnt DESC, w LIMIT {NB_VOCAB}
), vsize AS (
  SELECT CAST(count(*) AS BIGINT) AS v FROM vocab
), dt AS (
  SELECT t.doc_id, t.lang, t.w, CAST(count(*) AS BIGINT) AS m
  FROM toks_ne t SEMI JOIN vocab USING (w)
  GROUP BY 1, 2, 3
), classes AS (
  SELECT lang AS c, CAST(count(*) AS BIGINT) AS d_c FROM documents GROUP BY 1
), dtotal AS (
  SELECT CAST(count(*) AS BIGINT) AS d FROM documents
), cwc AS (
  SELECT lang AS c, w, CAST(sum(m) AS BIGINT) AS cnt FROM dt GROUP BY 1, 2
), nc AS (
  SELECT c, CAST(sum(cnt) AS BIGINT) AS n_c FROM cwc GROUP BY c
), model AS (
  SELECT vo.w, cl.c,
         CAST(round(ln(CAST(coalesce(cw.cnt, 0) + 1 AS DOUBLE)
                       / (nc.n_c + vs.v)), 12) AS DECIMAL(25, 12)) AS term
  FROM vocab vo
  CROSS JOIN classes cl
  CROSS JOIN vsize vs
  JOIN nc ON nc.c = cl.c
  LEFT JOIN cwc cw ON cw.c = cl.c AND cw.w = vo.w
), priors AS (
  SELECT cl.c,
         CAST(round(ln(CAST(cl.d_c AS DOUBLE) / dt2.d), 12)
              AS DECIMAL(38, 12)) AS prior
  FROM classes cl CROSS JOIN dtotal dt2
), scores AS (
  SELECT d.doc_id, d.lang, mo.c,
         sum(CAST(d.m AS DECIMAL(12, 0)) * mo.term) AS loglik
  FROM dt d JOIN model mo ON mo.w = d.w
  GROUP BY 1, 2, 3
), full_scores AS (
  SELECT s.doc_id, s.lang, s.c, s.loglik + p.prior AS score
  FROM scores s JOIN priors p ON p.c = s.c
), pred AS (
  SELECT doc_id, lang, c AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, c) AS rn
    FROM full_scores
  ) WHERE rn = 1
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
""",
    doc=f"trained multinomial Naive Bayes language classifier (top-"
    f"{NB_VOCAB} vocab, Laplace +1): train + score + confusion matrix in "
    "one plan; per-term logs rounded to 12dp and summed in decimal "
    "(order-free), argmax ties broken by class name",
)
def text_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED-model tier of the language-ID family: where
    `text_lang_id`/`text_ngram_lang_id` apply fixed heuristics and
    `text_langid_confusion` audits them, this one TRAINS a multinomial
    Naive Bayes model on the corpus's own labels and scores every
    document with it, emitting the (true, predicted) confusion matrix —
    train + inference as one declarative plan, the pattern a fasttext-
    style quality/language classifier pipeline runs at corpus scale.

    Determinism discipline: each per-(word, class) log-likelihood term
    ln((c_wc+1)/(n_c+V)) is computed from IEEE-identical doubles (exact
    integer operands, one division), rounded to 12dp, and cast to
    decimal(25,12); the per-word contribution m·term multiplies a
    decimal(12,0) count by that decimal(25,12) term, so the product is
    EXACT at scale 12 in BOTH engines (Spark 12+25+1 = 38 digits, DuckDB
    12+25 = 37 — neither truncates the scale) and each document's score
    is an ORDER-FREE decimal sum (the chi2/JSD discipline); the per-doc
    argmax (score DESC, class ASC) is a total order both engines walk
    identically. (decimal(18,0)·decimal(38,12) would NOT be exact:
    Spark demotes that product to decimal(38,6), flipping near-tie
    argmaxes at the 1e-6 level.)

    Scale shape: the model is VOCABULARY×CLASSES-sized (top-
    :data:`NB_VOCAB` words by corpus frequency — a TakeOrderedAndProject
    cut, deterministic (count DESC, word) order — dense via a vocab ×
    classes cross join, ≤ 512×|langs| rows) and BROADCASTS onto the
    (doc, word, multiplicity) stream; scoring shuffles once on
    (doc, class) for the decimal sum and once per doc for the argmax.
    Class fan-out is |langs| (bounded); nothing ever shuffles on the
    unbounded raw-token key except the one vocabulary-count aggregate.

    Reference analog: none (extension surface — text-analysis family,
    beside text_langid_confusion / text_unigram_logprob).
    """
    d = table(spark, sf_dir, "documents")
    # spread_scan: tokenize/explode + the vocab partial aggregate are the
    # heavy map work above the 1-split fixture scan (no-op at real split
    # counts); every downstream reduction is exact-integer or decimal.
    toks = spread_scan(d, "doc_id", src=(sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(NB_VOCAB)
        .select("w")
    )
    vocab = vocab.localCheckpoint(eager=False)
    dt = (
        toks.join(F.broadcast(vocab), "w", "left_semi")
        .groupBy("doc_id", "lang", "w")
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    classes = d.groupBy(F.col("lang").alias("c")).agg(
        F.count("*").cast("bigint").alias("d_c")
    )
    dtotal = d.agg(F.count("*").cast("bigint").alias("dn"))
    cwc = dt.groupBy(F.col("lang").alias("c"), "w").agg(
        F.sum("m").cast("bigint").alias("cnt")
    )
    nc = cwc.groupBy("c").agg(F.sum("cnt").cast("bigint").alias("n_c"))
    vsize = vocab.agg(F.count("*").cast("bigint").alias("v"))
    model = (
        vocab.crossJoin(classes.select("c"))
        .crossJoin(F.broadcast(vsize))
        .join(F.broadcast(nc), "c")
        .join(F.broadcast(cwc), ["c", "w"], "left")
        .select(
            "w",
            "c",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_c") + F.col("v"))
                ),
                12,
            )
            .cast("decimal(25,12)")
            .alias("term"),
        )
    )
    priors = classes.crossJoin(F.broadcast(dtotal)).select(
        "c",
        F.round(
            F.log(F.col("d_c").cast("double") / F.col("dn")), 12
        )
        .cast("decimal(38,12)")
        .alias("prior"),
    )
    scores = (
        dt.join(F.broadcast(model), "w")
        .groupBy("doc_id", "lang", "c")
        .agg(
            F.sum(F.col("m").cast("decimal(12,0)") * F.col("term")).alias(
                "loglik"
            )
        )
    )
    full = scores.join(F.broadcast(priors), "c").select(
        "doc_id",
        "lang",
        "c",
        (F.col("loglik") + F.col("prior")).alias("score"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("score"), "c")
    pred = (
        full.withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") == 1)
        .select("lang", F.col("c").alias("predicted"))
    )
    return pred.groupBy("lang", "predicted").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


@register(
    "text_tokenizer_fertility",
    _bpe_oracle_ctes()
    + f""",
dw AS (
  SELECT d.lang, unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS w,
         octet_length(encode(d.text)) AS _b, d.doc_id
  FROM documents d
), perdoc AS (
  SELECT lang, doc_id, max(_b) AS n_bytes,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(string_split(v.s, ' '))) AS BIGINT) AS n_tok
  FROM dw JOIN words{BPE_LEARN_ROUNDS} v ON dw.w = v.word
  WHERE dw.w <> ''
  GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
       CAST(CAST(sum(n_tok) AS HUGEINT) * 1000000 // sum(n_words) AS BIGINT)
         AS fertility_micro,
       CAST(CAST(sum(n_bytes) AS HUGEINT) * 1000000 // sum(n_tok) AS BIGINT)
         AS bytes_per_token_micro
FROM perdoc GROUP BY lang
""",
    doc="tokenizer-quality eval per language: BPE tokens per whitespace "
    "word (fertility) and UTF-8 bytes per token under the corpus-trained "
    "merges — exact integer micro-ratios, one floor division each",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVALUATION member of the BPE lifecycle (learn → encode →
    FERTILITY): per language, how many tokens does the trained tokenizer
    spend per whitespace word (fertility — the standard multilingual
    tokenizer-equity metric) and how many UTF-8 bytes ride in each token
    (compression). A tokenizer trained on a skewed language mix shows
    high fertility on the under-represented languages — the number a
    data-mixture pipeline reads before rebalancing (`corpus_language_
    rebalance` is the actuator; this is the sensor).

    Exactness: token counts come from the same word-level vocabulary
    join as `text_bpe_encode` (the corpus is never re-tokenized per
    document); the two ratios are single floor divisions of exact
    HUGEINT/decimal128 sums to integer micro-units.

    Scale shape: the per-doc aggregate shuffles once on (lang, doc_id)
    after the broadcast vocabulary join; the language rollup is a
    |langs|-row re-aggregate of those partials. Training lineage rides
    lazily as in `text_bpe_learn`; production reads the persisted merge
    table.

    Reference analog: none (extension surface — text/tokenizer family,
    beside text_bpe_learn / text_bpe_encode / corpus_language_rebalance).
    """
    final_words, _ = _bpe_train(spark, sf_dir)
    vocab = final_words.select(
        "word", F.size(F.split("s", " ")).cast("bigint").alias("n_sym")
    )
    d = table(spark, sf_dir, "documents")
    dw = d.select(
        "lang",
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("_b"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    perdoc = (
        dw.join(vocab, "word")
        .groupBy("lang", "doc_id")
        .agg(
            F.max("_b").alias("n_bytes"),
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_tok"),
        )
    )
    dec = "decimal(38,0)"
    return perdoc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
        F.expr(
            f"CAST(CAST(sum(n_tok) AS {dec}) * 1000000"
            f" div sum(n_words) AS BIGINT)"
        ).alias("fertility_micro"),
        F.expr(
            f"CAST(CAST(sum(n_bytes) AS {dec}) * 1000000"
            f" div sum(n_tok) AS BIGINT)"
        ).alias("bytes_per_token_micro"),
    )


#: calibration audit: fixed-width probability bins (no global sort) and the
#: micro-unit scale shared with the rest of the exact-integer family
CALIB_BINS = 10


@register(
    "text_quality_calibration",
    f"""
WITH sig AS (
  SELECT {_TOKENS_SQL} AS toks,
         {_STOPS_SQL} AS stops,
         {_NONWS_SQL} AS nc,
         {_DSTOPS_SQL} AS dstops,
         {_ALPHA_WORDS_SQL} AS alphaw
  FROM documents
), scored AS (
  SELECT CASE WHEN toks = 0 THEN 0
              ELSE least(1000000, CAST(stops AS BIGINT) * 1000000 // toks)
         END AS p_micro,
         CASE WHEN toks BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
               AND nc BETWEEN {GOPHER_MIN_MEANLEN} * toks
                          AND {GOPHER_MAX_MEANLEN} * toks
               AND dstops >= {GOPHER_MIN_STOPWORDS}
               AND 5 * alphaw >= 4 * toks
              THEN 1 ELSE 0 END AS label
  FROM sig
), binned AS (
  SELECT least({CALIB_BINS - 1}, p_micro // {1000000 // CALIB_BINS}) AS bin,
         p_micro, label
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p_micro) // count(*) AS BIGINT) AS mean_pred_micro,
       CAST(sum(label) * 1000000 // count(*) AS BIGINT) AS pass_rate_micro,
       CAST(abs(sum(p_micro) // count(*)
                - sum(label) * 1000000 // count(*)) AS BIGINT) AS gap_micro
FROM binned GROUP BY bin
""",
    doc="calibration audit of the stopword-ratio quality scorer against the "
    "Gopher pass label: fixed-width probability bins, per-bin mean "
    "prediction vs empirical pass rate in exact integer micro-units — the "
    "reliability-diagram table, no global sort",
)
def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVALUATION tier for the quality-filter family (the recall-eval
    discipline applied to scoring): `text_quality_score` emits signals and
    `text_gopher_filters` a pass/fail gate, but a curation pipeline that
    THRESHOLDS a score needs to know whether the score is CALIBRATED —
    does a doc scored 0.7 pass the gate ~70% of the time? This operator
    bins the stopword-ratio score (min(1, stops/tokens), the scorer's
    natural-language-confidence proxy) into :data:`CALIB_BINS` fixed-width
    bins and reports, per bin, the mean prediction vs the empirical
    Gopher-conjunction pass rate plus their absolute gap — the
    reliability-diagram table whose n-weighted gap sum is the expected
    calibration error (ECE, Guo et al. 2017's binned form).

    Numeric discipline: the score is an exact integer micro-ratio (one
    floor division per doc, clamped at 1e6 — regex stopword hits can
    exceed whitespace tokens), bins are fixed-width integer cuts (NO
    quantile pass, so no global sort), and per-bin means/rates are one
    floor division each over exact sums — bit-identical across engines.

    Scale shape: one narrow projection (token/char/stopword counts), one
    hash aggregate on the ≤10-key bin — map-side partials collapse
    everything; at 100 TB this is a single bounded-key shuffle.

    Reference analog: none (extension surface — text-analysis family,
    evaluation tier beside text_langid_confusion /
    similarity_quantized_recall_eval).
    """
    d = table(spark, sf_dir, "documents")
    toks = token_count(F.col("text")).cast("bigint")
    stops = stopword_count(F.col("text")).cast("bigint")
    nc = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    dstops = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(f"\\b({_STOP})\\b"), 0
            )
        )
    )
    alphaw = F.size(F.regexp_extract_all(F.col("text"), F.lit(_ALPHA_WORD), 0))
    sig = d.select(
        toks.alias("toks"),
        stops.alias("stops"),
        nc.alias("nc"),
        dstops.alias("dstops"),
        alphaw.alias("alphaw"),
    )
    scored = sig.select(
        F.when(F.col("toks") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr("stops * 1000000 div toks"),
            )
        )
        .alias("p_micro"),
        F.when(
            F.col("toks").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & F.col("nc").between(
                GOPHER_MIN_MEANLEN * F.col("toks"),
                GOPHER_MAX_MEANLEN * F.col("toks"),
            )
            & (F.col("dstops") >= GOPHER_MIN_STOPWORDS)
            & (5 * F.col("alphaw") >= 4 * F.col("toks")),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    width = 1000000 // CALIB_BINS
    binned = scored.select(
        F.least(
            F.lit(CALIB_BINS - 1).cast("bigint"),
            F.expr(f"p_micro div {width}"),
        ).alias("bin"),
        "p_micro",
        "label",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr("CAST(sum(p_micro) div count(*) AS BIGINT)").alias(
            "mean_pred_micro"
        ),
        F.expr("CAST(sum(label) * 1000000 div count(*) AS BIGINT)").alias(
            "pass_rate_micro"
        ),
        F.expr(
            "CAST(abs(sum(p_micro) div count(*)"
            " - sum(label) * 1000000 div count(*)) AS BIGINT)"
        ).alias("gap_micro"),
    )


@register(
    "text_perplexity_buckets",
    r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), toks_ne AS (
  SELECT * FROM toks WHERE tok <> ''
), freq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks_ne GROUP BY tok
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM freq
), perdoc AS (
  SELECT doc_id, any_value(lang) AS lang,
         CAST(sum(CAST(floor(ln(CAST(t AS DOUBLE) / c) * 1000000 + 0.5)
                       AS BIGINT)) // count(*) AS BIGINT) AS nll_micro
  FROM toks_ne JOIN freq USING (tok) CROSS JOIN tot
  GROUP BY doc_id
), hist AS (
  SELECT lang, nll_micro // 1000 AS key_milli,
         CAST(count(*) AS BIGINT) AS n
  FROM perdoc GROUP BY 1, 2
), cum AS (
  SELECT lang, key_milli, n,
         coalesce(sum(n) OVER (PARTITION BY lang ORDER BY key_milli
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         sum(n) OVER (PARTITION BY lang) AS total
  FROM hist
), bucketed AS (
  SELECT lang, key_milli, n,
         CASE CAST(3 * cum_before // total AS BIGINT)
           WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
  FROM cum
)
SELECT lang, bucket,
       CAST(sum(n) AS BIGINT) AS n_docs,
       min(key_milli) AS min_nll_milli,
       max(key_milli) AS max_nll_milli
FROM bucketed GROUP BY 1, 2
""",
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): per-lang "
    "head/middle/tail tertiles of the unigram-LM NLL, via the histogram-"
    "quantile discipline (no per-doc ntile sort) — exact integer micro-"
    "NLL, milli-keyed histogram, ties share a bucket",
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical CCNet curation step: split each language's documents
    into head/middle/tail perplexity tertiles (head = most corpus-typical,
    the slice pretraining keeps or upsamples). The textbook form is a
    per-language ``ntile(3)`` over doc scores — a per-language TOTAL SORT
    a distributed engine must refuse; this uses the
    ``events_rfm_segmentation`` histogram-quantile discipline instead:
    per-doc NLL snapped to exact integer micro-units (per-token
    ``floor(ln(t/c)·1e6 + 0.5)`` over IEEE-identical doubles, one integer
    floor-division per doc), coarsened to a MILLI-keyed value histogram
    (bounded by the NLL value range, not the corpus), a lang-partitioned
    cumulative window over that histogram, and the tertile label by
    integer arithmetic ``3·cum_before div total``. Docs sharing a milli
    key share a bucket on both engines — no tiebreak ambiguity.

    Scale shape: one token shuffle for the frequency table (the model is
    Heaps-bounded and broadcasts), one doc-keyed aggregate, then
    histogram-sized work only. At 100 TB nothing sorts more rows than
    the histogram.

    Reference analog: none (extension surface — text-analysis family,
    between text_unigram_logprob [the scorer] and corpus_mixture_schedule
    [the consumer of the kept slice]).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    tot = freq.agg(F.sum("c").cast("bigint").alias("t"))
    perdoc = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.expr(
                "CAST(sum(CAST(floor(ln(CAST(t AS DOUBLE) / c) * 1000000"
                " + 0.5) AS BIGINT)) div count(*) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    hist = perdoc.groupBy(
        "lang", F.expr("nll_micro div 1000").alias("key_milli")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = (
        Window.partitionBy("lang")
        .orderBy("key_milli")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "key_milli",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_before"),
        F.sum("n").over(wt).alias("total"),
    )
    bucketed = cum.select(
        "lang",
        "key_milli",
        "n",
        F.when(F.expr("3 * cum_before div total") == 0, "head")
        .when(F.expr("3 * cum_before div total") == 1, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.min("key_milli").alias("min_nll_milli"),
        F.max("key_milli").alias("max_nll_milli"),
    )


# --- learned quality filter: integer-exact logistic regression -------------

#: unrolled full-batch gradient-descent steps for the learned quality
#: filter — each step is one corpus aggregate, so the budget is a fixed,
#: plannable number of scans (the BPE_ROUNDS / power-iteration discipline)
LOGREG_STEPS = 8
#: learning rate in milli units (4.0) — tuned on the fixture: smaller rates
#: leave the decision threshold untouched (all-negative predictions),
#: larger ones oscillate; AUC is flat ~0.85 across 2x either way
LOGREG_LR_MILLI = 4000
#: feature count including the bias column x0
_LOGREG_NF = 5


def _logreg_x_exprs(div: str) -> list[str]:
    """The five milli-scaled integer feature expressions over the ``sig``
    columns (nw, nc, dstops, alphaw), shared verbatim by Spark
    (``div='div'``) and DuckDB (``div='//'``) — both operators truncate
    toward zero, so every feature is bit-identical across engines. The
    features are the per-rule MARGINS of the Gopher panel (distance into /
    out of each rule's pass band, clamped to ±500): a linear model cannot
    represent an interval rule like 20 ≤ nw ≤ 80 on the raw count, but it
    can on the band margin min(nw−20, 80−nw) — the standard
    rule-distillation featurization for fasttext-style quality filters."""
    clamp = lambda e: f"greatest(-500, least(500, {e}))"  # noqa: E731
    return [
        "CAST(500 AS BIGINT)",
        "CAST({} AS BIGINT)".format(
            clamp(
                f"least(nw - {GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS} - nw) * 25"
            )
        ),
        "CAST({} AS BIGINT)".format(
            clamp(
                f"(least(nc - {GOPHER_MIN_MEANLEN} * nw, "
                f"{GOPHER_MAX_MEANLEN} * nw - nc) * 1000) {div} greatest(nw, 1)"
            )
        ),
        "CAST({} AS BIGINT)".format(
            clamp(f"(dstops - {GOPHER_MIN_STOPWORDS}) * 125")
        ),
        "CAST({} AS BIGINT)".format(
            clamp(f"((5 * alphaw - 4 * nw) * 250) {div} greatest(nw, 1)")
        ),
    ]


_LOGREG_Y_SQL = f"""CASE WHEN nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
       AND nc BETWEEN {GOPHER_MIN_MEANLEN} * nw AND {GOPHER_MAX_MEANLEN} * nw
       AND dstops >= {GOPHER_MIN_STOPWORDS}
       AND 5 * alphaw >= 4 * nw
  THEN 1 ELSE 0 END"""


def _logreg_sql_prefix(train_where: str = "", score_where: str = "") -> str:
    """The shared oracle prefix: feature table, then LOGREG_STEPS unrolled
    (z → fast-sigmoid p → gradient → weight update) CTEs, ending in the
    ``scored`` table. All integer: z and p in milli, gradients in micro,
    every division a truncating ``//`` on HUGEINT operands.
    ``train_where`` / ``score_where`` scope the GD steps and the final
    scoring pass to a doc subset (the apply tier trains on the base
    corpus and scores only the ingest batch); both default to the full
    corpus, which is the two original registered oracles verbatim."""
    xs = _logreg_x_exprs("//")
    cols = ", ".join(f"{e} AS x{j}" for j, e in enumerate(xs))
    zsum = " + ".join(f"x{j} * w{j}" for j in range(_LOGREG_NF))
    parts = [
        f"""WITH sig AS (
  SELECT doc_id, {_TOKENS_SQL} AS nw, {_NONWS_SQL} AS nc,
         {_DSTOPS_SQL} AS dstops, {_ALPHA_WORDS_SQL} AS alphaw
  FROM documents
), feat AS (
  SELECT doc_id, {cols},
         {_LOGREG_Y_SQL} AS y
  FROM sig
), w0 AS (SELECT """
        + ", ".join(f"CAST(0 AS HUGEINT) AS w{j}" for j in range(_LOGREG_NF))
        + ")"
    ]
    for k in range(1, LOGREG_STEPS + 1):
        gcols = ", ".join(
            f"sum(CAST(p - 1000 * y AS HUGEINT) * x{j}) // count(*) AS g{j}"
            for j in range(_LOGREG_NF)
        )
        wcols = ", ".join(
            f"w{j} - ({LOGREG_LR_MILLI} * g{j}) // 1000000 AS w{j}"
            for j in range(_LOGREG_NF)
        )
        parts.append(
            f""", s{k} AS (
  SELECT f.*, 500 + (500 * z) // (1000 + abs(z)) AS p FROM (
    SELECT f0.*, ({zsum}) // 1000 AS z FROM feat f0 CROSS JOIN w{k - 1} {train_where}
  ) f
), g{k} AS (
  SELECT {gcols} FROM s{k}
), w{k} AS (
  SELECT {wcols} FROM w{k - 1} CROSS JOIN g{k}
)"""
        )
    parts.append(
        f""", scored AS (
  SELECT doc_id, y, 500 + (500 * z) // (1000 + abs(z)) AS p FROM (
    SELECT f0.*, ({zsum}) // 1000 AS z
    FROM feat f0 CROSS JOIN w{LOGREG_STEPS} {score_where}
  ) f
)"""
    )
    return "".join(parts)


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x0..x4, y): the milli-margin features and the Gopher-rule
    conjunction label, one narrow JVM-side pass over the document scan."""
    d = table(spark, sf_dir, "documents")
    nw = token_count(F.col("text"))
    nc = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    dstops = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(f"\\b({_STOP})\\b"), 0
            )
        )
    )
    alphaw = F.size(F.regexp_extract_all(F.col("text"), F.lit(_ALPHA_WORD), 0))
    sig = d.select(
        "doc_id",
        nw.alias("nw"),
        nc.alias("nc"),
        dstops.alias("dstops"),
        alphaw.alias("alphaw"),
    )
    xs = _logreg_x_exprs("div")
    return sig.selectExpr(
        "doc_id",
        *[f"{e} AS x{j}" for j, e in enumerate(xs)],
        f"{_LOGREG_Y_SQL} AS y",
    )


def _logreg_feat_path(spark: SparkSession, sf_dir: str) -> str:
    """Publish the feature table once per (process, fixture) — the regex
    pass runs exactly once and all three registered queries share it."""
    from ufload_spark.sources.loader import memo_publish

    return memo_publish(
        spark,
        "logreg_features",
        sf_dir,
        lambda: _logreg_features(spark, sf_dir),
    )


def _logreg_fit(spark: SparkSession, sf_dir: str):
    """Train the quality classifier: publish the feature table once
    (stage→audit→publish), then LOGREG_STEPS full-batch GD steps, each
    ONE aggregate over the published features with the current 1-row
    weight frame broadcast. Returns ``(feat, w)``: the published feature
    frame and the trained 1-row weight frame (w0..w4, milli units)."""
    feat = spark.read.parquet(_logreg_feat_path(spark, sf_dir))
    return feat, _logreg_train_weights(spark, feat)


def _logreg_train_weights(spark: SparkSession, feat: DataFrame) -> DataFrame:
    """The GD loop over an arbitrary feature frame (the full corpus for
    the train/eval tiers, the base slice for the apply tier). The
    per-step lineage cut on the weight frame is the HITS/LPA lesson —
    without it step k's broadcast subtree re-executes the whole step
    1..k−1 prefix."""
    w = spark.createDataFrame(
        [tuple([0] * _LOGREG_NF)],
        ", ".join(f"w{j} long" for j in range(_LOGREG_NF)),
    )
    zsum = " + ".join(f"x{j} * w{j}" for j in range(_LOGREG_NF))
    for _ in range(LOGREG_STEPS):
        p = feat.crossJoin(F.broadcast(w)).selectExpr(
            "y",
            *[f"x{j}" for j in range(_LOGREG_NF)],
            f"({zsum}) div 1000 AS z",
        ).selectExpr("*", "500 + (500 * z) div (1000 + abs(z)) AS p")
        # the gradient mean: sums as DECIMAL(38,0) (the modularity
        # discipline — per-row products fit int64, corpus sums may not at
        # 10^10 docs), quotient back to BIGINT; `div` truncates toward
        # zero exactly like DuckDB's HUGEINT `//`
        g = p.selectExpr(
            *[
                f"CAST(CAST(sum(CAST(p - 1000 * y AS decimal(38,0)) * x{j}) "
                f"AS decimal(38,0)) div CAST(count(*) AS decimal(38,0)) "
                f"AS BIGINT) AS g{j}"
                for j in range(_LOGREG_NF)
            ]
        )
        w = w.crossJoin(F.broadcast(g)).selectExpr(
            *[
                f"CAST(w{j} - ({LOGREG_LR_MILLI} * g{j}) div 1000000 "
                f"AS BIGINT) AS w{j}"
                for j in range(_LOGREG_NF)
            ]
        )
        w = w.localCheckpoint(eager=False)
    return w


def _logreg_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label, score_milli): the trained model applied to every
    document — one broadcast of the 5-weight row against the published
    feature scan."""
    feat, w = _logreg_fit(spark, sf_dir)
    zsum = " + ".join(f"x{j} * w{j}" for j in range(_LOGREG_NF))
    return (
        feat.crossJoin(F.broadcast(w))
        .selectExpr(
            "doc_id",
            "CAST(y AS INT) AS label",
            f"({zsum}) div 1000 AS z",
        )
        .selectExpr(
            "doc_id",
            "label",
            "CAST(500 + (500 * z) div (1000 + abs(z)) AS BIGINT) AS score_milli",
        )
    )


@register(
    "text_quality_logreg",
    _logreg_sql_prefix()
    + """
SELECT doc_id, CAST(y AS INT) AS label, CAST(p AS BIGINT) AS score_milli
FROM scored
""",
    doc=f"learned quality filter: logistic regression ({LOGREG_STEPS} "
    "unrolled full-batch GD steps, integer-milli fast-sigmoid) trained on "
    "the Gopher-rule conjunction labels over per-rule margin features; "
    "emits every document's label and learned score",
)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned tier of the quality stack (r10 VERDICT ask #7) — the
    fasttext-style classifier real curation pipelines run between cheap
    rules and expensive LLM judges: logistic regression trained by
    :data:`LOGREG_STEPS` unrolled full-batch gradient-descent steps on
    the :func:`text_gopher_filters` conjunction as the label, over
    clamped per-rule margin features (see :func:`_logreg_x_exprs`).

    Numeric discipline (the `embedding_pca_power` / `text_bpe_learn`
    exact-arithmetic pattern): everything is integer — features, z and
    the activation in milli units, gradients in micro — and the
    activation is the RATIONAL fast sigmoid σ(z) ≈ 1/2 + z/(2(1+|z|))
    rather than the exponential form, so there is no transcendental
    call whose last-ulp behavior could differ between engines; every
    division is a truncating integer divide (Spark ``div`` == DuckDB
    HUGEINT ``//``), so the weight trajectory and every score are
    bit-identical across engines AND across partitionings (integer sums
    are order-free). An engine-external pure-python replay pins the
    trajectory a third way (tests/test_analytics_invariants.py).

    Scale shape: the feature table is published once (one regex pass
    over the corpus, stage→audit→publish); each GD step is ONE
    map-side-partial aggregate over that narrow table with the 5-weight
    row broadcast — LOGREG_STEPS + 1 scans total, no window, no join
    wider than a 1-row broadcast, driver never sees a row. At 10^10 docs
    the per-row products fit int64 and the sums ride DECIMAL(38,0)/
    HUGEINT.

    Reference analog: none (extension surface — the learned-filter tier
    of the text-quality family).
    """
    return _logreg_scored(spark, sf_dir)


@register(
    "text_quality_logreg_eval",
    _logreg_sql_prefix()
    + """
, bins AS (
  SELECT p AS s, CAST(sum(y) AS BIGINT) AS n1,
         CAST(count(*) - sum(y) AS BIGINT) AS n0
  FROM scored GROUP BY p
), cum AS (
  SELECT s, n1, n0,
         coalesce(sum(n0) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c0
  FROM bins
), tot AS (
  SELECT CAST(sum(n1) AS HUGEINT) AS n1t, CAST(sum(n0) AS HUGEINT) AS n0t,
         CAST(sum(CAST(n1 AS HUGEINT) * (2 * c0 + n0)) AS HUGEINT) AS u2
  FROM cum
), conf AS (
  SELECT CAST(sum(CASE WHEN p >= 500 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN p >= 500 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN p < 500 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN p < 500 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored
)
SELECT CAST(n1t + n0t AS BIGINT) AS n_docs, CAST(n1t AS BIGINT) AS n_pos,
       tp, fp, fn, tn,
       CASE WHEN n1t = 0 OR n0t = 0 THEN NULL
            ELSE CAST((u2 * 1000000) // (2 * n1t * n0t) AS BIGINT) END
         AS auc_micro
FROM tot CROSS JOIN conf
""",
    doc="audit tier for the learned quality filter: confusion counts at "
    "the 0.5 threshold plus EXACT tie-aware AUC (rank-sum over the "
    "bounded score-bin frame, micro units) vs the Gopher rule labels",
)
def text_quality_logreg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/AUC audit of :func:`text_quality_logreg` against its own
    training labels — the held-in sanity panel a curation pipeline
    watches before trusting a learned filter (a model that cannot rank
    its own rule labels is broken; at the fixture it lands ~0.85 AUC,
    the linear ceiling for a conjunction-of-bands label). The AUC is the
    exact Mann-Whitney statistic with tie correction, computed entirely
    in integers: scores take at most 1001 distinct milli values, so the
    per-score (n_pos, n_neg) bin frame is bounded and the rank sum is
    one window over it (the `orders_mannwhitney_u` geometry), scaled to
    micro and floor-divided once.

    Scale shape: the scored frame reduces to ≤1001 bins (map-side
    partials), the window runs over that bounded frame, and the
    confusion row is one more aggregate — nothing corpus-sized past the
    two scans.

    Reference analog: none (extension surface — evaluation tier of the
    learned quality filter).
    """
    scored = _logreg_scored(spark, sf_dir)
    bins = scored.groupBy(F.col("score_milli").alias("s")).agg(
        F.sum("label").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("label")).cast("bigint").alias("n0"),
    )
    # SCALE GUARD: partition-less window over the ≤1001-row score-bin
    # frame only (score_milli ∈ (0, 1000)).
    win = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.select(
        "s", "n1", "n0", F.coalesce(F.sum("n0").over(win), F.lit(0)).alias("c0")
    )
    tot = cum.selectExpr(
        "CAST(sum(n1) AS decimal(38,0)) AS n1t",
        "CAST(sum(n0) AS decimal(38,0)) AS n0t",
        "CAST(sum(CAST(n1 AS decimal(38,0)) * (2 * c0 + n0)) AS decimal(38,0)) AS u2",
    )
    conf = scored.selectExpr(
        "CAST(sum(CASE WHEN score_milli >= 500 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp",
        "CAST(sum(CASE WHEN score_milli >= 500 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp",
        "CAST(sum(CASE WHEN score_milli < 500 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn",
        "CAST(sum(CASE WHEN score_milli < 500 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn",
    )
    return tot.crossJoin(conf).selectExpr(
        "CAST(n1t + n0t AS BIGINT) AS n_docs",
        "CAST(n1t AS BIGINT) AS n_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        "CASE WHEN n1t = 0 OR n0t = 0 THEN NULL "
        "ELSE CAST((u2 * 1000000) div (2 * n1t * n0t) AS BIGINT) END "
        "AS auc_micro",
    )


@register(
    "text_quality_logreg_apply",
    _logreg_sql_prefix(
        train_where="WHERE f0.doc_id % 4 <> 0",
        score_where="WHERE f0.doc_id % 4 = 0",
    )
    + """
SELECT doc_id, CAST(y AS INT) AS label, CAST(p AS BIGINT) AS score_milli,
       CAST(CASE WHEN p >= 500 THEN 1 ELSE 0 END AS INT) AS admit
FROM scored
""",
    doc="the learned quality filter's ingest lifecycle: train once on the "
    "base corpus (doc_id % 4 <> 0), PUBLISH the 1-row weight model, score "
    "an incoming batch (doc_id % 4 = 0) against the published model — a "
    "batch-sized scan plus a 1-row broadcast, no retraining",
)
def text_quality_logreg_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-once / score-at-ingest lifecycle of the learned quality
    filter — the tier every other family already carries
    (``dedup_minhash_incremental``, ``dedup_semantic_incremental``,
    ``similarity_pq_incremental``, ...): a curation pipeline trains the
    classifier on the standing corpus, publishes the model artifact, and
    every ingest batch is scored against the PUBLISHED model without
    touching the training data again. The fixture stands in for both
    sides (base = doc_id % 4 != 0, batch = doc_id % 4 == 0 — the
    family's split convention, dedup.py:189).

    The model is the trained 1-row weight frame published through the
    staged loader (``memo_publish`` — stage→audit→publish, the
    `dedup_semantic_incremental` centroid-model pattern), so the warm
    batch cost is: one batch-sized scan of the published feature table +
    a broadcast of ONE row. Nothing corpus-sized moves and no aggregate
    runs (the plan-pin test asserts the warm scoring plan is
    aggregate-free). Same integer discipline as the train tier — scores
    are bit-identical to the pure-python base-trained replay
    (tests/test_analytics_invariants.py).

    Scale shape at 100 TB: training amortizes over every future batch;
    per-batch work is O(batch) regex + 5 multiplies per doc, the exact
    dataflow of a production fasttext-style filter at ingest. ``admit``
    is the gate decision at the 0.5 threshold.

    Reference analog: none (extension surface — the ingest tier of the
    learned quality filter).
    """
    from ufload_spark.sources.loader import memo_publish

    fpath = _logreg_feat_path(spark, sf_dir)

    def build() -> DataFrame:
        base = spark.read.parquet(fpath).where("doc_id % 4 <> 0")
        return _logreg_train_weights(spark, base)

    wpath = memo_publish(spark, "logreg_base_model", sf_dir, build)
    w = spark.read.parquet(wpath)
    batch = spark.read.parquet(fpath).where("doc_id % 4 = 0")
    zsum = " + ".join(f"x{j} * w{j}" for j in range(_LOGREG_NF))
    return (
        batch.crossJoin(F.broadcast(w))
        .selectExpr(
            "doc_id",
            "CAST(y AS INT) AS label",
            f"({zsum}) div 1000 AS z",
        )
        .selectExpr(
            "doc_id",
            "label",
            "CAST(500 + (500 * z) div (1000 + abs(z)) AS BIGINT) AS score_milli",
        )
        .selectExpr(
            "*",
            "CAST(CASE WHEN score_milli >= 500 THEN 1 ELSE 0 END AS INT) AS admit",
        )
    )
