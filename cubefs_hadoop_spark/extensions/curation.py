"""Corpus-curation operators (SURVEY §2C extension surface): segment-level
exact dedup with document reassembly, per-source token-budget selection,
global curriculum ordering, and stratified per-group sampling.

These are the corpus-shaping steps between raw filtering (X04-X11) and
layout (X14/X15) in a training-data pipeline: RefinedWeb/Falcon-style
repeated-span removal, Pile/Dolma-style per-source token budgeting,
quality-curriculum ordering, and per-stratum eval-set carving.

Scale notes (100 TB):

* x16 segment dedup shuffles once on the segment value (keep-first is a
  ``row_number() = 1`` filter, which Spark rewrites to WindowGroupLimit —
  hot segments are top-1-reduced map-side before the shuffle) and once on
  doc_id to reassemble.  Never pairwise, never driver-side.
* x17 token budgeting is a PREFIX SUM, and like x14 it must never funnel
  a source's documents through one task: documents are range-bucketed by
  the leading byte of their md5 order key, cumulative sums run per
  (source, bucket), and only the 256-row-per-source bucket-totals frame
  sees an ordered window.
* x18 global ordering is distributed rank: band on the score's integer
  range, rank within bands in parallel, offset bands by a window over the
  band-counts frame (driver-scale).  The classic zipWithIndex shape with
  no global sort-into-one-partition.
* x19 stratified sampling is one window per stratum with a rank filter —
  WindowGroupLimit again: each mapper keeps at most n rows per stratum
  before the shuffle, so shuffled bytes are O(strata * n), not O(corpus).

All four are RNG-free (md5 order keys, integer arithmetic), so they are
repartition/replay-stable and hash-checkable against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register

# -- x16: segment-level exact dedup + reassembly ---------------------------

_X16_K = 8  # words per segment

_X16_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(w[(i*{_X16_K}+1):(i*{_X16_K}+{_X16_K})], ' ') AS seg
  FROM w, UNNEST(range(CAST(ceil(len(w) / {_X16_K}.0) AS BIGINT))) AS u(i)
),
kept AS (
  SELECT doc_id, pos, seg FROM (
    SELECT doc_id, pos, seg,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
    FROM segs) t WHERE rn = 1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(seg, ' ' ORDER BY pos) AS text_dedup
FROM kept GROUP BY doc_id ORDER BY doc_id, n_kept, text_dedup"""


def segment_dedup(docs: DataFrame, k: int = _X16_K) -> DataFrame:
    """Exact segment-level dedup with reassembly: split each document
    into k-word segments, keep only the FIRST occurrence (by doc_id,
    position) of each distinct segment corpus-wide, and stitch each
    document back together from its surviving segments in order.

    The line/span-level exact dedup a RefinedWeb-style pipeline runs to
    strip boilerplate repeated across pages.  A document whose segments
    are all seen earlier disappears entirely (it contributed nothing
    new).  Returns (doc_id, n_kept, text_dedup)."""
    segs = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("w") / F.lit(float(k))).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice("w", i * k + 1, F.lit(k)), " "
                    ),
                )
            ).alias("pos", "seg"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )
    # keep-first: row_number()=1 under partitionBy(seg) — Spark rewrites
    # the filter to WindowGroupLimit, so duplicate-heavy segments are
    # reduced to one candidate per mapper before the shuffle
    first = Window.partitionBy("seg").orderBy("doc_id", "pos")
    kept = (
        segs.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_dedup"),
    )


@register("x16_segment_dedup", _X16_ORACLE)
def x16_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16 corpus-wide segment (8-word span) exact dedup with document
    reassembly.  One shuffle on the segment value (WindowGroupLimit
    keep-first), one on doc_id to reassemble — never pairwise."""
    return segment_dedup(load(spark, sf_dir, "documents")).orderBy(
        "doc_id", "n_kept", "text_dedup"
    )


# -- x17: per-source token-budget selection --------------------------------

_X17_BUDGET = 400  # tokens per source (binding at every fixture SF)

_X17_ORACLE = f"""
WITH t AS (SELECT doc_id, source, md5(text) AS h,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           FROM documents),
o AS (SELECT doc_id, source, tokens,
             CAST(COALESCE(SUM(tokens) OVER (
                  PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM t)
SELECT doc_id, source, tokens, cum_before
FROM o WHERE cum_before < {_X17_BUDGET}
ORDER BY source, cum_before, doc_id, tokens"""


def token_budget_sample(
    docs: DataFrame,
    budget: int = _X17_BUDGET,
    tokens: Column | None = None,
) -> DataFrame:
    """Select documents per source up to a token budget, in a
    deterministic content-hash order (md5(text), doc_id) — the Dolma-style
    "take N tokens from each source" mixing step, RNG-free so the pick is
    repartition/replay-stable.

    A document is kept iff the tokens BEFORE it in its source's hash
    order total < budget (the document that straddles the budget line is
    kept, matching concat-and-chunk consumption).  The running total is a
    two-level distributed prefix sum: the md5 key's leading byte is a
    RANGE bucket (hex is ordered, so (bucket, h) order == h order),
    cumulative sums run per (source, bucket) in parallel, and only the
    <=256-rows-per-source bucket-totals frame sees an ordered window.

    ``tokens`` overrides the metering unit (default: whitespace word
    count) — x17b passes the subword-count expression so budgets meter
    in BPE-style subword tokens."""
    if tokens is None:
        tokens = F.size(F.split("text", " "))
    t = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        tokens.cast("long").alias("tokens"),
    ).withColumn("bkt", F.conv(F.substring("h", 1, 2), 16, 10).cast("long"))
    within = (
        Window.partitionBy("source", "bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "off_in", F.coalesce(F.sum("tokens").over(within), F.lit(0))
    )
    over_buckets = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        t.groupBy("source", "bkt")
        .agg(F.sum("tokens").alias("btot"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("btot").over(over_buckets), F.lit(0)).alias(
                "boff"
            ),
        )
    )
    return (
        t.join(F.broadcast(prefix), ["source", "bkt"])
        .withColumn(
            "cum_before", (F.col("boff") + F.col("off_in")).cast("long")
        )
        .filter(F.col("cum_before") < budget)
        .select("doc_id", "source", "tokens", "cum_before")
    )


@register("x17_token_budget", _X17_ORACLE)
def x17_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 per-source token-budget selection (400 tokens/source) via a
    two-level distributed prefix sum over a deterministic md5 order."""
    return token_budget_sample(load(spark, sf_dir, "documents")).orderBy(
        "source", "cum_before", "doc_id", "tokens"
    )


# -- x18: global curriculum ordering ---------------------------------------

_X18_BAND = 32  # score units per rank band

_X18_ORACLE = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS rank,
       doc_id, CAST(n_chars AS BIGINT) AS score
FROM documents ORDER BY rank, doc_id, score"""


def curriculum_order(
    docs: DataFrame,
    score_col: str = "n_chars",
    band_width: int = _X18_BAND,
) -> DataFrame:
    """Assign every document a global contiguous rank 1..N ordered by
    (score DESC, doc_id ASC) — curriculum ordering for a training loader —
    WITHOUT a global single-partition sort.

    Distributed rank: band = floor(score / band_width) partitions the key
    space into disjoint score ranges (every row in a higher band outranks
    every row in a lower band), so within-band ranks are computed fully in
    parallel and offset by a window over the band-counts frame — at most
    (max_score/band_width + 1) rows, driver-scale.  The same two-level
    shape as x14's prefix sum, applied to ranking (the DataFrame-native
    zipWithIndex)."""
    t = docs.select(
        "doc_id", F.col(score_col).cast("long").alias("score")
    ).withColumn("band", F.floor(F.col("score") / band_width))
    inner = Window.partitionBy("band").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    t = t.withColumn("rn_in", F.row_number().over(inner).cast("long"))
    higher = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bands = (
        t.groupBy("band")
        .agg(F.count("*").alias("bcnt"))
        .select(
            "band",
            F.coalesce(F.sum("bcnt").over(higher), F.lit(0)).alias("boff"),
        )
    )
    return (
        t.join(F.broadcast(bands), "band")
        .select(
            (F.col("boff") + F.col("rn_in")).cast("long").alias("rank"),
            "doc_id",
            "score",
        )
    )


@register("x18_curriculum_order", _X18_ORACLE)
def x18_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X18 global curriculum rank (n_chars DESC) via banded distributed
    ranking — no corpus-sized SinglePartition window."""
    return curriculum_order(load(spark, sf_dir, "documents")).orderBy(
        "rank", "doc_id", "score"
    )


# -- x19: stratified per-group sampling ------------------------------------

_X19_N = 50  # rows per stratum

_X19_ORACLE = f"""
SELECT lang, doc_id, tokens FROM (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
             AS rn
  FROM documents) t WHERE rn <= {_X19_N}
ORDER BY lang, doc_id, tokens"""


def stratified_sample(
    docs: DataFrame, strata_col: str = "lang", n: int = _X19_N
) -> DataFrame:
    """Exactly min(n, stratum size) documents per stratum, picked by
    deterministic content-hash order — the held-out/eval-set carve that
    needs EXACT per-stratum counts (sampleBy gives only expected
    fractions) and replay-stability (no RNG).

    The rank filter compiles to WindowGroupLimit: every mapper keeps at
    most n rows per stratum before the shuffle, so shuffled bytes are
    O(strata * n) regardless of corpus size."""
    pick = Window.partitionBy(strata_col).orderBy(F.md5("text"), "doc_id")
    return (
        docs.select(
            strata_col,
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("tokens"),
            "text",
        )
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= n)
        .select(strata_col, "doc_id", "tokens")
    )


@register("x19_stratified_sample", _X19_ORACLE)
def x19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X19 stratified exact-count sample (50 docs per lang) in
    deterministic md5 order; WindowGroupLimit bounds shuffle at
    O(strata * n)."""
    return stratified_sample(load(spark, sf_dir, "documents")).orderBy(
        "lang", "doc_id", "tokens"
    )


# -- x30: sliding-window document chunking ---------------------------------

_X30_SIZE = 200  # chars per chunk
_X30_OVERLAP = 40  # chars shared by consecutive chunks
_X30_STRIDE = _X30_SIZE - _X30_OVERLAP

_X30_ORACLE = f"""
WITH c AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
            CAST(CEIL(CAST(GREATEST(LENGTH(text) - {_X30_OVERLAP}, 1)
                 AS DOUBLE) / {_X30_STRIDE}) AS BIGINT) - 1)) AS i
  FROM documents)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_X30_STRIDE} AS BIGINT) AS char_start,
       substr(text, CAST(i AS BIGINT) * {_X30_STRIDE} + 1, {_X30_SIZE})
           AS chunk_text,
       CAST(LENGTH(substr(text, CAST(i AS BIGINT) * {_X30_STRIDE} + 1,
                          {_X30_SIZE})) AS BIGINT) AS chunk_len
FROM c ORDER BY doc_id, chunk_idx"""


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = _X30_SIZE,
    overlap: int = _X30_OVERLAP,
) -> DataFrame:
    """RAG/context-window chunking: cut each document into fixed-size
    character windows where consecutive chunks share exactly ``overlap``
    chars (the retrieval-layout step downstream of filtering, distinct
    from x14's corpus-wide concat-and-chunk token packing — chunks here
    never cross document boundaries).

    Contract: every document yields >= 1 chunk (empty text -> one empty
    chunk, so no row silently vanishes); chunks cover every char; only
    the last chunk of a document may be shorter than ``size``.

    Scale (100 TB): map-only — one ``sequence``+``explode`` and a
    ``substr``, all JVM codegen, ZERO shuffles and zero Python; output
    partitioning inherits the scan, so a downstream embed/dedup stage
    repartitions once on its own key and nothing funnels.
    """
    if not 0 <= overlap < size:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < size, got "
            f"size={size} overlap={overlap}"
        )
    stride = size - overlap
    n = F.ceil(
        F.greatest(F.length(text_col) - F.lit(overlap), F.lit(1)).cast(
            "double"
        )
        / F.lit(stride)
    )
    start = F.col("chunk_idx") * stride  # 0-based char offset
    text = F.col(text_col).substr(
        (start + 1).cast("int"), F.lit(size).cast("int")
    )
    return (
        docs.select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.cast("long").alias("char_start"),
            text.alias("chunk_text"),
            F.length(text).cast("long").alias("chunk_len"),
        )
    )


@register("x30_chunk_documents", _X30_ORACLE)
def x30_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30 sliding-window chunking (200-char windows, 40-char overlap):
    map-only explode, zero shuffles before the presentation sort."""
    return chunk_documents(load(spark, sf_dir, "documents")).orderBy(
        "doc_id", "chunk_idx"
    )


# ---------------------------------------------------------------------------
# x47 — histogram-percentile quality blend (signal ensembling without a
# global sort)
# ---------------------------------------------------------------------------
#
# The DataComp/FineWeb-style curation step that combines several raw
# quality signals into one score: each signal is RANK-normalized (so
# incommensurable units — a stopword ratio, a mean word length, a token
# count — blend meaningfully), then weighted-averaged, then thresholded.
#
# The naive rank normalization is percent_rank() over the corpus — a
# GLOBAL SORT, the canonical scale-killer.  This operator normalizes
# through the x45 histogram instead: per signal, a 64-bin equi-width
# histogram (one partial-agg'd pass over the skinny score frame), and
# percentile(v) ~= 1000 * cum_mass(bin(v)) / n — an O(bins) broadcast
# lookup.  Error is bounded by one bin's mass; the blend is exactly as
# good as its bin resolution, and B is a knob.  At 100 TB: ONE corpus
# scan materializes the (doc_id, s1, s2, s3) frame (4 ints/row), three
# O(bins) histogram builds + broadcast joins do the rest — no sort, no
# wide shuffle, no Python.
#
# Signals (all integer millis, row-local):
#   s1  stopword ratio      (C4/Gopher prose-ness; x09's signal)
#   s2  mean word length    (penalizes boilerplate/minified junk)
#   s3  token count         (length prior)
# Weights 40/30/30, keep iff blended percentile >= 500 (top half).
# Everything BIGINT, so the whole decision table hash-checks cross-engine.

_X47_B = 64                    # histogram bins per signal
_X47_W = (40, 30, 30)          # signal weights, percent
_X47_KEEP = 500                # keep iff blend >= this (milli)
_X47_STOPS = ("the", "a", "of", "and", "to")


def _x47_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, s1, s2, s3) in integer millis — one map-only pass."""
    stops = ", ".join(f"'{w}'" for w in _X47_STOPS)
    return docs.selectExpr(
        "doc_id",
        f"1000 * size(filter(split(text, ' '), w -> w IN ({stops})))"
        " div size(split(text, ' ')) AS s1",
        "1000 * aggregate(split(text, ' '), 0L, (acc, w) -> acc + length(w))"
        " div size(split(text, ' ')) AS s2",
        "cast(size(split(text, ' ')) AS BIGINT) AS s3",
    )


def hist_percentile(
    df: DataFrame,
    col: str,
    b: int = _X47_B,
    stats: "tuple[int, int, int] | None" = None,
) -> DataFrame:
    """Attach ``pct_<col>`` — the histogram-approximated inclusive
    percentile of ``col`` in integer millis: 1000 * (mass of bins <=
    bin(v)) / n.  (lo, hi, n) ride as plan LITERALS (the x03e/x39b
    driver-sized pattern — collecting a single aggregate row is
    metadata, and literals keep the bin expression join-free), one
    O(b) cells pass, one broadcast pct lookup; bounded error of one
    bin's mass, no global sort, no 1-row crossJoins in the plan.

    ``stats`` lets a caller normalizing SEVERAL signals pin all their
    bounds from ONE agg over the base frame instead of one driver
    action per signal (x47 does — three signals, one stats pass)."""
    if stats is None:
        st = df.agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ).first()
        if st["n"] == 0 or st["lo"] is None:
            raise ValueError(f"hist_percentile: empty input for {col!r}")
        stats = (int(st["lo"]), int(st["hi"]), int(st["n"]))
    lo, hi, n = stats
    if n <= 0 or lo is None:
        raise ValueError(f"hist_percentile: empty input for {col!r}")
    lo, hi, n = int(lo), int(hi), int(n)
    binned = df.withColumn(
        "_bin", F.expr(f"({col} - {lo}) * {b} div ({hi} - {lo} + 1)")
    )
    wb = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0)
    pct = (
        binned.groupBy("_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
        .withColumn("bcum", F.sum("bc").over(wb))
        .select("_bin", F.expr(f"1000 * bcum div {n}").alias(f"pct_{col}"))
    )
    return binned.join(F.broadcast(pct), "_bin").drop("_bin")


def _x47_hist_cte(sig: str) -> str:
    """DuckDB CTE chain replicating hist_percentile for one signal."""
    return f"""
st_{sig} AS (SELECT MIN({sig}) AS lo, MAX({sig}) AS hi,
                    CAST(COUNT(*) AS BIGINT) AS n FROM base),
c_{sig} AS (SELECT ({sig} - lo) * {_X47_B} // (hi - lo + 1) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS bc
            FROM base CROSS JOIN st_{sig} GROUP BY 1),
p_{sig} AS (SELECT bin,
                   CAST(1000 * bcum // n AS BIGINT) AS pct
            FROM (SELECT bin, SUM(bc) OVER (ORDER BY bin) AS bcum
                  FROM c_{sig}) CROSS JOIN st_{sig})"""


_X47_ORACLE = (
    f"""
WITH base AS (
  SELECT doc_id,
         1000 * len(list_filter(string_split(text, ' '),
                    w -> w IN ({", ".join(f"'{w}'" for w in _X47_STOPS)})))
             // len(string_split(text, ' ')) AS s1,
         1000 * list_sum(list_transform(string_split(text, ' '),
                                        w -> len(w)))
             // len(string_split(text, ' ')) AS s2,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS s3
  FROM documents),"""
    + ",".join(_x47_hist_cte(s) for s in ("s1", "s2", "s3"))
    + f"""
SELECT b.doc_id, p_s1.pct AS pct_s1, p_s2.pct AS pct_s2,
       p_s3.pct AS pct_s3,
       CAST(({_X47_W[0]} * p_s1.pct + {_X47_W[1]} * p_s2.pct
             + {_X47_W[2]} * p_s3.pct) // 100 AS BIGINT) AS blend,
       ({_X47_W[0]} * p_s1.pct + {_X47_W[1]} * p_s2.pct
             + {_X47_W[2]} * p_s3.pct) // 100 >= {_X47_KEEP} AS kept
FROM base b
JOIN st_s1 ON TRUE JOIN st_s2 ON TRUE JOIN st_s3 ON TRUE
JOIN p_s1 ON p_s1.bin = (b.s1 - st_s1.lo) * {_X47_B} // (st_s1.hi - st_s1.lo + 1)
JOIN p_s2 ON p_s2.bin = (b.s2 - st_s2.lo) * {_X47_B} // (st_s2.hi - st_s2.lo + 1)
JOIN p_s3 ON p_s3.bin = (b.s3 - st_s3.lo) * {_X47_B} // (st_s3.hi - st_s3.lo + 1)
ORDER BY doc_id"""
)


@register("x47_quality_blend", _X47_ORACLE)
def x47_quality_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47 histogram-percentile quality blend: three raw signals
    (stopword ratio, mean word length, token count — integer millis)
    rank-normalized through 64-bin histograms (the x45 sketch; O(bins)
    broadcast lookups, NO percent_rank global sort), blended 40/30/30,
    kept iff blended percentile >= 500.  The full per-doc decision
    table (signal percentiles, blend, kept) is the output — curation
    decisions stay auditable."""
    from cubefs_hadoop_spark.plans.materialize import barrier
    from cubefs_hadoop_spark.plans.parallelism import widen_for_cpu

    docs = load(spark, sf_dir, "documents")
    base = barrier(_x47_signals(widen_for_cpu(docs, "doc_id")))
    # ONE stats pass over the barriered base pins all three signals'
    # (lo, hi, n) literals — not one progressively-wider driver action
    # per signal
    st = base.agg(
        *[
            f(s).alias(f"{name}_{s}")
            for s in ("s1", "s2", "s3")
            for name, f in (("lo", F.min), ("hi", F.max))
        ],
        F.count(F.lit(1)).cast("long").alias("n"),
    ).first()
    if st["n"] == 0:
        raise ValueError("x47_quality_blend: empty documents table")
    out = base
    for sig in ("s1", "s2", "s3"):
        out = hist_percentile(
            out, sig,
            stats=(int(st[f"lo_{sig}"]), int(st[f"hi_{sig}"]), int(st["n"])),
        )
    w0, w1, w2 = _X47_W
    blend = F.expr(f"({w0} * pct_s1 + {w1} * pct_s2 + {w2} * pct_s3) div 100")
    return (
        out.select(
            "doc_id",
            "pct_s1",
            "pct_s2",
            "pct_s3",
            blend.alias("blend"),
            (blend >= _X47_KEEP).alias("kept"),
        )
        .orderBy("doc_id")
    )


# -- x54: temperature-flattened source mixture -------------------------------
#
# The data-recipe step every large LM run applies between curation and
# packing (GPT-3 Table 2.2's per-dataset sampling rates, PaLM/LLaMA's
# alpha-temperature source weights; arXiv:2005.14165): sample sources
# proportionally to c^alpha instead of c, flattening the web-crawl
# giant toward the small high-quality corpora.  alpha = 0.5 here, and
# the whole quota computation is EXACT integer arithmetic so the hash
# gate covers it: weight_i = floor(sqrt(c_i * 10^6)) — IEEE sqrt is
# correctly rounded, so floor of it is bit-deterministic across engines
# — and quota_i = min(B * w_i // sum(w), c_i) with B = half the corpus.
# Selection within a source is the family's md5 content-hash order
# (x17's two-level prefix machinery: per-(source, hex-bucket) counters,
# one 256-rows-per-source bucket-totals window — no source ever
# serializes through a single task), RNG-free and replay-stable.
#
# Scale: one groupBy(source) for quotas (driver-sized output,
# broadcast back), one corpus pass for ranks; nothing quadratic,
# nothing keyed on a skewed column alone.

_X54_TOP_MILLI = 1_000_000

_X54_ORACLE = """
WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(SQRT(c * 1000000)) AS BIGINT)) AS BIGINT)
                 AS sw
      FROM g),
q AS (SELECT source, c,
             LEAST((t.n // 2) * CAST(FLOOR(SQRT(c * 1000000)) AS BIGINT)
                   // t.sw, c) AS quota
      FROM g CROSS JOIN t),
r AS (SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY md5(text), doc_id)
                  AS BIGINT) AS sel_rank
      FROM documents)
SELECT r.doc_id, r.source, r.sel_rank, q.quota
FROM r JOIN q USING (source) WHERE r.sel_rank <= q.quota
ORDER BY source, sel_rank, doc_id, quota"""


def hash_rank(docs: DataFrame) -> DataFrame:
    """(doc_id, source, sel_rank): each document's 1-based rank in its
    source's deterministic (md5(text), doc_id) order, via the x17
    two-level prefix trick — per-(source, hex-bucket) counting windows
    in parallel, one ordered window on the <=256-rows-per-source
    bucket-totals frame."""
    t = docs.select(
        "doc_id", "source", F.md5("text").alias("h")
    ).withColumn("bkt", F.conv(F.substring("h", 1, 2), 16, 10).cast("long"))
    within = (
        Window.partitionBy("source", "bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "off_in", F.coalesce(F.count(F.lit(1)).over(within), F.lit(0))
    )
    over_buckets = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        t.groupBy("source", "bkt")
        .agg(F.count(F.lit(1)).alias("btot"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("btot").over(over_buckets), F.lit(0)).alias(
                "boff"
            ),
        )
    )
    return (
        t.join(F.broadcast(prefix), ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            (F.col("boff") + F.col("off_in") + 1).cast("long").alias(
                "sel_rank"
            ),
        )
    )


def temperature_mixture(docs: DataFrame) -> DataFrame:
    """Alpha=0.5 temperature-flattened source selection: per-source
    quotas from exact integer arithmetic on sqrt-weights, documents
    picked in md5 content-hash order up to quota.  Returns
    (doc_id, source, sel_rank, quota) for the kept set."""
    # Quotas are computed in PYTHON ints on the collected per-source
    # counts (driver-sized by definition: one row per source).  ADVICE
    # r8: the previous in-plan form (n div 2) * w div sw multiplies two
    # bigints whose product clears int64 around ~7e10 documents — only
    # ~3x headroom over the 100 TB design point; Python ints are
    # unbounded, and the per-source weight math.isqrt(c * 1e6) is exact
    # at any magnitude.  The DuckDB oracle keeps FLOOR(SQRT(c * 1e6))
    # (float sqrt) and the (n//2)*w int64-prone product: floor of a
    # correctly-rounded double sqrt(m) can already exceed isqrt(m) once
    # m > ~2^52, i.e. c ≈ 4.5e9 docs per source (ADVICE r9 — the bound
    # is 2^52, not 2^53: equality of the floors needs sqrt(m) to be
    # more than half an ulp from an integer, guaranteed only below
    # 2^52).  Fixture sources are ~1e2-1e5 docs, far inside the shared
    # agreement domain; at production scale the Spark side stays exact
    # while the oracle form would drift first.
    import math

    per_source = sorted(
        (r["source"], int(r["c"]))
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    n = sum(c for _, c in per_source)
    weights = {s: math.isqrt(c * _X54_TOP_MILLI) for s, c in per_source}
    sw = sum(weights.values())
    spark = docs.sparkSession
    quotas = spark.createDataFrame(
        [
            (s, min((n // 2) * weights[s] // sw, c))
            for s, c in per_source
        ],
        "source string, quota long",
    )
    return (
        hash_rank(docs)
        .join(F.broadcast(quotas), "source")
        .filter(F.col("sel_rank") <= F.col("quota"))
        .select("doc_id", "source", "sel_rank", "quota")
    )


@register("x54_temperature_mixture", _X54_ORACLE)
def x54_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54 alpha=0.5 temperature mixture over the documents table: half
    the corpus, sources flattened toward sqrt weights, deterministic
    md5-order selection; every quota is exact integer arithmetic so the
    oracle hash covers the recipe end-to-end."""
    return temperature_mixture(load(spark, sf_dir, "documents")).orderBy(
        "source", "sel_rank", "doc_id", "quota"
    )


# -- x67: training-shard balance audit (the output-layout pre-flight) --------
#
# The last stage of a curation pipeline WRITES: documents land in S
# training shards (content-hashed so the assignment is stable under
# re-runs and incremental ingest, like x07's split), and every
# downstream consumer — data loaders, per-shard shuffle buffers, epoch
# schedulers — assumes the shards are BALANCED in token mass, not just
# document count.  x67 prices that assumption before the write: per
# shard, document count, token mass, byte mass, exact milli share, and
# the permille deviation from a perfectly uniform shard
# (1000*S*tokens//total - 1000) — the number that says whether shard 7
# will finish its epoch 30% after the others.
#
# Scale (100 TB): the shard key is row-local codegen (md5 -> 16-bit hex
# prefix -> mod S); ONE partial-agg'd groupBy on the bounded shard key
# (S rows) and a window over that S-row frame.  The audit costs one
# scan; the write it prices costs the full corpus.

_X67_S = 16  # shards in the registered audit (any S: parameter below)

_X67_ORACLE = f"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % {_X67_S} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
         CAST(n_chars AS BIGINT) AS bytes
  FROM documents),
c AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tk) AS BIGINT) AS tokens,
         CAST(SUM(bytes) AS BIGINT) AS bytes
  FROM d GROUP BY shard),
t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot FROM c)
SELECT c.shard, c.n_docs, c.tokens, c.bytes,
       CAST(1000 * c.tokens // t.tot AS BIGINT) AS share_milli,
       CAST(1000 * {_X67_S} * c.tokens // t.tot - 1000 AS BIGINT)
         AS skew_permille
FROM c CROSS JOIN t
ORDER BY shard, n_docs, tokens, bytes, share_milli, skew_permille"""


def shard_balance(
    docs: DataFrame,
    n_shards: int = _X67_S,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, tokens, bytes, share_milli, skew_permille): the
    content-hashed shard assignment's balance audit.  Row-local shard
    key (md5 of the id, 16-bit hex prefix, mod n_shards — stable under
    re-runs like x07's split), one bounded groupBy, one S-row window."""
    s = int(n_shards)
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long") % s
    )
    c = (
        docs.select(
            shard.alias("shard"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("tk"),
            F.col("n_chars").cast("long").alias("bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tk").cast("long").alias("tokens"),
            F.sum("bytes").cast("long").alias("bytes"),
        )
    )
    return c.select(
        "shard",
        "n_docs",
        "tokens",
        "bytes",
        F.expr("1000 * tokens div sum(tokens) over ()")
        .cast("long")
        .alias("share_milli"),
        (
            F.expr(f"1000 * {s} * tokens div sum(tokens) over ()")
            - F.lit(1000)
        ).cast("long").alias("skew_permille"),
    )


@register("x67_shard_balance", _X67_ORACLE)
def x67_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 training-shard balance audit: token/byte mass per
    content-hashed output shard with exact milli shares and permille
    deviation from uniform — the pre-flight read before the final
    sharded write (and the input to choosing S)."""
    return shard_balance(load(spark, sf_dir, "documents")).orderBy(
        "shard", "n_docs", "tokens", "bytes", "share_milli",
        "skew_permille"
    )
