"""Frequency sketches (SURVEY §2C x42): Count-Min over the corpus word
stream, plus sketch-guided EXACT heavy hitters.

Count-Min (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 55(1), 2005):
D=4 hash rows x W=256 counters; every stream item increments one
counter per row; the estimate for a key is the MIN of its D counters —
always >= the true count (one-sided error), and within eN of it with
probability 1-delta for W = e/epsilon, D = ln(1/delta).

Why it belongs in a 100 TB pipeline: the counter table is O(D x W)
REGARDLESS of stream size or key cardinality — frequency state for
unbounded key spaces (URLs, n-grams, session ids) at constant memory.
Counters are additive, so the distributed build is one partial-agg'd
groupBy: every map task combines its partition's increments locally and
ships at most D x W cells — the classic CMS merge, expressed as Spark's
ordinary map-side combine.  The q08 HLL twin audits cardinality
sketching; this audits frequency sketching the same way (sketch and
exact side by side, hash-checked).

Determinism: hash rows are md5-prefix integers (the x02 cross-engine
recipe — Spark ``conv(substr(md5, 1, 8), 16, 10)``, DuckDB
``('0x' || substr(md5, 1, 8))::BIGINT``), pure integer arithmetic
everywhere, so both the sketch cells and the estimates hash-check
against the DuckDB twin exactly (nothing is approximate about HOW a
CMS computes; only the estimate-vs-truth gap is).

Heavy hitters (x42b): est(x) >= true(x) means a CMS threshold scan has
NO false negatives — so "estimate >= phi*N" yields a candidate superset
and one exact counting pass over candidates ONLY returns the exact
heavy hitters.  That two-pass shape is how you compute exact heavy
hitters over an unbounded key space without materializing the full
frequency table: pass 1 state O(D x W), pass 2 state O(candidates).

Reference parity: byte-transport connector (`CubefsInputStream.java`),
sketching delegated to the engine above — natively implemented here
like the rest of the x-family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.plans.parallelism import widen_for_cpu
from cubefs_hadoop_spark.registry import register

_CMS_D = 4    # hash rows
_CMS_W = 256  # counters per row
_HH_PHI = 64  # heavy hitter = count * PHI >= stream size (phi = 1/64)


def _bucket(word: F.Column, row: F.Column) -> F.Column:
    """Row-r counter index for a key: 32-bit md5-prefix int mod W."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(row.cast("string"), F.lit("|"), word)), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % _CMS_W).alias("bucket")


def count_min_cells(words: DataFrame) -> DataFrame:
    """The D x W counter table of a word-stream frame (one ``word``
    column): explode each instance into its D (row, bucket) increments,
    partial-agg'd groupBy — map tasks ship at most D x W cells each
    (the distributed CMS merge).  Output (row, bucket, c)."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(_CMS_D - 1))
    ).alias("row")
    return (
        words.select("word", rows)
        .select("row", _bucket(F.col("word"), F.col("row")))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_estimates(keys: DataFrame, cells: DataFrame) -> DataFrame:
    """Point estimates for a frame of distinct ``word`` keys: min over
    the D row counters each key hashes into.  The cells frame is
    O(D x W) — broadcast."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(_CMS_D - 1))
    ).alias("row")
    probes = keys.select("word", rows).select(
        "word", "row", _bucket(F.col("word"), F.col("row"))
    )
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("word")
        .agg(F.min("c").alias("cms_est"))
    )


# word stream + exact counts, shared by both oracles
_CMS_STREAM = """
w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
exact AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_cnt
          FROM w GROUP BY word),
inc AS (SELECT word, u.r AS row,
               CAST(('0x' || substr(md5(CAST(u.r AS VARCHAR) || '|' || word),
                                    1, 8)) AS BIGINT) % {w} AS bucket
        FROM w, LATERAL unnest(range(0, {d})) AS u(r)),
cells AS (SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS c
          FROM inc GROUP BY row, bucket),
est AS (SELECT e.word, MIN(cl.c) AS cms_est
        FROM (SELECT DISTINCT word, row, bucket FROM inc) e
        JOIN cells cl USING (row, bucket) GROUP BY e.word)""".format(
    w=_CMS_W, d=_CMS_D
)

_X42_ORACLE = (
    "WITH "
    + _CMS_STREAM
    + """
SELECT exact.word, exact.exact_cnt, est.cms_est
FROM exact JOIN est USING (word)
ORDER BY word"""
)


@register("x42_countmin", _X42_ORACLE)
def x42_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X42 Count-Min audit twin (the q08-HLL pattern for FREQUENCY):
    every distinct corpus word with its exact count and its CMS
    estimate, side by side — est >= exact always (one-sided error,
    test-pinned), both computed with cross-engine md5 hashing so the
    sketch itself hash-checks."""
    docs = load(spark, sf_dir, "documents")
    words = widen_for_cpu(docs, "doc_id").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    exact = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    cells = count_min_cells(words)
    est = cms_estimates(exact.select("word"), cells)
    return exact.join(est, "word").orderBy("word")


_X42B_ORACLE = (
    "WITH "
    + _CMS_STREAM
    + f""",
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w)
SELECT exact.word, exact.exact_cnt
FROM exact JOIN est USING (word) CROSS JOIN tot
WHERE est.cms_est * {_HH_PHI} >= tot.n
  AND exact.exact_cnt * {_HH_PHI} >= tot.n
ORDER BY word"""
)


@register("x42b_cms_heavy_hitters", _X42B_ORACLE)
def x42b_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X42b sketch-guided EXACT heavy hitters (phi = 1/64): the CMS
    threshold scan proposes candidates (NO false negatives — est >=
    true), then one exact counting pass over candidates only keeps the
    true heavies.  Pass-1 state is O(D x W) at any stream size and key
    cardinality; pass 2 touches candidate keys only — exact heavy
    hitters over unbounded key spaces without a full frequency table.
    Output is partitioning-independent (the exact filter decides)."""
    from cubefs_hadoop_spark.plans.materialize import barrier

    docs = load(spark, sf_dir, "documents")
    words = widen_for_cpu(docs, "doc_id").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    # materialize the two O(DxW)/O(1) pass-1 artifacts once: cells and
    # the stream total each feed two downstream branches, and without a
    # barrier Spark's lineage would re-run the corpus scan per use
    cells = barrier(count_min_cells(words))
    tot = barrier(
        words.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cand = (
        cms_estimates(words.select("word").distinct(), cells)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cms_est") * _HH_PHI >= F.col("n"))
        .select("word")
    )
    return (
        words.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("exact_cnt") * _HH_PHI >= F.col("n"))
        .select("word", "exact_cnt")
        .orderBy("word")
    )
