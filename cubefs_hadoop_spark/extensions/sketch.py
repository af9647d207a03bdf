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


# -- x44: Bloom-filter membership probe (n-gram decontamination shape) ------
#
# The MEMBERSHIP sketch completing the family (q08 HLL = cardinality,
# x42 CMS = frequency): a Bloom filter (Bloom, CACM 1970) over the
# TRAIN half's distinct 16-word windows, probed by the incoming batch's
# windows — the "have we trained on this passage?" gate production
# decontamination/dedup pipelines run as a Bloom pass (e.g. paragraph
# Bloom dedup in Dolma/RefinedWeb-style curation) because the filter is
# O(m) BITS regardless of how many passages it remembers, and a miss is
# DEFINITIVE (no false negatives: seen => all k probe bits set).
#
# Relational form: "bits" are a frame of SET positions (<= m rows, here
# m = 2^16) built by one partial-agg'd distinct over the train window
# stream; a probe window hits iff all k=5 of its md5-derived positions
# join the broadcast bit frame.  The registered entry scores each batch
# document with (distinct windows, bloom hits, truly seen) side by
# side — truly_seen <= bloom_hits row-by-row (one-sidedness,
# test-pinned), and the gap IS the measured false-positive mass.  Both
# engines recompute the filter exactly (md5 recipe as in x42), so the
# sketch itself hash-checks.

_BLOOM_M = 65536  # bits (2^16)
_BLOOM_K = 5      # hash functions
_BLOOM_W = 16     # words per window (x38's window size)
_BLOOM_SPLIT = 250  # doc_id < split trains the filter; rest probes


def _bloom_pos(key: F.Column, row: F.Column) -> F.Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(row.cast("string"), F.lit("|"), key)), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % _BLOOM_M).alias("pos")


def _windows(
    docs: DataFrame,
    w: int = _BLOOM_W,
    extra_cols: list[str] | None = None,
    distinct: bool = True,
) -> DataFrame:
    """(doc_id, [extra_cols,] win): each document's DISTINCT w-word
    sliding windows.  ``extra_cols`` carry doc-level columns (e.g.
    ``source``) on the window stream directly — the map-born frame
    keeps them for free, where a join back to the corpus to recover
    them would cost a second scan plus a corpus-scale shuffle (the
    x38b lesson, carried here for x49).  ``distinct=False`` skips the
    (doc_id, ..., win)-grain exchange for callers that immediately
    re-distinct at a COARSER grain (x49 dedupes at (source, win)) —
    two stacked corpus-scale distincts is one wide shuffle too many
    (ADVICE r7)."""
    # split ONCE into a column the lambda indexes — an inline
    # split-in-lambda re-splits the text per element, O(len^2)/doc
    # (the x40/x29 r8 postmortem class)
    ws = F.col("ws")
    idx = F.when(
        F.size(ws) >= w, F.sequence(F.lit(0), F.size(ws) - F.lit(w))
    ).otherwise(F.expr("array()").cast("array<int>"))
    out = docs.withColumn("ws", F.split("text", " ")).select(
        "doc_id",
        *(extra_cols or []),
        F.explode(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(ws, i + 1, w))
            )
        ).alias("win"),
    )
    return out.distinct() if distinct else out


def bloom_build(keys: DataFrame, key_col: str = "win") -> DataFrame:
    """The set-bit frame (pos) of a Bloom filter over distinct keys —
    <= m rows whatever the key count (partial-agg'd distinct)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("r")
    return (
        keys.select(F.col(key_col).alias("k"), rows)
        .select(_bloom_pos(F.col("k"), F.col("r")))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame, bits: DataFrame, key_col: str = "win"
) -> DataFrame:
    """``probes`` plus a boolean ``bloom_hit``: true iff ALL k positions
    of the key are set (the bits frame broadcasts — O(m) rows)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("r")
    hits = (
        probes.select("*", rows)
        .select(
            *probes.columns, _bloom_pos(F.col(key_col), F.col("r"))
        )
        .join(F.broadcast(bits), "pos")
        .groupBy(*probes.columns)
        .agg(F.count(F.lit(1)).alias("_set"))
        .filter(F.col("_set") == _BLOOM_K)
        .select(*probes.columns, F.lit(True).alias("bloom_hit"))
    )
    return probes.join(hits, probes.columns, "left").fillna(
        False, ["bloom_hit"]
    )


_X44_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[(i+1):(i+{_BLOOM_W})], ' ') AS win
  FROM d, UNNEST(range(CAST(len(w) - {_BLOOM_W - 1} AS BIGINT))) AS u(i)
  WHERE len(w) >= {_BLOOM_W}),
bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(CAST(u.r AS VARCHAR) || '|' || win),
                              1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
  FROM wins, LATERAL unnest(range(0, {_BLOOM_K})) AS u(r)
  WHERE doc_id < {_BLOOM_SPLIT}),
probe AS (SELECT doc_id, win FROM wins WHERE doc_id >= {_BLOOM_SPLIT}),
hits AS (
  SELECT doc_id, win FROM (
    SELECT p.doc_id, p.win, COUNT(*) AS c
    FROM (SELECT doc_id, win,
                 CAST(('0x' || substr(md5(CAST(u.r AS VARCHAR) || '|' || win),
                                      1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
          FROM probe, LATERAL unnest(range(0, {_BLOOM_K})) AS u(r)) p
    JOIN bits USING (pos) GROUP BY p.doc_id, p.win) q
  WHERE c = {_BLOOM_K}),
seen AS (
  SELECT DISTINCT p.doc_id, p.win FROM probe p
  WHERE EXISTS (SELECT 1 FROM wins t
                WHERE t.doc_id < {_BLOOM_SPLIT} AND t.win = p.win))
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN h.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom_hits,
       CAST(SUM(CASE WHEN s.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truly_seen
FROM probe p
LEFT JOIN hits h ON h.doc_id = p.doc_id AND h.win = p.win
LEFT JOIN seen s ON s.doc_id = p.doc_id AND s.win = p.win
GROUP BY p.doc_id
ORDER BY p.doc_id"""


@register("x44_bloom_probe", _X44_ORACLE)
def x44_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X44 Bloom membership probe: per incoming-batch document, how many
    of its distinct 16-word windows the train-half Bloom filter flags
    (n_bloom_hits) vs how many are genuinely in the train half
    (n_truly_seen <= n_bloom_hits ALWAYS — the gap is measured false
    positives).  Filter state is O(m) bits at any train size; the probe
    is a broadcast join of the bit frame against the window stream."""
    docs = widen_for_cpu(load(spark, sf_dir, "documents"), "doc_id")
    wins = _windows(docs)
    bits = bloom_build(wins.filter(F.col("doc_id") < _BLOOM_SPLIT))
    probe = wins.filter(F.col("doc_id") >= _BLOOM_SPLIT)
    flagged = bloom_probe(probe, bits)
    train_wins = (
        wins.filter(F.col("doc_id") < _BLOOM_SPLIT)
        .select("win")
        .distinct()
    )
    seen = probe.join(train_wins, "win", "left_semi").select(
        "doc_id", "win", F.lit(True).alias("truly_seen")
    )
    return (
        flagged.join(seen, ["doc_id", "win"], "left")
        .fillna(False, ["truly_seen"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.col("bloom_hit").cast("long"))
            .cast("long")
            .alias("n_bloom_hits"),
            F.sum(F.col("truly_seen").cast("long"))
            .cast("long")
            .alias("n_truly_seen"),
        )
        .orderBy("doc_id")
    )


# -- x45: histogram quantile summary (the QUANTILE sketch tier) -------------
#
# Completes the sketch family's fourth axis (q08 HLL = cardinality,
# x42 CMS = frequency, x44 Bloom = membership, x45 = QUANTILES): a
# B-bin equi-width histogram over the per-doc token-count stream,
# served next to the EXACT quantiles it approximates — the q08/x42
# audit-twin shape, so the estimator's rank error is measured, not
# assumed.
#
# Why a histogram and not GK/KLL here: the production property that
# matters is MERGEABILITY — bin counts are additive, so the distributed
# build is one partial-agg'd groupBy (map-side combine IS the histogram
# merge, exactly the CMS argument) and the same additivity folds
# streaming micro-batches through the exactly-once ledger
# (state_sink.sink_histogram_state).  GK/KLL trade determinism for
# adaptive bin placement; a deterministic integer-edge histogram is
# hash-checkable cross-engine AND is what ANALYZE-style engine
# statistics actually persist.
#
# Sufficient statistic: the VALUE-COUNT frame vc(v, c) — one corpus
# scan, partial-agg'd; lo/hi/n, the histogram cells, and the exact
# quantiles all derive from vc without touching the corpus again.  The
# only SinglePartition windows run over vc (O(distinct token counts) —
# bounded by max doc length) and the 64-bin cumulative — metadata-scale
# at any corpus size; there is never a global row sort.
#
# All arithmetic is BIGINT (bin = (v-lo)*B div (hi-lo+1), rank targets
# ceil-div, edges floor-div), so both engines hash-match exactly.

_HIST_B = 64          # equi-width bins
_HIST_PS = (500, 900, 990)  # quantile targets, milli units


def token_count_values(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The value-count sufficient statistic vc(v, c): per-doc token
    count -> frequency, one partial-agg'd corpus scan."""
    return (
        widen_for_cpu(docs, "doc_id")
        .select(F.size(F.split(text_col, " ")).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def hist_cells(vc: DataFrame, stats, b: int = _HIST_B) -> DataFrame:
    """Equi-width bin counts from the value-count frame: bin =
    (v - lo) * B div (hi - lo + 1), all BIGINT.  ``stats`` is either a
    (lo, hi) int pair — preferred: the bounds ride as plan LITERALS
    (the x03e/x39b driver-sized pattern, no 1-row crossJoin in the
    plan) — or a 1-row (lo, hi, ...) frame (broadcast)."""
    if isinstance(stats, tuple):
        lo, hi = int(stats[0]), int(stats[1])
        binned = vc.select(
            F.expr(f"(v - {lo}) * {b} div ({hi} - {lo} + 1)").alias("bin"),
            "c",
        )
    else:
        binned = vc.crossJoin(F.broadcast(stats)).select(
            F.expr(f"(v - lo) * {b} div (hi - lo + 1)").alias("bin"),
            "c",
        )
    return binned.groupBy("bin").agg(F.sum("c").alias("bc"))


_X45_ORACLE = f"""
WITH vc AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1),
st AS (SELECT MIN(v) AS lo, MAX(v) AS hi, SUM(c) AS n FROM vc),
cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM vc),
cells AS (
  SELECT (v - lo) * {_HIST_B} // (hi - lo + 1) AS bin, SUM(c) AS bc
  FROM vc CROSS JOIN st GROUP BY 1),
bcum AS (SELECT bin, SUM(bc) OVER (ORDER BY bin) AS bcum FROM cells),
t AS (SELECT CAST(u.p AS BIGINT) AS p_milli,
             CAST((u.p * n + 999) // 1000 AS BIGINT) AS target_rank, lo, hi
      FROM st, UNNEST([{", ".join(str(p) for p in _HIST_PS)}]) AS u(p)),
e AS (SELECT p_milli, MIN(v) AS exact_q
      FROM t JOIN cum ON cum.cum >= t.target_rank GROUP BY 1),
b AS (SELECT p_milli, CAST(MIN(bin) AS BIGINT) AS est_bin
      FROM t JOIN bcum ON bcum.bcum >= t.target_rank GROUP BY 1)
SELECT t.p_milli, t.target_rank, e.exact_q, b.est_bin,
       CAST(t.lo + (b.est_bin * (t.hi - t.lo + 1)) // {_HIST_B} AS BIGINT)
           AS hist_est
FROM t JOIN e USING (p_milli) JOIN b USING (p_milli)
ORDER BY p_milli"""


@register("x45_hist_quantiles", _X45_ORACLE)
def x45_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45 histogram quantile audit twin: p50/p90/p99 of the per-doc
    token-count distribution, EXACT (rank scan over the value-count
    frame) next to the 64-bin equi-width histogram's estimate (lower
    edge of the first bin whose cumulative count reaches the target
    rank).  hist_est <= exact_q < next edge ALWAYS (the containing-bin
    theorem, test-pinned); the gap is the measured rank error.  Bin
    counts are additive -> one partial-agg'd build at any corpus size
    and the same cells fold streaming batches (S18)."""
    from pyspark.sql import Window

    from cubefs_hadoop_spark.plans.materialize import barrier

    docs = load(spark, sf_dir, "documents")
    vc = barrier(token_count_values(docs))
    # (lo, hi, n) and the three rank targets pin as plan LITERALS from
    # one 1-row agg (the x03e/x39b driver-sized pattern): the per-target
    # "first row reaching rank r" scans become conditional MIN
    # aggregates — zero joins anywhere in the plan
    st = vc.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("c").alias("n")
    ).first()
    if st["lo"] is None:
        raise ValueError("x45_hist_quantiles: empty documents table")
    lo, hi, n = int(st["lo"]), int(st["hi"]), int(st["n"])
    ranks = {p: (p * n + 999) // 1000 for p in _HIST_PS}
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.withColumn("cum", F.sum("c").over(wv))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    bcum = (
        hist_cells(vc, (lo, hi))
        .withColumn("bcum", F.sum("bc").over(wb))
    )
    exact = cum.agg(
        *[
            F.min(F.when(F.col("cum") >= r, F.col("v"))).alias(f"e{p}")
            for p, r in ranks.items()
        ]
    )
    est = bcum.agg(
        *[
            F.min(F.when(F.col("bcum") >= r, F.col("bin"))).alias(f"b{p}")
            for p, r in ranks.items()
        ]
    )
    one = exact.unionByName(est, allowMissingColumns=True).agg(
        *[
            F.first(c, ignorenulls=True).alias(c)
            for p in ranks
            for c in (f"e{p}", f"b{p}")
        ]
    )
    stack = ", ".join(
        f"CAST({p} AS BIGINT), CAST({r} AS BIGINT), e{p}, b{p}, "
        f"CAST({lo} + (b{p} * ({hi} - {lo} + 1)) div {_HIST_B} AS BIGINT)"
        for p, r in ranks.items()
    )
    return one.selectExpr(
        f"stack({len(ranks)}, {stack}) AS "
        "(p_milli, target_rank, exact_q, est_bin, hist_est)"
    ).orderBy("p_milli")


# -- x45b: equi-depth histogram statistics (value-granularity) --------------
#
# The ANALYZE-statistics primitive: B equal-mass buckets over the
# token-count distribution, split at VALUE boundaries — bucket(v) =
# (last_rank(v) - 1) * B div n, where last_rank is the value's
# cumulative count.  Value granularity (ties never straddle a bucket)
# is deliberate: it is derivable from the vc sufficient statistic with
# NO global row sort — the row-level NTILE formulation would funnel the
# corpus through one partition, the classic scale-killer, while this
# form's only SinglePartition window runs over O(distinct values) rows.
# Per-bucket (n_docs, lo_v, hi_v, n_values) is exactly what an
# optimizer's equi-depth stats page stores.

_ED_B = 16  # equi-depth buckets


_X45B_ORACLE = f"""
WITH vc AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1),
st AS (SELECT SUM(c) AS n FROM vc),
cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM vc)
SELECT CAST((cum - 1) * {_ED_B} // n AS BIGINT) AS bucket,
       CAST(SUM(c) AS BIGINT) AS n_docs, MIN(v) AS lo_v, MAX(v) AS hi_v,
       CAST(COUNT(*) AS BIGINT) AS n_values
FROM cum CROSS JOIN st
GROUP BY 1 ORDER BY bucket"""


@register("x45b_equidepth_stats", _X45B_ORACLE)
def x45b_equidepth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45b equi-depth (equal-mass) histogram of the token-count
    distribution at value granularity: 16 buckets of ~n/16 docs each,
    split only at distinct-value boundaries so the whole statistic
    derives from the vc frame — one corpus scan, no global row sort.
    Buckets are disjoint value ranges (hi_v[b] < lo_v[b+1],
    test-pinned) and bucket doc-counts sum to n exactly."""
    from pyspark.sql import Window

    from cubefs_hadoop_spark.plans.materialize import barrier

    docs = load(spark, sf_dir, "documents")
    vc = barrier(token_count_values(docs))
    # corpus total pinned as a plan literal (x03e/x39b pattern — no
    # 1-row crossJoin riding the vc frame)
    n = vc.agg(F.sum("c")).first()[0]
    if n is None:
        raise ValueError("x45b_equidepth_stats: empty documents table")
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.withColumn("cum", F.sum("c").over(wv))
    return (
        cum.select(
            F.expr(f"(cum - 1) * {_ED_B} div {int(n)}").alias("bucket"),
            "v",
            "c",
        )
        .groupBy("bucket")
        .agg(
            F.sum("c").alias("n_docs"),
            F.min("v").alias("lo_v"),
            F.max("v").alias("hi_v"),
            F.count(F.lit(1)).cast("long").alias("n_values"),
        )
        .orderBy("bucket")
    )


# -- x48: per-source distribution drift (histogram L1 distance) -------------
#
# The MONITORING primitive a continuously-ingesting pipeline runs on
# every source: does this feed's length distribution still look like
# the corpus?  Drift is measured as the L1 distance between the
# source's token-count histogram and the corpus-wide one, in integer
# millis over shared corpus-derived bins — the statistic behind
# "source X started sending truncated/boilerplate docs" alerts.
#
# Scale: ONE partial-agg'd corpus pass builds the (source, bin) cell
# grid; everything after is O(sources x bins) — metadata-scale.  The
# cells are the same additive state as x45's (S18 folds them per
# micro-batch), so the drift table can be served live from streamed
# state without re-reading anything.  Bins are frozen from the CORPUS
# [lo, hi] so every source is measured on the same axis.
#
# All-BIGINT arithmetic (milli proportions via integer division) —
# hash-checkable cross-engine; the truncation error is identical in
# both engines by construction.

_DRIFT_B = 64


_X48_ORACLE = f"""
WITH v AS (SELECT source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS v
           FROM documents),
st AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM v),
cells AS (
  SELECT source, (v - lo) * {_DRIFT_B} // (hi - lo + 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS bc
  FROM v CROSS JOIN st GROUP BY 1, 2),
srcs AS (SELECT source, CAST(SUM(bc) AS BIGINT) AS ns FROM cells GROUP BY 1),
gbl AS (SELECT bin, CAST(SUM(bc) AS BIGINT) AS gc FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(bc) AS BIGINT) AS n FROM cells),
grid AS (
  SELECT s.source, s.ns, g.bin, g.gc, COALESCE(c.bc, 0) AS bc
  FROM srcs s CROSS JOIN gbl g
  LEFT JOIN cells c ON c.source = s.source AND c.bin = g.bin)
SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
       CAST(SUM(ABS(1000 * bc // ns - 1000 * gc // n)) AS BIGINT)
           AS l1_milli,
       CAST(MAX(ABS(1000 * bc // ns - 1000 * gc // n)) AS BIGINT)
           AS max_bin_milli
FROM grid CROSS JOIN tot
GROUP BY source ORDER BY source"""


@register("x48_source_drift", _X48_ORACLE)
def x48_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48 per-source distribution drift: L1 distance (and worst-bin
    deviation) between each source's token-count histogram and the
    corpus-wide histogram, integer millis over shared corpus-derived
    64 bins.  One partial-agg'd corpus pass -> O(sources x bins) grid;
    the cells are x45's additive state, so streamed S18 cells serve the
    same drift table live.  Identical-distribution sources score near
    0; a drifted feed's L1 is the alert signal."""
    from cubefs_hadoop_spark.plans.materialize import barrier

    docs = load(spark, sf_dir, "documents")
    v = widen_for_cpu(docs, "doc_id").select(
        "source", F.size(F.split("text", " ")).cast("long").alias("v")
    )
    # corpus [lo, hi] and total pinned as plan literals from 1-row aggs
    # (the x03e/x39b driver-sized pattern): bin assignment and the milli
    # proportions stay join-free — no 1-row crossJoins in the plan
    st = v.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    if st["lo"] is None:
        raise ValueError("x48_source_drift: empty documents table")
    lo, hi = int(st["lo"]), int(st["hi"])
    cells = barrier(
        v.select(
            "source",
            F.expr(f"(v - {lo}) * {_DRIFT_B} div ({hi} - {lo} + 1)").alias(
                "bin"
            ),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
    )
    # post-cells stage delegates to drift_from_cells — the SAME code
    # path the S18 streamed state is served through, so the
    # oracle-checked batch table and the live one cannot diverge
    from cubefs_hadoop_spark.streaming.state_sink import drift_from_cells

    n = cells.agg(F.sum("bc")).first()[0]
    return drift_from_cells(cells, group_col="source", total=int(n))


# -- x49: cross-source contamination matrix ---------------------------------
#
# The PROVENANCE diagnostic completing the observability pair (x48
# answers "did a source's distribution drift?"; x49 answers "which
# sources share verbatim passages with which?"): for every source
# pair, how many distinct 16-word windows (x38/x44's passage unit)
# appear in BOTH — plus a milli containment score
# 1000·shared/min(|A|,|B|), the asymmetric-size-robust overlap measure
# dedup planning uses (a mirror site shows containment ~1000 against
# its origin even when the origin is 100x larger).
#
# Scale: the (source, win) frame is a partial-agg'd distinct off one
# corpus pass; the matrix is a win-keyed EQUI-join — pair space is
# per-window (bounded by sources-per-window <= S, never corpus²), and
# the output is at most S² rows of metadata.  The matrix is what routes
# an x38b dedup pass: pairs at high containment are mirror feeds worth
# deduplicating against each other first.

_X49_ORACLE = f"""
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
wins AS (
  SELECT DISTINCT source,
         array_to_string(w[(i+1):(i+{_BLOOM_W})], ' ') AS win
  FROM d, UNNEST(range(CAST(len(w) - {_BLOOM_W - 1} AS BIGINT))) AS u(i)
  WHERE len(w) >= {_BLOOM_W}),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nw FROM wins GROUP BY 1),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS shared_windows
  FROM wins a JOIN wins b ON a.win = b.win AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.shared_windows,
       sa.nw AS n_windows_a, sb.nw AS n_windows_b,
       CAST(1000 * p.shared_windows // LEAST(sa.nw, sb.nw) AS BIGINT)
           AS containment_milli
FROM pairs p
JOIN sz sa ON sa.source = p.src_a
JOIN sz sb ON sb.source = p.src_b
ORDER BY src_a, src_b"""


@register("x49_overlap_matrix", _X49_ORACLE)
def x49_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49 cross-source contamination matrix: per source pair, the
    count of distinct 16-word windows present in both, each side's
    distinct window count, and milli containment
    1000·shared/min(|A|,|B|).  One corpus pass -> (source, win)
    distinct frame; the matrix is a win-keyed equi-join (pair space
    per-window, never corpus²), output <= sources² rows."""
    from cubefs_hadoop_spark.plans.materialize import barrier

    docs = widen_for_cpu(load(spark, sf_dir, "documents"), "doc_id")
    # source rides the map-born window stream (extra_cols) — ONE corpus
    # scan, no join back to recover doc-level columns (the x38b lesson);
    # distinct=False skips the (doc_id, source, win)-grain exchange and
    # dedupes ONCE at the (source, win) grain x49 actually needs
    wins = barrier(
        _windows(docs, extra_cols=["source"], distinct=False)
        .select("source", "win")
        .distinct()
    )
    sz = wins.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nw")
    )
    a = wins.select(F.col("source").alias("src_a"), "win")
    b = wins.select(F.col("source").alias("src_b"), "win")
    pairs = (
        a.join(b, "win")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_windows"))
    )
    return (
        pairs.join(
            F.broadcast(sz.withColumnRenamed("source", "src_a")), "src_a"
        )
        .withColumnRenamed("nw", "n_windows_a")
        .join(F.broadcast(sz.withColumnRenamed("source", "src_b")), "src_b")
        .withColumnRenamed("nw", "n_windows_b")
        .select(
            "src_a",
            "src_b",
            "shared_windows",
            "n_windows_a",
            "n_windows_b",
            F.expr(
                "1000 * shared_windows div least(n_windows_a, n_windows_b)"
            ).alias("containment_milli"),
        )
        .orderBy("src_a", "src_b")
    )
