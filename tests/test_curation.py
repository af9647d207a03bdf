"""Behavioral tests for the corpus-curation operators (curation.py,
x16-x19) beyond their DuckDB hash oracles: exact witness sets, budget
invariants, permutation/band-invariance properties, and the plan shapes
the 100 TB story depends on (WindowGroupLimit, no corpus-sized
SinglePartition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.extensions.curation import (
    curriculum_order,
    segment_dedup,
    stratified_sample,
    token_budget_sample,
)
from cubefs_hadoop_spark.plans.audit import audit_plan
from tests.conftest import SF_SMOKE


def test_segment_dedup_witness(spark):
    """x16 on a hand-built corpus: the duplicated 2-word segment survives
    only in its first (doc_id, pos) home; a document made entirely of
    already-seen segments vanishes."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # segs (k=2): "a b", "c d"
            (2, "c d e f"),      # "c d" duplicates doc 1 -> keeps "e f"
            (3, "a b c d"),      # nothing new -> vanishes
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_kept, r.text_dedup)
        for r in segment_dedup(docs, k=2).collect()
    }
    assert out == {1: (2, "a b c d"), 2: (1, "e f")}


def test_segment_dedup_segments_globally_unique(spark):
    """Every distinct segment value in the corpus survives in exactly
    one (doc, position) home — no segment lost, none kept twice."""
    docs = load(spark, SF_SMOKE, "documents")
    out = segment_dedup(docs).collect()
    # keep-first keeps exactly one home per distinct segment value, so
    # the kept-segment count must equal the corpus's distinct-segment count
    segs = docs.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(F.split("text", " ")) / F.lit(8.0)).cast(
                        "int"
                    )
                    - 1,
                ),
                lambda i: F.array_join(
                    F.slice(F.split("text", " "), i * 8 + 1, F.lit(8)), " "
                ),
            )
        ).alias("seg")
    )
    n_distinct = segs.select("seg").distinct().count()
    assert sum(r.n_kept for r in out) == n_distinct


def test_token_budget_properties(spark):
    """x17: every kept doc starts under budget, the kept set is a PREFIX
    of each source's md5 order (no gaps), and the result is stable under
    repartitioning (RNG-free)."""
    docs = load(spark, SF_SMOKE, "documents")
    out = token_budget_sample(docs, budget=400).collect()
    assert all(r.cum_before < 400 for r in out)
    # prefix property: within a source, kept docs in hash order have
    # cum_before == running sum of the previous kept docs' tokens
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.cum_before)
        running = 0
        for r in rows:
            assert r.cum_before == running
            running += r.tokens
    alt = token_budget_sample(docs.repartition(13), budget=400).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, alt))


def test_curriculum_order_is_permutation_and_band_invariant(spark):
    """x18: ranks are a contiguous permutation 1..N consistent with
    (score DESC, doc_id ASC), and the banded plan is a pure plan choice —
    band width cannot change the assignment."""
    docs = load(spark, SF_SMOKE, "documents")
    out = curriculum_order(docs, band_width=32).collect()
    n = docs.count()
    assert sorted(r.rank for r in out) == list(range(1, n + 1))
    ordered = sorted(out, key=lambda r: r.rank)
    assert ordered == sorted(ordered, key=lambda r: (-r.score, r.doc_id))
    alt = curriculum_order(docs, band_width=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, alt))


def test_stratified_sample_exact_counts(spark):
    """x19: exactly min(n, stratum size) per stratum; deterministic
    across repartitioning."""
    docs = load(spark, SF_SMOKE, "documents")
    out = stratified_sample(docs, n=7).collect()
    sizes = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    got: dict[str, int] = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert got == {lang: min(7, c) for lang, c in sizes.items()}
    alt = stratified_sample(docs.repartition(11), n=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, alt))


def test_curation_plan_shapes(spark):
    """The scale claims in curation.py's docstrings, asserted on real
    plans: keep-first/top-n filters compile to WindowGroupLimit (map-side
    per-key reduction before the shuffle); the x17 prefix sum has NO
    SinglePartition exchange at all (both window levels are partitioned);
    x18's only SinglePartition window is the driver-scale band-counts
    frame; nothing drops to Python."""
    spark.catalog.clearCache()
    docs = load(spark, SF_SMOKE, "documents")

    a16 = audit_plan(segment_dedup(docs))
    assert a16.has_window_group_limit
    assert "SinglePartition" not in a16.text
    assert "BatchEvalPython" not in a16.text

    a17 = audit_plan(token_budget_sample(docs))
    assert "SinglePartition" not in a17.text
    assert "BatchEvalPython" not in a17.text

    a18 = audit_plan(curriculum_order(docs))
    assert a18.text.count("SinglePartition") == 1  # band-counts frame only
    assert "BatchEvalPython" not in a18.text

    a19 = audit_plan(stratified_sample(docs))
    assert a19.has_window_group_limit
    assert "SinglePartition" not in a19.text
    assert "BatchEvalPython" not in a19.text


def test_chunk_documents_contract(spark):
    """x30 witness: full coverage, exact overlap between consecutive
    chunks, short final chunk, and the >=1-chunk-per-doc guarantee
    (empty text included — no row may silently vanish)."""
    from cubefs_hadoop_spark.extensions.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, "")], ["doc_id", "text"]
    )
    out = {}
    for r in chunk_documents(docs, size=4, overlap=2).collect():
        out.setdefault(r.doc_id, []).append(r)
    # doc 1 (10 chars, stride 2): ceil((10-2)/2)=4 chunks
    c1 = sorted(out[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in c1] == ["abcd", "cdef", "efgh", "ghij"]
    assert [r.char_start for r in c1] == [0, 2, 4, 6]
    # consecutive chunks share exactly `overlap` chars
    for a, b in zip(c1, c1[1:]):
        assert a.chunk_text[-2:] == b.chunk_text[:2]
    # coverage: stitching chunks at stride offsets rebuilds the doc
    assert c1[0].chunk_text + "".join(r.chunk_text[2:] for r in c1[1:]) == "abcdefghij"
    # doc 2: one short chunk; doc 3: empty text still yields one row
    assert [(r.chunk_text, r.chunk_len) for r in out[2]] == [("abc", 3)]
    assert [(r.chunk_text, r.chunk_len) for r in out[3]] == [("", 0)]
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, size=4, overlap=4)


# -- x47: histogram-percentile quality blend --------------------------------


def test_x47_percentile_bounds_and_monotonicity(spark):
    """The histogram percentile is a one-sided overestimate of the
    exact inclusive percent-rank, off by at most the answer bin's mass
    (plus integer rounding) — and it is monotone in the raw signal."""
    from collections import Counter

    from cubefs_hadoop_spark.extensions.curation import (
        _X47_B,
        _x47_signals,
    )
    from cubefs_hadoop_spark.queries import QUERIES

    rows = QUERIES["x47_quality_blend"](spark, SF_SMOKE).collect()
    sigs = {
        r.doc_id: r for r in _x47_signals(
            load(spark, SF_SMOKE, "documents")
        ).collect()
    }
    n = len(rows)
    assert n == len(sigs)
    for sig, pcol in (("s1", "pct_s1"), ("s2", "pct_s2"), ("s3", "pct_s3")):
        vals = sorted(getattr(sigs[r.doc_id], sig) for r in rows)
        lo, hi = vals[0], vals[-1]
        width = hi - lo + 1
        bin_mass = Counter((v - lo) * _X47_B // width for v in vals)
        # exact inclusive rank via bisect on the sorted values
        import bisect

        prev = {}
        for r in rows:
            v = getattr(sigs[r.doc_id], sig)
            p_hist = getattr(r, pcol)
            assert 0 <= p_hist <= 1000
            p_exact = 1000 * bisect.bisect_right(vals, v) // n
            mass = bin_mass[(v - lo) * _X47_B // width]
            assert p_exact <= p_hist <= p_exact + 1000 * mass // n + 1, (
                sig, v, p_hist, p_exact, mass,
            )
            if v in prev:
                assert prev[v] == p_hist  # same value -> same percentile
            prev[v] = p_hist


def test_x47_blend_accounting_and_separation(spark):
    """blend is the exact 40/30/30 integer average of the percentiles,
    kept == (blend >= 500), and the threshold separates the fixture
    into two non-trivial classes (roughly the top half)."""
    from cubefs_hadoop_spark.queries import QUERIES

    rows = QUERIES["x47_quality_blend"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.blend == (40 * r.pct_s1 + 30 * r.pct_s2 + 30 * r.pct_s3) // 100
        assert r.kept == (r.blend >= 500)
    kept = sum(1 for r in rows if r.kept)
    assert 0.2 <= kept / len(rows) <= 0.8


def test_x47_partitioning_invariant(spark):
    """Integer histogram math end-to-end: repartitioning the corpus
    cannot move a single percentile, blend, or kept flag."""
    from cubefs_hadoop_spark.extensions.curation import (
        _X47_KEEP,
        _x47_signals,
        hist_percentile,
    )

    docs = load(spark, SF_SMOKE, "documents")
    def run(d):
        out = _x47_signals(d)
        for s in ("s1", "s2", "s3"):
            out = hist_percentile(out, s)
        return sorted(
            (r.doc_id, r.pct_s1, r.pct_s2, r.pct_s3)
            for r in out.collect()
        )

    assert run(docs) == run(docs.repartition(17))


def test_x47_plan_shape(spark):
    """No Python, no percent_rank global sort over the corpus: the only
    SinglePartition windows run over the O(bins) cells frames, the
    percentile lookups are broadcast joins, no sort-merge join."""
    from cubefs_hadoop_spark.queries import QUERIES

    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x47_quality_blend"](spark, SF_SMOKE))
    assert not a.has_python_eval
    assert a.sort_merge_joins == 0
    assert a.broadcast_joins >= 3  # one pct lookup per signal
    # (lo, hi, n) ride as plan literals — no 1-row crossJoins at all
    assert a.nested_loop_joins == 0


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    )
)
def test_hist_percentile_property(spark, vals):
    """x47's normalizer vs a pure-Python reference for ANY integer
    multiset (ties, negatives, single-value): pct(v) = 1000 *
    (mass of bins <= bin(v)) // n, bin(v) = (v-lo)*B div (hi-lo+1) —
    bit-equal, monotone in v, and 1000 for the max value."""
    from collections import Counter

    from cubefs_hadoop_spark.extensions.curation import (
        _X47_B,
        hist_percentile,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, s1 long"
    )
    got = {r.id: r.pct_s1 for r in hist_percentile(df, "s1").collect()}

    lo, hi, n = min(vals), max(vals), len(vals)
    width = hi - lo + 1
    # python floor-div matches Spark's `div` here: (v-lo) >= 0 always
    bins = Counter((v - lo) * _X47_B // width for v in vals)
    cum = {}
    running = 0
    for b in sorted(bins):
        running += bins[b]
        cum[b] = running
    for i, v in enumerate(vals):
        ref = 1000 * cum[(v - lo) * _X47_B // width] // n
        assert got[i] == ref, (v, got[i], ref)
    vmax = max(vals)
    assert all(
        got[i] == 1000 for i, v in enumerate(vals) if v == vmax
    )
    by_val = sorted(set(vals))
    pcts = {
        v: got[next(i for i, x in enumerate(vals) if x == v)] for v in by_val
    }
    assert all(
        pcts[a] <= pcts[b] for a, b in zip(by_val, by_val[1:])
    )
