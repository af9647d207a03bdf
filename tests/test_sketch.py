"""Count-Min sketch (x42/x42b): one-sided error, estimate quality,
sketch-guided exact heavy hitters, determinism, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.extensions.sketch import (
    _CMS_D,
    _CMS_W,
    cms_estimates,
    count_min_cells,
)
from cubefs_hadoop_spark.plans.audit import audit_plan
from cubefs_hadoop_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cms_error_is_one_sided_on_fixture(spark):
    """est >= exact for EVERY key (the Count-Min invariant), and with
    W >> distinct keys most estimates are collision-free and exact."""
    rows = QUERIES["x42_countmin"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    exact_hits = sum(1 for r in rows if r.cms_est == r.exact_cnt)
    assert exact_hits >= len(rows) * 0.8  # 31 keys in 4x256 counters


def test_cms_cells_mass_conservation(spark):
    """Every counter row holds the whole stream: sum of each of the D
    rows' cells == stream length (increments are never dropped)."""
    docs = load(spark, SF_SMOKE, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    n = words.count()
    per_row = (
        count_min_cells(words)
        .groupBy("row")
        .agg(F.sum("c").alias("mass"))
        .collect()
    )
    assert len(per_row) == _CMS_D
    assert all(r.mass == n for r in per_row)
    # state bound: never more than D x W cells, whatever the stream
    assert count_min_cells(words).count() <= _CMS_D * _CMS_W


def test_cms_heavy_hitters_exact_on_skewed_corpus(spark, tmp_path):
    """Crafted zipf-ish corpus: the two-pass CMS+verify output equals
    the ground-truth heavy-hitter set exactly — candidates the sketch
    over-proposes are removed by the exact pass, nothing true is missed
    (no false negatives: est >= true)."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["hot"] * 40 + ["warm"] * 20 + ["w%d" % i for i in range(30)])),
            (2, " ".join(["hot"] * 40 + ["mild"] * 3 + ["v%d" % i for i in range(25)])),
        ],
        "doc_id long, text string",
    )
    # stream: 40+20+30 + 40+3+25 = 158 words; threshold = 158/64 -> cnt*64 >= 158
    # hot=80 (heavy), warm=20 (heavy: 1280 >= 158), mild=3 (1.2x: 192 >= 158 heavy!),
    # singletons: 64 < 158 -> out
    import cubefs_hadoop_spark.extensions.sketch as sk

    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    n = words.count()
    truth = {
        (r.word, r["count"])
        for r in words.groupBy("word").count().collect()
        if r["count"] * sk._HH_PHI >= n
    }
    tmp = str(tmp_path / "cms_hh_fixture")
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    got = {
        (r.word, r.exact_cnt)
        for r in QUERIES["x42b_cms_heavy_hitters"](spark, tmp).collect()
    }
    assert got == truth
    assert ("hot", 80) in got
    singles = {w for w, _ in got if w[0] in "wv" and w[1:].isdigit()}
    assert not singles  # no singleton survived the exact pass


def test_cms_is_partitioning_invariant(spark):
    """Counters are additive — repartitioning the stream cannot change a
    single cell, estimate, or heavy-hitter row."""
    docs = load(spark, SF_SMOKE, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    a = sorted(map(tuple, count_min_cells(words).collect()))
    b = sorted(map(tuple, count_min_cells(words.repartition(17)).collect()))
    assert a == b
    keys = words.distinct()
    cells = count_min_cells(words)
    e1 = sorted(map(tuple, cms_estimates(keys, cells).collect()))
    e2 = sorted(
        map(tuple, cms_estimates(keys.repartition(5), cells).collect())
    )
    assert e1 == e2


def test_x42_plan_shape(spark):
    """The sketch build is explode + partial-agg'd groupBy (map-side
    combine IS the CMS merge); probes join the O(DxW) cells frame by
    BROADCAST; no Python, no sort-merge join anywhere."""
    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x42_countmin"](spark, SF_SMOKE))
    assert a.broadcast_joins >= 1
    assert a.sort_merge_joins == 0
    assert not a.has_python_eval
    b = audit_plan(QUERIES["x42b_cms_heavy_hitters"](spark, SF_SMOKE))
    assert not b.has_python_eval
    assert "LeftSemi" in b.text  # pass 2 counts candidates only
    assert b.sort_merge_joins == 0


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
        min_size=1,
        max_size=60,
    )
)
def test_cms_invariants_property(spark, words):
    """x42 property: for ANY word stream — collisions, repeats, ties —
    (a) every estimate >= its exact count (one-sided error), (b) every
    counter row carries the full stream mass, (c) the x42b two-pass
    heavy-hitter output equals the ground truth exactly."""
    import collections

    from cubefs_hadoop_spark.extensions.sketch import (
        _CMS_D,
        _HH_PHI,
        cms_estimates,
        count_min_cells,
    )

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    w = df.select(F.explode(F.split("text", " ")).alias("word"))
    cells = count_min_cells(w)
    n = len(words)
    per_row = {r.row: r.mass for r in
               cells.groupBy("row").agg(F.sum("c").alias("mass")).collect()}
    assert per_row == {r: n for r in range(_CMS_D)}  # (b)
    exact = collections.Counter(words)
    est = {r.word: r.cms_est
           for r in cms_estimates(w.distinct(), cells).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # (a)
    truth = {(k, c) for k, c in exact.items() if c * _HH_PHI >= n}
    cand = {k for k in est if est[k] * _HH_PHI >= n}
    verified = {(k, exact[k]) for k in cand if exact[k] * _HH_PHI >= n}
    assert verified == truth  # (c): no false negatives, exact pass filters


def test_bloom_probe_crafted_witness(spark):
    """x44 semantics on a crafted corpus: a trained passage probing back
    is BOTH bloom-hit and truly seen (no false negatives — definitive
    miss property); a fully novel doc has zero true hits and, at this
    fill ratio (~75 of 65536 bits), zero false positives."""
    from cubefs_hadoop_spark.extensions.sketch import (
        _BLOOM_SPLIT,
        _windows,
        bloom_build,
        bloom_probe,
    )

    P = " ".join(f"p{i}" for i in range(20))      # 20-word shared passage
    novel = " ".join(f"n{i}" for i in range(20))
    rows = [
        (1, P),                                    # train: holds P
        (_BLOOM_SPLIT + 1, P),                     # batch: same passage
        (_BLOOM_SPLIT + 2, novel),                 # batch: fully novel
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wins = _windows(docs)
    bits = bloom_build(wins.filter(F.col("doc_id") < _BLOOM_SPLIT))
    probed = bloom_probe(wins.filter(F.col("doc_id") >= _BLOOM_SPLIT), bits)
    got = {
        (r.doc_id, r.win): r.bloom_hit for r in probed.collect()
    }
    dup_doc = {k: v for k, v in got.items() if k[0] == _BLOOM_SPLIT + 1}
    nov_doc = {k: v for k, v in got.items() if k[0] == _BLOOM_SPLIT + 2}
    assert dup_doc and all(dup_doc.values())   # every trained window hits
    assert nov_doc and not any(nov_doc.values())  # novel windows all miss


def test_bloom_probe_one_sided_on_fixture(spark):
    """On the real corpus: truly_seen <= bloom_hits on EVERY row (a
    genuinely-seen window can never miss), the corpus has nonzero true
    cross-split overlap, and window counts are consistent."""
    from cubefs_hadoop_spark.queries import QUERIES

    rows = QUERIES["x44_bloom_probe"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.n_truly_seen <= r.n_bloom_hits for r in rows)
    assert all(r.n_bloom_hits <= r.n_windows for r in rows)
    assert sum(r.n_truly_seen for r in rows) > 0


def test_x44_plan_shape(spark):
    """The bit frame attaches by BROADCAST (O(m) rows at any train
    size); no nested loop, no Python."""
    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x44_bloom_probe"](spark, SF_SMOKE))
    assert a.broadcast_joins >= 1
    assert a.nested_loop_joins == 0
    assert not a.has_python_eval


# -- x45 / x45b: histogram quantile tier ------------------------------------


def test_hist_quantile_containing_bin_theorem(spark):
    """x45 invariant: the histogram's answer bin CONTAINS the exact
    quantile — hist_est (bin lower edge) <= exact_q < next edge — for
    every target p.  The gap between est and exact is bounded by one
    bin width by construction."""
    from cubefs_hadoop_spark.extensions.sketch import _HIST_B

    rows = QUERIES["x45_hist_quantiles"](spark, SF_SMOKE).collect()
    assert [r.p_milli for r in rows] == [500, 900, 990]
    docs = load(spark, SF_SMOKE, "documents")
    vals = sorted(
        r.v
        for r in docs.select(
            F.size(F.split("text", " ")).alias("v")
        ).collect()
    )
    lo, hi, n = vals[0], vals[-1], len(vals)
    for r in rows:
        assert r.target_rank == (r.p_milli * n + 999) // 1000
        # exact quantile really is the rank-r order statistic
        assert r.exact_q == vals[r.target_rank - 1]
        # bin b holds v iff b <= (v-lo)*B/(hi-lo+1) < b+1, so the last
        # value of bin b is lo + ceil((b+1)*R/B) - 1 — ceil-div, not the
        # floor-div lower-edge formula (a value can EQUAL the floored
        # next edge and still sit in bin b)
        r_width = hi - lo + 1
        edge_next = lo - ((-(r.est_bin + 1) * r_width) // _HIST_B)
        assert r.hist_est <= r.exact_q < edge_next


def test_hist_cells_mass_and_partitioning_invariance(spark):
    """Bin counts carry the whole corpus mass and are additive — the
    same repartition-invariance the CMS cells prove (map-side combine
    IS the histogram merge)."""
    from cubefs_hadoop_spark.extensions.sketch import (
        hist_cells,
        token_count_values,
    )

    docs = load(spark, SF_SMOKE, "documents")
    vc = token_count_values(docs)
    stats = vc.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("c").alias("n")
    )
    cells = hist_cells(vc, stats)
    n_docs = docs.count()
    assert cells.agg(F.sum("bc")).first()[0] == n_docs
    a = sorted(map(tuple, cells.collect()))
    b = sorted(
        map(
            tuple,
            hist_cells(
                token_count_values(docs.repartition(13)), stats
            ).collect(),
        )
    )
    assert a == b
    from cubefs_hadoop_spark.extensions.sketch import _HIST_B

    assert all(0 <= r[0] < _HIST_B for r in a)


def test_hist_quantiles_crafted_reference(spark, tmp_path):
    """Crafted corpus with token counts 1..10 (one doc each): p50 ->
    rank 5 -> 5 words, p90 -> rank 9, p99 -> rank 10 — checked against
    hand-computed order statistics."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i)) for i in range(1, 11)],
        "doc_id long, text string",
    )
    tmp = str(tmp_path / "hist_fixture")
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    rows = {
        r.p_milli: r for r in QUERIES["x45_hist_quantiles"](spark, tmp).collect()
    }
    assert rows[500].target_rank == 5 and rows[500].exact_q == 5
    assert rows[900].target_rank == 9 and rows[900].exact_q == 9
    assert rows[990].target_rank == 10 and rows[990].exact_q == 10
    for r in rows.values():
        assert r.hist_est <= r.exact_q


def test_equidepth_buckets_disjoint_and_complete(spark):
    """x45b invariants: bucket value-ranges are disjoint and ascending,
    doc counts sum to the corpus exactly, bucket ids live in [0, B)."""
    from cubefs_hadoop_spark.extensions.sketch import _ED_B

    rows = QUERIES["x45b_equidepth_stats"](spark, SF_SMOKE).collect()
    assert rows
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(0 <= r.bucket < _ED_B for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.bucket < b.bucket
        assert a.hi_v < b.lo_v  # value ranges never straddle buckets
    for r in rows:
        assert r.lo_v <= r.hi_v and r.n_values >= 1


def test_x45_plan_shape(spark):
    """x45/x45b stay metadata-scale after the one corpus scan: no
    Python, no sort-merge join, SinglePartition windows only over the
    O(distinct-values)/O(bins) frames (<= 2 of them), corpus scan reads
    only doc_id/text."""
    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x45_hist_quantiles"](spark, SF_SMOKE))
    assert not a.has_python_eval
    assert a.sort_merge_joins == 0
    # literal-pinned (lo, hi, n) + conditional-MIN rank scans: the plan
    # has NO joins at all (family parity with x47/x48's refactor)
    assert a.nested_loop_joins == 0
    assert a.broadcast_joins == 0
    assert a.text.count("SinglePartition") <= 2
    spark.catalog.clearCache()
    b = audit_plan(QUERIES["x45b_equidepth_stats"](spark, SF_SMOKE))
    assert not b.has_python_eval
    assert b.sort_merge_joins == 0
    # the cum window's exchange (the AQE text can mention it twice) —
    # it runs over the O(distinct-values) frame, never the corpus
    assert b.text.count("SinglePartition") <= 2


# -- x48: per-source distribution drift -------------------------------------


def test_x48_drift_crafted_witness(spark, tmp_path):
    """Two identical-distribution sources score (near-)zero L1; a third
    source with a shifted length distribution scores large — and the
    drifted source's L1 exceeds the matched sources' by a wide margin."""
    rows = []
    did = 0
    for src in ("a", "b"):  # identical length mix
        for ln in [5] * 20 + [50] * 20:
            rows.append((did, " ".join(["w"] * ln), src))
            did += 1
    for ln in [200] * 40:  # drifted: all long
        rows.append((did, " ".join(["w"] * ln), "drifted"))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tmp = str(tmp_path / "drift_fixture")
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    out = {r.source: r for r in QUERIES["x48_source_drift"](spark, tmp).collect()}
    assert set(out) == {"a", "b", "drifted"}
    assert out["a"].l1_milli == out["b"].l1_milli  # identical mixes tie
    assert out["drifted"].l1_milli > out["a"].l1_milli + 500
    assert out["drifted"].max_bin_milli > out["a"].max_bin_milli
    assert all(r.n_docs == 40 for r in out.values())


def test_x48_l1_bounds_and_fixture_sanity(spark):
    """L1 in [0, 2000] by construction (two milli distributions); every
    fixture source present with its true doc count."""
    rows = QUERIES["x48_source_drift"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents")
    true_counts = {
        r.source: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    assert {r.source for r in rows} == set(true_counts)
    for r in rows:
        assert r.n_docs == true_counts[r.source]
        assert 0 <= r.max_bin_milli <= r.l1_milli <= 2000


def test_x48_plan_shape(spark):
    """One corpus pass then O(sources x bins): no Python, no sort-merge
    join, no SinglePartition funnel (no windows at all), global/total
    frames attach by broadcast."""
    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x48_source_drift"](spark, SF_SMOKE))
    assert not a.has_python_eval
    assert a.sort_merge_joins == 0
    assert a.text.count("SinglePartition") <= 1  # the 1-row stats agg
    # only the declared O(sources)xO(bins) grid cross join; [lo, hi]
    # and the corpus total ride as plan literals
    assert a.nested_loop_joins <= 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40)
)
def test_hist_quantile_property(spark, lens):
    """x45 property: for ANY token-count multiset — ties, skew,
    single-value corpora — (a) the value-count frame is the exact
    multiset, (b) bin mass is conserved and bins stay in range, (c) for
    every target rank the first bin whose cumulative mass reaches it is
    EXACTLY the bin containing the true order statistic (the
    containing-bin theorem x45's estimate rests on)."""
    from collections import Counter

    from cubefs_hadoop_spark.extensions.sketch import (
        _HIST_B,
        hist_cells,
        token_count_values,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    vc = token_count_values(docs)
    got = {r.v: r.c for r in vc.collect()}
    assert got == dict(Counter(lens))  # (a)

    stats = vc.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("c").alias("n")
    )
    cells = {r.bin: r.bc for r in hist_cells(vc, stats).collect()}
    n = len(lens)
    lo, hi = min(lens), max(lens)
    width = hi - lo + 1
    assert sum(cells.values()) == n  # (b)
    assert all(0 <= b < _HIST_B for b in cells)

    ordered = sorted(lens)
    for p in (500, 900, 990):
        r = (p * n + 999) // 1000
        exact = ordered[r - 1]
        cum, est_bin = 0, None
        for b in sorted(cells):
            cum += cells[b]
            if cum >= r:
                est_bin = b
                break
        assert est_bin == (exact - lo) * _HIST_B // width  # (c)


# -- x49: cross-source contamination matrix ---------------------------------


def test_x49_crafted_mirror_witness(spark, tmp_path):
    """A mirror source sharing one passage with its origin shows up at
    containment 1000 against it even though the origin is much larger;
    two disjoint sources produce no row at all; shared counts and sizes
    match hand counts."""
    P = " ".join(f"p{i}" for i in range(20))       # 20 words -> 5 windows
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (1, P + " " + uniq("o", 60), "origin"),    # holds P + 60 own words
        (2, P, "mirror"),                          # ONLY the passage
        (3, uniq("d", 40), "disjoint"),            # nothing shared
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tmp = str(tmp_path / "overlap_fixture")
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    out = {
        (r.src_a, r.src_b): r
        for r in QUERIES["x49_overlap_matrix"](spark, tmp).collect()
    }
    assert set(out) == {("mirror", "origin")}  # disjoint never appears
    m = out[("mirror", "origin")]
    assert m.n_windows_b > m.n_windows_a == 5  # mirror: the 5 P-windows
    assert m.shared_windows == 5
    assert m.containment_milli == 1000  # full containment of the mirror


def test_x49_matrix_bounds_and_symmetry_invariants(spark):
    """Fixture sanity: every pair ordered src_a < src_b exactly once,
    shared <= min(side sizes), containment in (0, 1000]."""
    rows = QUERIES["x49_overlap_matrix"](spark, SF_SMOKE).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert 0 < r.shared_windows <= min(r.n_windows_a, r.n_windows_b)
        assert 0 < r.containment_milli <= 1000
        assert r.containment_milli == (
            1000 * r.shared_windows // min(r.n_windows_a, r.n_windows_b)
        )


def test_x49_plan_shape(spark):
    """The matrix is a win-keyed EQUI-join off one barriered distinct
    frame (never a corpus nested loop); size frames attach broadcast;
    no Python, no single-partition funnel."""
    spark.catalog.clearCache()
    a = audit_plan(QUERIES["x49_overlap_matrix"](spark, SF_SMOKE))
    assert not a.has_python_eval
    assert a.nested_loop_joins == 0
    assert a.broadcast_joins >= 2
    assert a.text.count("SinglePartition") == 0
