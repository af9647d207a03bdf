"""Behavioral tests for the text-scoring/retrieval operators (search.py,
x20/x21) beyond their DuckDB hash oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.extensions.search import bm25_search, unigram_logprob
from cubefs_hadoop_spark.plans.audit import audit_plan
from tests.conftest import SF_SMOKE


def test_unigram_logprob_orders_common_above_rare(spark):
    """A document of corpus-common tokens must outscore a document of
    corpus-unique tokens, and the all-common doc's score is exactly
    ln(count/total) of its (single) token."""
    docs = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "qzx plomb vrill snark"),
            (3, "the the qzx the"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.logprob for r in unigram_logprob(docs).collect()}
    assert out[1] > out[3] > out[2]
    # doc 1: every token is 'the', p = 7/12
    expected = round(round(math.log(7 / 12) * 1000) / 1000.0, 2)
    assert float(out[1]) == expected


def test_unigram_logprob_repartition_stable(spark):
    docs = load(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, unigram_logprob(docs).collect()))
    b = sorted(map(tuple, unigram_logprob(docs.repartition(13)).collect()))
    assert a == b


def test_bm25_ranking_witness(spark):
    """Hand-checkable corpus: the doc with both query terms outranks the
    single-term docs; a doc with no query terms never appears; rarer
    terms carry higher idf."""
    docs = spark.createDataFrame(
        [
            (1, "spark hash a b c d"),
            (2, "spark a b c d e"),
            (3, "hash a b c d e"),
            (4, "a b c d e f"),
            (5, "spark a b c d e"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_search(docs, terms=("spark", "hash"), topk=10).collect()
    ids = [r.doc_id for r in rows]
    assert 4 not in ids
    assert ids[0] == 1  # both terms
    # hash (df=2) is rarer than spark (df=3) -> doc 3 outranks docs 2/5
    assert ids[1] == 3
    scores = {r.doc_id: r.bm25 for r in rows}
    assert scores[2] == scores[5]  # identical texts tie


def test_bm25_topk_and_determinism(spark):
    docs = load(spark, SF_SMOKE, "documents")
    out = bm25_search(docs).collect()
    assert len(out) == 20
    assert all(
        out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1)
    )
    alt = bm25_search(docs.repartition(11)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, alt))


def test_search_plan_shapes(spark):
    """Scale claims on real plans: x21's top-k is TakeOrderedAndProject
    (never a global sort), the posting filter sits against the explode
    (the corpus frame carries only matching postings), and neither
    operator drops to Python."""
    spark.catalog.clearCache()
    docs = load(spark, SF_SMOKE, "documents")

    a20 = audit_plan(unigram_logprob(docs))
    assert "BatchEvalPython" not in a20.text
    assert a20.nested_loop_joins == 1  # the 1-row total-count broadcast

    a21 = audit_plan(bm25_search(docs))
    assert "TakeOrderedAndProject" in a21.text
    assert "BatchEvalPython" not in a21.text


def test_bm25_filter_is_at_the_explode(spark):
    """The posting list must be filtered to the query terms before the
    first aggregation — shuffled bytes are O(matching postings)."""
    docs = load(spark, SF_SMOKE, "documents")
    plan = bm25_search(docs)._jdf.queryExecution().executedPlan().toString()
    gen = plan.find("Generate explode")
    assert gen != -1
    # a Filter on the exploded word column exists downstream of the
    # generate (upstream in the printed tree = smaller index)
    filt = plan.rfind("Filter", 0, gen)
    assert filt != -1 and "word" in plan[filt:gen]


def test_dsir_weights_rank_in_domain_documents_higher(spark):
    """x33 witness on a crafted corpus: documents made of target-domain
    vocabulary get strictly higher importance weights than documents of
    out-of-domain vocabulary; shared-vocabulary docs sit between; add-one
    smoothing keeps target-unseen words finite (never null/NaN)."""
    from cubefs_hadoop_spark.extensions.search import dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "en"),    # pure target vocab
            (2, "gamma delta gamma delta", "fr"),  # pure out-of-domain
            (3, "alpha beta gamma delta", "fr"),   # mixed
            (4, "epsilon epsilon epsilon epsilon", "fr"),  # target-unseen
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r.doc_id: (r.tokens, r.weight_milli)
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert all(t == 4 and w is not None for t, w in out.values())
    w = {d: wm for d, (_t, wm) in out.items()}
    assert w[1] > w[3] > w[2]  # in-domain > mixed > out-of-domain
    # per-token ratios are word-level constants: doc3 holds exactly half
    # of doc1's and half of doc2's token multiset
    assert w[3] * 2 == w[1] + w[2]


def test_dsir_state_folds_are_exactly_additive(spark):
    """x33b witness: LM state built from part of the corpus and folded in
    two separate batches scores every document identically to the
    one-shot vocabulary — unigram counts are associative."""
    import tempfile

    from cubefs_hadoop_spark.extensions.search import (
        dsir_score,
        dsir_state_build,
        dsir_state_fold,
        dsir_vocab,
        dsir_weights,
    )

    docs = load(spark, SF_SMOKE, "documents")
    tgt = F.col("lang") == "en"
    idx = tempfile.mkdtemp(prefix="dsir_prop_") + "/vocab"
    dsir_state_build(docs.filter(F.col("doc_id") < 150), tgt, idx)
    mid = dsir_state_fold(
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)),
        tgt,
        idx,
    )
    mid.write.mode("overwrite").parquet(idx + "2")
    vocab = dsir_state_fold(docs.filter(F.col("doc_id") >= 300), tgt, idx + "2")
    got = {
        r.doc_id: (r.tokens, r.weight_milli)
        for r in dsir_score(docs, vocab).collect()
    }
    want = {
        r.doc_id: (r.tokens, r.weight_milli)
        for r in dsir_weights(docs, tgt).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# x40 bigram-LM fluency score


def _bigram_ref(train_texts, score_rows):
    """Hand-rolled add-one bigram LM — exact integer-milli replica."""
    import collections
    import math

    bc: collections.Counter = collections.Counter()
    vocab = set()
    for t in train_texts:
        ws = t.split(" ")
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] += 1
    cu: collections.Counter = collections.Counter()
    for (a, _), c in bc.items():
        cu[a] += c
    v = len(vocab)

    def milli(x):
        s = -1 if x < 0 else 1
        return s * math.floor(abs(x) * 1000 + 0.5)

    out = {}
    for doc_id, t in score_rows:
        ws = t.split(" ")
        if len(ws) < 2:
            continue
        lps = [
            milli(math.log((bc[(a, b)] + 1.0) / (cu[a] + v)))
            for a, b in zip(ws, ws[1:])
        ]
        mean = sum(lps) / len(lps) / 1000.0
        # r2d-compatible half-away-from-zero at 2 dp (Python round() is
        # half-even and diverges on exact .xx5 midpoints)
        s = -1 if mean < 0 else 1
        out[doc_id] = (len(lps), s * math.floor(abs(mean) * 100 + 0.5) / 100)
    return out


def test_bigram_lm_matches_exact_reference(spark):
    """Spark's integer-milli bigram scores equal the pure-Python exact
    model on a crafted corpus (seen, partially seen, and fully
    out-of-vocabulary documents)."""
    from cubefs_hadoop_spark.extensions.search import bigram_lm_score

    rows = [
        (1, "the quick fox jumps", "en"),
        (2, "the quick fox sleeps", "en"),
        (3, "quick the fox the", "de"),     # scrambled-ish, not in train
        (4, "zz yy xx", "de"),              # fully OOV
        (5, "one", "de"),                   # single word: no transitions
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.transitions, float(r.bigram_lp))
        for r in bigram_lm_score(df, F.col("lang") == "en").collect()
    }
    want = _bigram_ref(
        [t for _, t, l in rows if l == "en"],
        [(i, t) for i, t, _ in rows],
    )
    assert got == want
    assert 5 not in got  # no transitions -> absent, like the SQL twin


def test_bigram_lm_scores_word_order(spark):
    """The defining property vs x20/x33: a document with the SAME word
    multiset as fluent in-domain text but scrambled order scores
    strictly lower."""
    from cubefs_hadoop_spark.extensions.search import bigram_lm_score

    fluent = "the quick fox jumps over the lazy dog"
    scrambled = "dog the over jumps lazy fox quick the"
    rows = [
        (1, fluent, "en"),
        (2, fluent, "en"),  # reinforce the bigrams
        (3, fluent, "xx"),  # scored copy outside the train slice
        (4, scrambled, "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: float(r.bigram_lp)
        for r in bigram_lm_score(df, F.col("lang") == "en").collect()
    }
    assert got[3] > got[4]


def test_bigram_lm_fixture_sanity_and_determinism(spark):
    """On the real corpus: every doc with >=2 words is scored, scores are
    negative (log-probs), and a repartitioned run hashes identically."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.search import bigram_lm_score

    docs = load(spark, SF_SMOKE, "documents")
    tgt = F.col("lang") == "en"
    base = bigram_lm_score(docs, tgt).collect()
    n_docs = docs.where(F.size(F.split("text", " ")) >= 2).count()
    assert len(base) == n_docs
    assert all(float(r.bigram_lp) < 0 for r in base)
    again = bigram_lm_score(docs.repartition(13), tgt).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))


def test_bigram_lm_plan_shape(spark):
    """x40's scale shape: no Python anywhere, the ONLY nested-loop join
    is the broadcast V-scalar crossJoin, model joins are hash
    equi-joins (never corpus-pairwise), and the corpus scans read only
    doc_id/text/lang."""
    import re

    from cubefs_hadoop_spark.extensions.search import bigram_lm_score

    spark.catalog.clearCache()
    docs = load(spark, SF_SMOKE, "documents")
    a = audit_plan(bigram_lm_score(docs, F.col("lang") == "en"))
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    assert a.nested_loop_joins == 1  # the 1-row V broadcast only
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", a.text):
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"doc_id", "text", "lang"}, cols


# ---------------------------------------------------------------------------
# x62 quality-filter agreement matrix


def test_filter_agreement_laws_and_crafted_overlap(spark):
    """x62 invariants: intersection bounded by both drop counts, union =
    a + b - both, jaccard = 1000*both//union; and a crafted corpus where
    the overlaps are hand-computable comes out exactly."""
    from cubefs_hadoop_spark.extensions.text import (
        filter_agreement,
        filter_drop_flags,
    )
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["x62_filter_agreement"](spark, SF_SMOKE).collect()
    assert len(rows) == 3
    assert [(r.filter_a, r.filter_b) for r in rows] == [
        ("quality", "repetition"),
        ("quality", "stopword"),
        ("repetition", "stopword"),
    ]
    for r in rows:
        assert r.drop_both <= min(r.drop_a, r.drop_b)
        assert r.drop_union == r.drop_a + r.drop_b - r.drop_both
        if r.drop_union:
            assert r.jaccard_milli == 1000 * r.drop_both // r.drop_union
        else:
            assert r.jaccard_milli is None
    # totals reconcile with the flag pass
    flags = filter_drop_flags(load(spark, SF_SMOKE, "documents")).collect()
    assert rows[0].drop_a == sum(1 for f in flags if f.dq)
    assert rows[2].drop_a == sum(1 for f in flags if f.dr)
    assert rows[2].drop_b == sum(1 for f in flags if f.ds)

    # crafted: doc A = 3-word salad (quality: words<20 -> drop; stopword:
    # 0 ratio -> drop; repetition: 1 distinct 3-gram of 1 -> keep);
    # doc B = the same word 30x (quality drop via uniq, stopword drop,
    # repetition drop); doc C = 40 distinct words with stopwords (all keep)
    texts = [
        ("xx yy zz",),
        (("w " * 30).strip(),),
        (" ".join(f"the w{i}" for i in range(20)),),
    ]
    df = spark.createDataFrame(texts, "text string")
    m = {
        (r.filter_a, r.filter_b): r for r in filter_agreement(df).collect()
    }
    qr = m[("quality", "repetition")]
    assert (qr.drop_a, qr.drop_b, qr.drop_both) == (2, 1, 1)
    qs = m[("quality", "stopword")]
    assert (qs.drop_a, qs.drop_b, qs.drop_both) == (2, 2, 2)
    assert qs.jaccard_milli == 1000


def test_filter_drop_flags_respects_text_col(spark):
    """ADVICE r9: the repetition 3-gram flag must be computed from
    text_col, not a hardcoded `text` column — a renamed column gives
    the identical flag rows."""
    from cubefs_hadoop_spark.extensions.text import filter_drop_flags
    from cubefs_hadoop_spark.catalog import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    base = filter_drop_flags(docs).collect()
    renamed = filter_drop_flags(
        docs.withColumnRenamed("text", "body"), text_col="body"
    ).collect()
    assert base == renamed


def test_x63_rejection_funnel_first_gate_attribution(spark):
    """Crafted corpus where each document's FIRST failing gate is known:
    the 3-word salad and the 30x-repeat both fail quality (charged there,
    never to later gates they also fail); a 40-word stopword-free text
    passes quality but fails the stopword floor; a healthy text is kept."""
    from cubefs_hadoop_spark.extensions.text import rejection_funnel

    healthy = " ".join(f"the w{i}" for i in range(20))
    no_stop = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            ("s1", "xx yy zz"),            # quality (words < 20)
            ("s1", ("w " * 30).strip()),   # quality (uniq ratio)
            ("s1", no_stop),               # stopword (passes quality)
            ("s2", healthy),               # kept
        ],
        "source string, text string",
    )
    rows = {(r.source, r.stage): r for r in rejection_funnel(docs).collect()}
    assert rows[("s1", "quality")].n_docs == 2
    assert rows[("s1", "stopword")].n_docs == 1
    assert ("s1", "repetition") not in rows   # charged to quality first
    assert rows[("s2", "kept")].n_docs == 1
    assert rows[("s1", "quality")].share_milli == 1000 * 2 // 3
    assert rows[("s2", "kept")].share_milli == 1000


def test_x63_funnel_reconciles_with_x62_flags(spark):
    """Funnel totals per source sum to the source size, and the corpus
    'quality' charge equals x62's dq drop count (quality is the first
    gate, so attribution == its raw drop set)."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.text import (
        filter_drop_flags,
        rejection_funnel,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    rows = rejection_funnel(docs).collect()
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + r.n_docs
    sizes = {
        r.source: r.c
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    assert per_source == sizes
    flags = filter_drop_flags(docs).collect()
    assert sum(r.n_docs for r in rows if r.stage == "quality") == sum(
        1 for f in flags if f.dq
    )


def test_x68_langid_confusion_crafted_and_und(spark):
    """Crafted docs: clear English, clear German, stopword-free -> und;
    the es/fr shared-stopword tie breaks to 'es' (dict order)."""
    from cubefs_hadoop_spark.extensions.text import langid_confusion

    docs = spark.createDataFrame(
        [
            ("en", "the cat of the house and a dog to go"),
            ("en", "der hund und die katze das haus zu"),   # mislabeled
            ("de", "der die das und zu"),
            ("xx", "word1 word2 word3"),                    # und
            ("es", "la de que y el"),                       # es stopwords
        ],
        "lang string, text string",
    )
    m = {(r.lang, r.lang_pred): r.n_docs for r in
         langid_confusion(docs).collect()}
    assert m[("en", "en")] == 1
    assert m[("en", "de")] == 1
    assert m[("de", "de")] == 1
    assert m[("xx", "und")] == 1
    assert m[("es", "es")] == 1


def test_x68_shares_and_langid_agreement(spark):
    """Fixture shares are exact integer millis within each declared tag,
    and the confusion diagonal reconciles with langid_scores' own
    per-document predictions."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.text import (
        langid_confusion,
        langid_scores,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    rows = langid_confusion(docs).collect()
    tot = {}
    for r in rows:
        tot[r.lang] = tot.get(r.lang, 0) + r.n_docs
    for r in rows:
        assert r.share_milli == 1000 * r.n_docs // tot[r.lang]
    pred = langid_scores(docs).select("lang", "lang_pred").collect()
    agree = sum(1 for p in pred if p.lang == p.lang_pred)
    assert sum(r.n_docs for r in rows if r.lang == r.lang_pred) == agree


def test_x63_null_source_normalizes(spark):
    """A NULL source tag lands in the '(null)' group instead of
    silently diverging between Spark's window and the oracle's join
    (r10 self-review fix)."""
    from cubefs_hadoop_spark.extensions.text import rejection_funnel

    docs = spark.createDataFrame(
        [(None, " ".join(f"the w{i}" for i in range(20))),
         ("s1", "xx yy zz")],
        "source string, text string",
    )
    rows = {(r.source, r.stage): r.n_docs
            for r in rejection_funnel(docs).collect()}
    assert rows[("(null)", "kept")] == 1
    assert rows[("s1", "quality")] == 1
