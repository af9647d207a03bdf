"""Connected-components dedup-group tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cubefs_hadoop_spark.extensions.components import (
    connected_components,
    dedup_keep_list,
)
from cubefs_hadoop_spark.extensions.dedup import x02_minhash_lsh
from tests.conftest import SF_SMOKE


def test_components_on_crafted_graph(spark):
    # two chains {1-2-3}, {10-11}, one isolate implied by absence (99)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "da bigint, db bigint"
    )
    comps = {r.doc_id: r.comp for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_chain_needs_propagation(spark):
    # a long path 0-1-2-...-9 exercises multi-round label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "da bigint, db bigint"
    )
    comps = {r.doc_id: r.comp for r in connected_components(pairs).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 10


def test_dedup_keep_list_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = x02_minhash_lsh(spark, SF_SMOKE)
    kept = dedup_keep_list(docs, pairs)
    comps = connected_components(pairs)
    n_drop = comps.filter(F.col("doc_id") != F.col("comp")).count()
    assert kept.count() == docs.count() - n_drop
    # representatives (min doc_id of each component) are all kept
    reps = {r.comp for r in comps.collect()}
    kept_ids = {r.doc_id for r in kept.collect()}
    assert reps <= kept_ids


def test_star_components_match_propagation_on_crafted_graph(spark):
    from cubefs_hadoop_spark.extensions.components import connected_components_star

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 5), (5, 9)], "da bigint, db bigint"
    )
    star = {r.doc_id: r.comp for r in connected_components_star(pairs).collect()}
    plain = {r.doc_id: r.comp for r in connected_components(pairs).collect()}
    assert star == plain == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 5: 5, 7: 5, 9: 5}


def test_star_components_beat_diameter_bound(spark):
    """A 64-hop chain: plain propagation needs ~64 rounds (raises at
    max_iter=20); large/small-star converges in O(log^2 n) rounds."""
    from cubefs_hadoop_spark.extensions.components import (
        UnconvergedError,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "da bigint, db bigint"
    )
    with pytest.raises(UnconvergedError):
        connected_components(pairs, max_iter=20)
    comps = {r.doc_id: r.comp for r in connected_components_star(pairs, max_iter=15).collect()}
    assert set(comps.values()) == {0} and len(comps) == 64


def test_star_components_on_fixture_pairs(spark):
    from cubefs_hadoop_spark.extensions.components import connected_components_star

    pairs = x02_minhash_lsh(spark, SF_SMOKE)
    star = {r.doc_id: r.comp for r in connected_components_star(pairs).collect()}
    plain = {r.doc_id: r.comp for r in connected_components(pairs).collect()}
    assert star == plain
