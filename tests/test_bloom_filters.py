"""Parquet bloom-filter writing on versioned commits — the skipping tier
[min, max] stats cannot provide.  A point lookup on a high-cardinality
column whose values interleave across files passes every min/max check;
the parquet reader's row-group bloom probe skips the group without
touching a data page.  Write-side cost ~1 byte/row; read-side skipping is
parquet-native (Spark's pushed-down equality filters probe blooms
automatically), so it works unchanged on a 1000-executor cluster."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _docs(spark, n=50000):
    # uuid-ish high-cardinality string ids: min/max spans everything,
    # so stats-based pruning is useless here by construction
    return spark.range(n).selectExpr(
        "md5(CAST(id AS STRING)) AS doc_id", "id AS v"
    )


def _data_bytes(eng, name):
    path = eng._table_path(name)
    m = versioning.read_manifest(path, versioning.current_version(path))
    sizes = {rel: s for rel, s, _m in eng.fs.walk_files(path)}
    return sum(sizes[f] for f in m["files"])


def test_bloom_columns_grow_the_footer(eng, spark):
    df = _docs(spark).coalesce(1)
    eng.write_table_version(df, "plainw")
    eng.write_table_version(df, "bloomw", bloom_cols=["doc_id"])
    plain, bloom = _data_bytes(eng, "plainw"), _data_bytes(eng, "bloomw")
    # the serialized bloom bitset is real bytes in the file footer
    # (~1 byte/row at the default FPP); same data otherwise
    assert bloom > plain + 10_000
    # and reads through the manifest are unaffected
    assert eng.read_version("bloomw").count() == 50000


def test_bloom_point_lookup_correct(eng, spark):
    eng.write_table_version(
        _docs(spark), "t", bloom_cols=["doc_id"]
    )
    probe = spark.sql("SELECT md5('123') AS k").collect()[0].k
    hit = eng.read_version("t").filter(f"doc_id = '{probe}'").collect()
    assert len(hit) == 1 and hit[0].v == 123
    miss = eng.read_version("t").filter("doc_id = 'nope'").count()
    assert miss == 0


def test_bloom_via_session_conf_default(eng, spark):
    spark.conf.set("cfspark.write.bloom.columns", "doc_id")
    try:
        df = _docs(spark).coalesce(1)
        eng.write_table_version(df, "conf_bloom")
        eng.write_table_version(df, "explicit", bloom_cols=["doc_id"])
        # conf-driven write carries the same bloom bytes as the explicit one
        assert (
            abs(_data_bytes(eng, "conf_bloom") - _data_bytes(eng, "explicit"))
            < 2_000
        )
    finally:
        spark.conf.unset("cfspark.write.bloom.columns")


def test_bloom_unknown_column_refused(eng, spark):
    with pytest.raises(EngineIOError, match="bloom"):
        eng.write_table_version(
            _docs(spark), "t", bloom_cols=["nope"]
        )
