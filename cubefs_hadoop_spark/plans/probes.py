"""Plan probes for the audit family (VERDICT r13 #5).

The audit-family queries (x61 lsh_quality_audit, x71 banding_planner,
x75 lsh_preflight, x97 funnel_rates, ...) compute their scale-path
work in construction-time actions and return a driver-sized literal
frame — so ``tools/plan_report.py`` auditing the RETURNED frame reads
0 joins / 0 shuffles / 0 scan cols while the query costs seconds, and
a regression inside the candidate/truth pipelines would never trip a
plan gate.

Each probe here rebuilds the query's INTERNAL scale-path frames — the
ones the eager actions consume — and returns them by label, so the
plan report and the plan-quality tests can audit the real pipelines.
Probes run with ``cfspark.barriers.disabled=true`` (see
``plans.materialize.barrier``) so lineage cuts don't hide the upstream
operators from explain; semantics are identical, only the execution
strategy differs, and the probed frames are sample-bounded anyway.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# query name -> callable(spark, sf_dir) -> {frame_label: DataFrame}
PLAN_PROBES: Dict[
    str, Callable[[SparkSession, str], Dict[str, DataFrame]]
] = {}


def probe(name: str):
    def deco(fn):
        PLAN_PROBES[name] = fn
        return fn

    return deco


@contextmanager
def barriers_disabled(spark: SparkSession):
    """Scope within which ``plans.materialize.barrier`` is an identity —
    probed frames expose their full pipeline to the plan audit."""
    prev = spark.conf.get("cfspark.barriers.disabled", "false")
    spark.conf.set("cfspark.barriers.disabled", "true")
    try:
        yield
    finally:
        spark.conf.set("cfspark.barriers.disabled", prev)


def _sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.dedup import _X61_S

    return load(spark, sf_dir, "documents").filter(F.col("doc_id") < _X61_S)


@probe("x61_lsh_quality_audit")
def _x61_frames(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """The two pair pipelines x61's counts consume: the LSH banding
    candidates and the exact-Jaccard inverted-index truth."""
    from cubefs_hadoop_spark.extensions.dedup import (
        exact_shingle_jaccard_pairs,
        lsh_candidate_pairs,
    )

    sample = _sample_docs(spark, sf_dir)
    return {
        "candidates": lsh_candidate_pairs(sample).select("da", "db"),
        "truth": exact_shingle_jaccard_pairs(sample),
    }


@probe("x71_banding_planner")
def _x71_frames(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """The scored inverted-index join whose single-pass aggregate
    evaluates every banding config's S-curve."""
    from cubefs_hadoop_spark.extensions.dedup import _exact_jaccard_scored

    return {"scored": _exact_jaccard_scored(_sample_docs(spark, sf_dir))}


@probe("x75_lsh_preflight")
def _x75_frames(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """The ONE shared exact-Jaccard frame plus the LSH candidate side —
    together the whole construction-time cost of the preflight."""
    from cubefs_hadoop_spark.extensions.dedup import (
        _exact_jaccard_scored,
        lsh_candidate_pairs,
    )

    sample = _sample_docs(spark, sf_dir)
    return {
        "scored": _exact_jaccard_scored(sample),
        "candidates": lsh_candidate_pairs(sample).select("da", "db"),
    }


@probe("x97_funnel_rates")
def _x97_frames(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """The per-user funnel frame (the scale path) whose step counts the
    3-row literal rollup collects."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.behavior import funnel

    return {"per_user_funnel": funnel(load(spark, sf_dir, "events"))}


@probe("x62_filter_agreement")
def _x62_frames(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """The per-doc drop-flag scan whose one-row count aggregate feeds
    x62's literal agreement matrix."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.text import filter_drop_flags

    return {"drop_flags": filter_drop_flags(load(spark, sf_dir, "documents"))}
