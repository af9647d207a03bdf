"""Property test of the file-skipping decision (versioning.prune_files):
for ANY table contents and ANY predicate set, a file holding at least one
matching row must survive the prune — the safety half of data skipping.
(Pure Python: no Spark session, so hypothesis can hammer thousands of
cases in seconds.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cubefs_hadoop_spark.versioning import prune_files

_OPS = ["<", "<=", ">", ">=", "="]


def _matches(v: int, op: str, val: int) -> bool:
    return {
        "<": v < val,
        "<=": v <= val,
        ">": v > val,
        ">=": v >= val,
        "=": v == val,
    }[op]


@st.composite
def _table_and_preds(draw):
    n_files = draw(st.integers(1, 6))
    files = {}
    for i in range(n_files):
        rows = draw(
            st.lists(st.integers(-50, 50), min_size=0, max_size=8)
        )
        files[f"data/s/part-{i}.parquet"] = rows
    preds = draw(
        st.lists(
            st.tuples(
                st.just("x"),
                st.sampled_from(_OPS),
                st.integers(-60, 60),
            ),
            min_size=1,
            max_size=3,
        )
    )
    # some files carry no stats (commits without stats_cols)
    statted = draw(
        st.sets(st.sampled_from(sorted(files)), max_size=n_files)
    )
    return files, preds, statted


@given(_table_and_preds())
@settings(max_examples=500, deadline=None)
def test_prune_never_drops_a_matching_file(case):
    files, preds, statted = case
    manifest = {
        "files": sorted(files),
        "stats": {
            f: {"x": [min(rows), max(rows)] if rows else [None, None]}
            for f, rows in files.items()
            if f in statted
        },
    }
    kept = set(prune_files(manifest, preds))
    for f, rows in files.items():
        has_match = any(
            all(_matches(v, op, val) for _c, op, val in preds)
            for v in rows
        )
        if has_match:
            assert f in kept, (f, rows, preds, manifest["stats"].get(f))
        if f not in statted:
            assert f in kept  # un-statted files are always conservative
