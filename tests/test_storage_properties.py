"""Property-based storage-contract test (hypothesis): random sequences of
write/append/rename/drop against the Engine must agree with a trivial
in-memory model of the warehouse.  This is the generative superset of the
reference's 9 hand-written behaviors (CubeFileSystemTest.java:10-246)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import (
    TableAlreadyExistsError,
    TableNotFoundError,
)

NAMES = ("t1", "t2", "t3")

op = st.one_of(
    st.tuples(st.just("write"), st.sampled_from(NAMES), st.integers(1, 5)),
    st.tuples(st.just("overwrite"), st.sampled_from(NAMES), st.integers(1, 5)),
    st.tuples(st.just("append"), st.sampled_from(NAMES), st.integers(1, 5)),
    st.tuples(st.just("drop"), st.sampled_from(NAMES), st.just(0)),
    st.tuples(
        st.just("rename"), st.sampled_from(NAMES), st.sampled_from(NAMES)
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op, min_size=1, max_size=7))
def test_engine_agrees_with_model(spark, tmp_path_factory, ops):
    wh = str(tmp_path_factory.mktemp("prop_wh"))
    eng = Engine(spark, wh)
    model: dict[str, int] = {}  # name -> row count

    def mk(n):
        return spark.range(n).selectExpr("id", "id * 2 AS v")

    for kind, a, b in ops:
        if kind == "write":
            if a in model:
                with pytest.raises(TableAlreadyExistsError):
                    eng.write_table(mk(b), a)
            else:
                eng.write_table(mk(b), a)
                model[a] = b
        elif kind == "overwrite":
            eng.write_table(mk(b), a, mode="overwrite")
            model[a] = b
        elif kind == "append":
            if a in model:
                eng.append(mk(b), a)
                model[a] += b
            else:
                eng.append(mk(b), a)  # append creates, like mode('append')
                model[a] = b
        elif kind == "drop":
            if a in model:
                eng.drop_table(a)
                del model[a]
            else:
                with pytest.raises(TableNotFoundError):
                    eng.drop_table(a)
        elif kind == "rename":
            if a not in model:
                with pytest.raises(TableNotFoundError):
                    eng.rename_table(a, b)
            elif b in model:  # includes a == b: dst exists -> False
                assert eng.rename_table(a, b) is False
            else:
                assert eng.rename_table(a, b) is True
                model[b] = model.pop(a)

    assert eng.list_tables() == sorted(model)
    for name, rows in model.items():
        assert eng.table(name).count() == rows
        assert eng.is_committed(name)
