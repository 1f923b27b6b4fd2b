"""Property-based semantics tests (SURVEY §5): the distributed operators
must agree with an obviously-correct single-process reference
implementation on arbitrary small inputs — partitioning, ordering, and
tie-breaking must not leak into results."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from ucr_bigdata_snowfallproject_spark.operators import asof as asof_ops
from ucr_bigdata_snowfallproject_spark.operators import skew
from ucr_bigdata_snowfallproject_spark.operators.windows import sessionize

T0 = datetime.datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # key
        st.integers(min_value=0, max_value=50_000),     # offset seconds
    ),
    min_size=1,
    max_size=30,
)


@given(rows=events_strategy, gap=st.integers(min_value=60, max_value=7200))
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, rows, gap):
    # unique (key, ts) so ordering is total without tiebreakers
    uniq = sorted({(k, s) for k, s in rows})
    data = [(k, T0 + datetime.timedelta(seconds=s)) for k, s in uniq]
    df = spark.createDataFrame(data, "k long, ts timestamp")
    got = {
        (r.k, r.ts): r.session_id
        for r in sessionize(df, ["k"], "ts", gap_seconds=gap).collect()
    }

    expected = {}
    for k in {k for k, _ in uniq}:
        sid, prev = 0, None
        for _, s in [(kk, ss) for kk, ss in uniq if kk == k]:
            if prev is None or s - prev > gap:
                sid += 1
            expected[(k, T0 + datetime.timedelta(seconds=s))] = sid
            prev = s
    assert got == expected


@given(
    left=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 10_000)),
                  min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 10_000)),
                   min_size=0, max_size=15),
)
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, left, right):
    luniq = sorted({(k, s) for k, s in left})
    runiq = sorted({(k, s) for k, s in right})
    ldf = spark.createDataFrame(
        [(i, k, T0 + datetime.timedelta(seconds=s)) for i, (k, s) in enumerate(luniq)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, T0 + datetime.timedelta(seconds=s), float(s)) for k, s in runiq],
        "k long, ts timestamp, v double",
    )
    out = asof_ops.asof_join(ldf, rdf, keys=["k"], left_ts="ts", right_ts="ts",
                             right_values=["v"])
    got = {r.lid: r.v for r in out.collect()}

    for i, (k, s) in enumerate(luniq):
        candidates = [rs for rk, rs in runiq if rk == k and rs <= s]
        expected = float(max(candidates)) if candidates else None
        assert got[i] == expected, (i, k, s)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(-1000, 1000)),
        min_size=1, max_size=40,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_salted_group_agg_matches_reference(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k string, x long")
    out = skew.salted_group_agg(
        df, ["k"],
        [("x", "sum", "s"), ("x", "count", "c"), ("x", "min", "lo"), ("x", "max", "hi")],
        n_salts=n_salts,
    )
    got = {r.k: (r.s, r.c, r.lo, r.hi) for r in out.collect()}
    for k in {k for k, _ in rows}:
        xs = [x for kk, x in rows if kk == k]
        assert got[k] == (sum(xs), len(xs), min(xs), max(xs))
