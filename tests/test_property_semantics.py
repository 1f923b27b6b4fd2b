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


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abcdefghij XYZ.@-()0123456789+\n,")
            ),
            min_size=0, max_size=60,
        ),
        min_size=1, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_redact_pii_idempotent(spark, texts):
    """Redaction is a fixpoint: applying it to already-redacted text
    changes nothing (placeholders must not themselves look like PII), on
    arbitrary digit/@/punctuation soup."""
    from pyspark.sql import functions as F

    from ucr_bigdata_snowfallproject_spark.operators.text import redact_pii

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    once = df.select("i", redact_pii("t").alias("r1"))
    twice = once.select("i", redact_pii(F.col("r1")).alias("r2"))
    joined = once.join(twice, "i")
    assert joined.filter(F.col("r1") != F.col("r2")).count() == 0


@given(
    values=st.lists(st.integers(0, 500), min_size=1, max_size=40),
    lo=st.sampled_from([0.0, 0.05, 0.1, 0.25]),
    hi=st.sampled_from([0.75, 0.9, 0.95, 1.0]),
)
@settings(**_SETTINGS)
def test_length_band_filter_matches_reference(spark, values, lo, hi):
    """Exact rank-band filter == slicing the (value, id)-sorted list by the
    same floor arithmetic, for arbitrary duplicates and fractions."""
    from ucr_bigdata_snowfallproject_spark.operators.text import length_band_filter

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = sorted((r.id, r.v) for r in length_band_filter(df, "v", "id", lo, hi).collect())
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(rows)
    start = int(n * lo)                  # rows dropped at the low end
    end = n - int(n * (1.0 - hi))        # last kept 1-based rank
    expected = sorted(ordered[start:end])
    assert got == expected


@given(
    values=st.lists(st.integers(0, 100), min_size=1, max_size=30),
    prob=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
@settings(**_SETTINGS)
def test_group_quantiles_matches_numpy(spark, values, prob):
    """Spark's exact `percentile` == numpy's linear-interpolation
    percentile for arbitrary integer multisets — the same convention the
    DuckDB quantile_cont oracle pins at fixture scale."""
    import math

    import numpy as np

    from ucr_bigdata_snowfallproject_spark.operators.aggregates import group_quantiles

    df = spark.createDataFrame([("g", v) for v in values], "g string, x long")
    row = group_quantiles(df, ["g"], "x", (prob,)).collect()[0]
    got = row[1]
    expected = float(np.percentile(np.array(values, dtype="float64"), prob * 100,
                                   method="linear"))
    assert math.isclose(got, expected, rel_tol=0, abs_tol=1e-9), (got, expected)


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # shard
            st.integers(min_value=1, max_value=300),     # n_tokens
        ),
        min_size=1,
        max_size=25,
    ),
    context=st.sampled_from([16, 64, 257]),
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_reference(spark, docs, context):
    """Placement manifest ≡ a driver-side greedy concat replay for random
    shard/token-count mixes and non-power-of-two context lengths."""
    from ucr_bigdata_snowfallproject_spark.operators import curation as cur
    from pyspark.sql import functions as F

    rows = [(i, f"s{shard}", n) for i, (shard, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, shard_in string, n long")
    got = {
        r.doc_id: (r.start_token, r.seq_first, r.seq_last, r.offset_in_seq)
        for r in cur.pack_sequences(
            df, "doc_id", F.col("n"), context, shard_col="shard_in"
        ).collect()
    }
    cums: dict = {}
    for i, (shard, n) in enumerate(docs):
        start = cums.get(shard, 0)
        end = start + n
        assert got[i] == (start, start // context, (end - 1) // context, start % context)
        cums[shard] = end


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_cdc_chunks_matches_reference(spark, texts):
    """CDC chunk table ≡ a driver-side replay of the boundary rule
    (md5-prefix mod) over arbitrary near-degenerate texts."""
    import hashlib

    from ucr_bigdata_snowfallproject_spark.operators import dedup as dedup_ops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.fingerprint)
        for r in dedup_ops.cdc_chunks(df, "doc_id", "text", boundary_mod=4).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in __import__("re").split(r"\s+", t.strip().lower()) if w != ""]
        chunk_id, chunks = 0, {}
        for w in toks:
            if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 4 == 0:
                chunk_id += 1
            chunks.setdefault(chunk_id, []).append(w)
        for cid, ws in chunks.items():
            want[(i, cid)] = (
                len(ws),
                hashlib.md5(" ".join(ws).encode()).hexdigest(),
            )
    assert got == want


funnel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),          # user
        st.integers(min_value=0, max_value=1000),       # offset seconds
        st.sampled_from(["a", "b", "c", "x"]),          # event type
    ),
    min_size=1,
    max_size=40,
)


@given(rows=funnel_strategy)
@settings(**_SETTINGS)
def test_funnel_counts_matches_reference(spark, rows):
    """funnel_counts vs a driver-side reference: per user, greedily chase
    the earliest step-k event strictly after the step-(k-1) anchor."""
    from ucr_bigdata_snowfallproject_spark.operators.windows import funnel_counts

    uniq = sorted({(u, s, t) for u, s, t in rows})
    data = [(u, T0 + datetime.timedelta(seconds=s), t) for u, s, t in uniq]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, event_type string")
    steps = ["a", "b", "c"]

    def ref_depth(user_events):
        depth, anchor = 0, None
        for step in steps:
            cands = [ts for ts, t in user_events
                     if t == step and (anchor is None or ts > anchor)]
            if not cands:
                break
            anchor = min(cands)
            depth += 1
        return depth

    by_user: dict = {}
    for u, ts, t in data:
        by_user.setdefault(u, []).append((ts, t))
    want = {
        i: sum(1 for ev in by_user.values() if ref_depth(ev) > i)
        for i in range(len(steps))
    }
    got = {
        r.step_idx: r.n_users
        for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert got == want
    # depth counts never increase
    assert got[0] >= got[1] >= got[2]


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),      # key
            st.integers(min_value=-500, max_value=500), # cents
        ),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_additive_merge_batching_invariance(spark, tmp_path_factory, vals, split):
    """merge_additive_agg: ANY batching of history converges to the
    one-shot aggregate exactly — integer addition is associative, so the
    rollup table is independent of how batches were cut."""
    from pyspark.sql import functions as F

    from ucr_bigdata_snowfallproject_spark import table as T

    rows = [(i, k, c) for i, (k, c) in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, k long, cents long")
    want = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).collect()
    }

    root = str(tmp_path_factory.mktemp("rollup") / "t")
    batches = [df.filter(F.col("i") % split == j) for j in range(split)]

    def delta(b):
        return b.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        )

    T.create_partitioned_snapshot(delta(batches[0]), root, "k", n_buckets=4)
    for b in batches[1:]:
        d = delta(b)
        if d.isEmpty():
            continue
        T.merge_additive_agg(spark, root, d, "k", ["n", "s"])
    got = {(r.k, r.n, r.s) for r in T.read_snapshot(spark, root).collect()}
    assert got == want


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),     # group
            st.integers(min_value=0, max_value=100),   # x
            st.integers(min_value=-50, max_value=50),  # y
        ),
        min_size=2,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_group_ols_matches_numpy(spark, pts):
    """Closed-form per-group OLS == numpy.polyfit for arbitrary integer
    point sets (degenerate single-distinct-x groups yield NULL slope)."""
    import math

    import numpy as np

    from ucr_bigdata_snowfallproject_spark.operators import aggregates
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pts, "g int, x long, y long")
    got = {
        r.g: (r.slope, r.intercept, r.r2)
        for r in aggregates.group_ols(df, ["g"], F.col("x"), F.col("y")).collect()
    }
    for g in {p[0] for p in pts}:
        xs = np.array([p[1] for p in pts if p[0] == g], dtype="float64")
        ys = np.array([p[2] for p in pts if p[0] == g], dtype="float64")
        slope, intercept, r2 = got[g]
        if len(set(xs)) < 2:
            assert slope is None and intercept is None and r2 is None
            continue
        m, b = np.polyfit(xs, ys, 1)
        assert math.isclose(slope, m, rel_tol=0, abs_tol=5e-6), (g, slope, m)
        assert math.isclose(intercept, b, rel_tol=1e-6, abs_tol=5e-6)
        if len(set(ys.tolist())) < 2:
            assert r2 is None
        else:
            expected_r2 = float(np.corrcoef(xs, ys)[0, 1] ** 2)
            assert math.isclose(r2, expected_r2, rel_tol=0, abs_tol=5e-6)


@given(
    lpts=st.lists(
        st.tuples(st.floats(-59.9, 59.9), st.floats(-179.9, 179.9)),
        min_size=1, max_size=12,
    ),
    rpts=st.lists(
        st.tuples(st.floats(-59.9, 59.9), st.floats(-179.9, 179.9)),
        min_size=1, max_size=12,
    ),
    radius=st.sampled_from([500.0, 2500.0, 6000.0]),
    k=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_geo_nearest_join_matches_naive(spark, lpts, rpts, radius, k):
    """Grid-blocked bounded-radius NN join == the naive all-pairs form for
    arbitrary points (incl. date-line-adjacent longitudes) — the cell ring
    must cover the radius exactly, never duplicate a pair."""
    import math

    from ucr_bigdata_snowfallproject_spark.operators import geo

    left = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(lpts)], "lid long, lat double, lon double"
    )
    right = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(rpts)], "rid long, lat double, lon double"
    )
    got = sorted(
        (r.lid, r.rid, r.rank)
        for r in geo.geo_nearest_join(
            left, right, "lid", "rid", radius_km=radius, k=k, max_abs_lat=60.0
        ).collect()
    )

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[0], p[1], q[0], q[1]))
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    expected = []
    for i, p in enumerate(lpts):
        # ranking key mirrors the operator: distance ROUNDED to the output
        # grid (3 digits) then id — on raw doubles the order is
        # implementation-defined for sub-ulp distance differences (the
        # falsifying example was two right points 2e-16° apart)
        cands = sorted(
            (round(hav(p, q), 3), j)
            for j, q in enumerate(rpts)
            if hav(p, q) <= radius
        )
        expected += [(i, j, r + 1) for r, (_, j) in enumerate(cands[:k])]
    assert got == sorted(expected)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1, max_size=25,
    ),
    n_iter=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_pagerank_matches_integer_reference(spark, edges, n_iter):
    """Quantized PageRank == a pure-Python replay of the same integer
    recurrence, EXACTLY (bit-for-bit) — the property that makes an
    iterative graph algorithm oracle-hashable. Multi-edges, self-loops,
    and dangling nodes all drawn at random."""
    from ucr_bigdata_snowfallproject_spark.operators import graph

    df = spark.createDataFrame(edges, "s long, d long")
    got = {
        r.node: r.rank_fix
        for r in graph.pagerank(df, "s", "d", n_iter=n_iter).collect()
    }

    SCALE = 10**12
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg: dict = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (SCALE * 15) // (100 * n)
    import math

    r = {v: int(math.floor(float(SCALE) / n)) for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in outdeg)
        dsh = (dm * 85) // (100 * n)
        nxt = {v: base + dsh for v in nodes}
        for u, v in edges:
            nxt[v] += (r[u] * 85) // (100 * outdeg[u])
        r = nxt
    assert got == r
    # mass conservation: floors only ever LEAK mass, never create it
    assert sum(r.values()) <= SCALE
    # persist_edges is pure materialization (VERDICT r08 #4): turning the
    # default OFF is bit-identical
    unpersisted = {
        rr.node: rr.rank_fix
        for rr in graph.pagerank(
            df, "s", "d", n_iter=n_iter, persist_edges=False
        ).collect()
    }
    assert unpersisted == r


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),                     # key
            st.integers(0, 50),                    # seq (dedup'd below)
            st.one_of(st.none(), st.integers(-10_000, 10_000)),  # value cents
        ),
        min_size=1,
        max_size=40,
    ),
    horizon=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_ewma_truncated_matches_reference(spark, rows, horizon):
    """ewma_truncated == pure-Python integer replay: power-of-two weights
    over the last `horizon` non-NULL-aware slots (NULLs occupy a slot's
    position in the series but are skipped from both sums)."""
    from ucr_bigdata_snowfallproject_spark.operators.windows import ewma_truncated

    uniq = sorted({(k, s) for k, s, _ in rows})
    vals = {}
    for k, s, v in rows:
        vals.setdefault((k, s), v)
    data = [
        (k, s, None if vals[(k, s)] is None else vals[(k, s)] / 100.0)
        for k, s in uniq
    ]
    df = spark.createDataFrame(data, "k long, seq long, v double")
    out = ewma_truncated(
        df, ["k"], ["seq"], "v", horizon=horizon, scale=100, round_digits=6
    )
    got = {(r.k, r.seq): r.ewma for r in out.collect()}

    expected = {}
    series: dict[int, list] = {}
    for k, s in uniq:
        hist = series.setdefault(k, [])
        hist.append(vals[(k, s)])
        num = den = 0
        for i, c in enumerate(hist[-horizon:][::-1]):
            if c is None:
                continue
            w = 1 << (horizon - 1 - i)
            num += c * w
            den += w
        if den == 0:
            expected[(k, s)] = None
        else:
            import math

            expected[(k, s)] = math.floor(num / (den * 100.0) * 1e6 + 0.5) / 1e6
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=60,
    ),
)
@settings(**_SETTINGS)
def test_triangle_counts_matches_brute_force(spark, edges):
    """Degree-oriented triangle counting == brute-force enumeration on
    random graphs (self-loops and duplicate/reversed edges collapsed;
    per-node counts, nodes in ≥1 triangle only)."""
    from itertools import combinations

    from ucr_bigdata_snowfallproject_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges] or [("x", "x")],
        "s string, t string",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df, "s", "t").collect()}

    und = {frozenset((str(a), str(b))) for a, b in edges if a != b}
    nodes = sorted({v for e in und for v in e})
    expected: dict[str, int] = {}
    for u, v, w in combinations(nodes, 3):
        if (
            frozenset((u, v)) in und
            and frozenset((v, w)) in und
            and frozenset((u, w)) in und
        ):
            for n in (u, v, w):
                expected[n] = expected.get(n, 0) + 1
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 2),        # key
            st.integers(0, 7200),     # seconds offset (spans >1 hour bucket)
            st.integers(-500, 500),   # value cents
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_time_weighted_avg_matches_reference(spark, rows):
    """time_weighted_avg == pure-Python LOCF integral replay: segment
    [t_i, t_{i+1}) split at hour-bucket boundaries, exact integer
    microsecond durations, open-ended last segment excluded."""
    import math

    from ucr_bigdata_snowfallproject_spark.operators.resample import (
        time_weighted_avg,
    )

    uniq = sorted({(k, s) for k, s, _ in rows})
    vals = {}
    for k, s, v in rows:
        vals.setdefault((k, s), v)
    data = [
        (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
         vals[(k, s)] / 100.0)
        for k, s in uniq
    ]
    df = spark.createDataFrame(data, "k long, ts timestamp, v double")
    out = time_weighted_avg(df, ["k"], "ts", "v", bucket_us=3_600_000_000)
    got = {(r.k, r.bucket_start): (r.covered_us, r.twa) for r in out.collect()}

    BUS = 3_600_000_000
    # fixed epoch for 2024-01-01T00:00:00Z — session TZ is UTC, so the
    # naive datetimes above are UTC instants regardless of container TZ
    epoch0 = 1_704_067_200 * 1_000_000
    acc: dict = {}
    for k in {k for k, _ in uniq}:
        series = [(s, vals[(k, s)]) for kk, s in uniq if kk == k]
        for (s0, v), (s1, _) in zip(series, series[1:]):
            t0, t1 = epoch0 + s0 * 1_000_000, epoch0 + s1 * 1_000_000
            if t1 <= t0:
                continue
            for b in range(t0 // BUS, (t1 - 1) // BUS + 1):
                dur = min(t1, (b + 1) * BUS) - max(t0, b * BUS)
                num, den = acc.get((k, b), (0, 0))
                acc[(k, b)] = (num + v * dur, den + dur)
    expected = {}
    for (k, b), (num, den) in acc.items():
        if den > 0:
            ts = datetime.datetime.utcfromtimestamp(b * BUS / 1_000_000)
            expected[(k, ts)] = (
                den, math.floor(num / (den * 100.0) * 1e6 + 0.5) / 1e6
            )
    assert got == expected


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-1000, 1000, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
    n_bins=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_histogram_fixed_matches_reference(spark, vals, n_bins):
    """histogram_fixed == clamped-floor replay: every group emits exactly
    n_bins rows, counts conserve non-NULL values, edges are lo + i*width."""
    from ucr_bigdata_snowfallproject_spark.operators.aggregates import (
        histogram_fixed,
    )

    lo, hi = -100.0, 150.0
    width = (hi - lo) / n_bins
    df = spark.createDataFrame(
        [("g", v) for v in vals] or [("g", None)], "k string, v double"
    )
    out = histogram_fixed(df, ["k"], "v", lo=lo, hi=hi, n_bins=n_bins)
    got = {r.bin: (r.n, r.lo_edge, r.hi_edge) for r in out.collect()}
    assert len(got) == n_bins

    import math

    expected = [0] * n_bins
    for v in vals:
        if v is None:
            continue
        b = min(max(math.floor((v - lo) / width), 0), n_bins - 1)
        expected[b] += 1
    for i in range(n_bins):
        assert got[i] == (expected[i], lo + i * width, lo + (i + 1) * width)
    assert sum(n for n, _, _ in got.values()) == sum(v is not None for v in vals)


@given(
    xs=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    ys=st.lists(st.integers(0, 40), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_ks_statistic_matches_scipy_formula(spark, xs, ys):
    """ks_statistic == the classic max|ECDF_a − ECDF_b| over pooled
    values, with heavy ties (integer samples) exercising the
    step-together correction."""
    import math

    from ucr_bigdata_snowfallproject_spark.operators.aggregates import ks_statistic

    da = spark.createDataFrame([(float(x),) for x in xs], "v double")
    db = spark.createDataFrame([(float(y),) for y in ys], "v double")
    row = ks_statistic(da, db, "v").collect()[0]
    assert (row.n_a, row.n_b) == (len(xs), len(ys))

    na, nb = len(xs), len(ys)
    pooled = sorted(set(xs) | set(ys))
    d = max(
        abs(sum(1 for x in xs if x <= v) * nb - sum(1 for y in ys if y <= v) * na)
        for v in pooled
    )
    expected = math.floor(d / (na * nb) * 1e6 + 0.5) / 1e6
    assert row.ks == expected


_docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # doc id (deduped below)
        # None included (ADVICE r07): a NULL source is its own window
        # partition — the bucketed forms must keep those rows, not drop
        # them in the offset equi-join
        st.sampled_from(["web", "book", "code", None]),
        st.integers(min_value=1, max_value=40),    # token count
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_docs_strategy, budget=st.integers(min_value=1, max_value=300),
       n_buckets=st.sampled_from([1, 2, 7, 64]))
@settings(**_SETTINGS)
def test_token_budget_mix_bucketed_matches_naive_window(
    spark, rows, budget, n_buckets
):
    """VERDICT r06 #3 refactor guard: the bucketed two-pass prefix sum is
    BIT-identical to the naive whole-source running-sum window at every
    bucketing (incl. n_buckets=1, the degenerate single-bucket case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ucr_bigdata_snowfallproject_spark.operators import curation as cur

    uniq = {}
    for i, src, nt in rows:
        uniq.setdefault(i, (src, nt))
    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in uniq.items()],
        "doc_id long, source string, n_tokens_in int",
    )
    got = {
        (r.doc_id, r.cum_tokens)
        for r in cur.token_budget_mix(
            df, "source", "doc_id", F.col("n_tokens_in"),
            budget_tokens=budget, n_buckets=n_buckets,
        ).collect()
    }
    # naive reference: one whole-source window
    pri = cur.portable_hash("doc_id", "mix")
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        df.withColumn("priority", pri)
        .withColumn("n_tokens", F.col("n_tokens_in"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
    want = {(r.doc_id, r.cum_tokens) for r in naive.collect()}
    assert got == want


@given(
    names=st.lists(
        st.text(alphabet=st.sampled_from(list("abc ")), min_size=0, max_size=12),
        min_size=1,
        max_size=25,
    ),
    max_dist=st.sampled_from([1, 2, 3]),
)
@settings(**_SETTINGS)
def test_fuzzy_self_join_blocking_is_lossless(spark, names, max_dist):
    """fuzzy_self_join's q-gram + short-block candidate generation loses
    NOTHING: blocked output == the naive all-distinct-pairs levenshtein
    filter, on adversarially short strings over a tiny alphabet (the
    regime where the q-gram guarantee alone would fail and the §short
    routing must catch the pair)."""
    from ucr_bigdata_snowfallproject_spark.operators.text import fuzzy_self_join

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = sorted(
        (r.key_a, r.key_b, r.dist)
        for r in fuzzy_self_join(df, "name", max_dist=max_dist, q=2).collect()
    )
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    want = sorted(
        (a, b, lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if lev(a, b) <= max_dist
    )
    assert got == want


@given(
    lefts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=10),
        min_size=1, max_size=15,
    ),
    rights=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=10),
        min_size=1, max_size=15,
    ),
    max_dist=st.sampled_from([1, 2]),
)
@settings(**_SETTINGS)
def test_fuzzy_join_two_sided_lossless(spark, lefts, rights, max_dist):
    """Two-sided fuzzy_join == the naive distinct cross filter, on the
    same adversarially short tiny-alphabet strings."""
    from ucr_bigdata_snowfallproject_spark.operators.text import fuzzy_join

    ldf = spark.createDataFrame([(n,) for n in lefts], "ln string")
    rdf = spark.createDataFrame([(n,) for n in rights], "rn string")
    got = sorted(
        (r.key_left, r.key_right, r.dist)
        for r in fuzzy_join(ldf, rdf, "ln", "rn", max_dist=max_dist, q=2).collect()
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (a, b, lev(a, b))
        for a in set(lefts) for b in set(rights)
        if lev(a, b) <= max_dist
    )
    assert got == want


@given(
    names=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=10),
        min_size=1,
        max_size=20,
    ),
    max_dist=st.sampled_from([1, 2]),
    max_block=st.sampled_from([1, 4, 10_000]),
)
@settings(**_SETTINGS)
def test_fuzzy_self_join_max_block_subset_of_naive(
    spark, names, max_dist, max_block
):
    """VERDICT r08 #1: the max_block degrade knob. Cap-on output is a
    SUBSET of the naive all-pairs filter (star pairs are real pairs, so
    every survivor is a true ≤max_dist match), every kept pair carries
    the correct distance, and a cap no block reaches (10k on ≤20 strings)
    reproduces the exact cap-off output."""
    import itertools

    from ucr_bigdata_snowfallproject_spark.operators.text import fuzzy_self_join

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in fuzzy_self_join(
            df, "name", max_dist=max_dist, q=2, max_block=max_block
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if lev(a, b) <= max_dist
    }
    assert got <= want
    if max_block == 10_000:
        assert got == want


@given(
    lefts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=8),
        min_size=1, max_size=12,
    ),
    rights=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=8),
        min_size=1, max_size=12,
    ),
    max_block=st.sampled_from([1, 6, 10_000]),
)
@settings(**_SETTINGS)
def test_fuzzy_join_max_block_subset_of_naive(spark, lefts, rights, max_block):
    """Two-sided max_block: capped output ⊆ naive cross filter; a
    non-binding cap reproduces the exact output."""
    from ucr_bigdata_snowfallproject_spark.operators.text import fuzzy_join

    ldf = spark.createDataFrame([(n,) for n in lefts], "ln string")
    rdf = spark.createDataFrame([(n,) for n in rights], "rn string")
    got = {
        (r.key_left, r.key_right, r.dist)
        for r in fuzzy_join(
            ldf, rdf, "ln", "rn", max_dist=1, q=2, max_block=max_block
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a in set(lefts) for b in set(rights)
        if lev(a, b) <= 1
    }
    assert got <= want
    if max_block == 10_000:
        assert got == want


@given(rows=_docs_strategy, budget=st.integers(min_value=1, max_value=300))
@settings(**_SETTINGS)
def test_token_budget_mix_prefilter_keeps_null_sources(spark, rows, budget):
    """ADVICE r07 closure, prefilter path: the hash-threshold prefilter
    joins its per-source threshold frame null-safely too — prefilter=True
    must return EXACTLY the prefilter=False kept set (the identity
    guarantee), including rows whose source is NULL."""
    from pyspark.sql import functions as F

    from ucr_bigdata_snowfallproject_spark.operators import curation as cur

    uniq = {}
    for i, src, nt in rows:
        uniq.setdefault(i, (src, nt))
    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in uniq.items()],
        "doc_id long, source string, n_tokens_in int",
    )
    key = lambda pf: {
        (r.doc_id, r.cum_tokens)
        for r in cur.token_budget_mix(
            df, "source", "doc_id", F.col("n_tokens_in"),
            budget_tokens=budget, prefilter=pf,
        ).collect()
    }
    assert key(True) == key(False)


@given(rows=_docs_strategy, n_buckets=st.sampled_from([1, 3, 64]))
@settings(**_SETTINGS)
def test_interleave_bucketed_matches_naive_global_window(spark, rows, n_buckets):
    """VERDICT r06 #2 refactor guard: the two-pass distributed interleave
    rank equals the naive global row_number over ((i-1/2)/tot, source,
    id) — the exact semantics the DuckDB oracle encodes — at every
    bucketing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ucr_bigdata_snowfallproject_spark.operators import curation as cur

    uniq = {}
    for i, src, _ in rows:
        uniq.setdefault(i, src)
    df = spark.createDataFrame(
        list(uniq.items()), "doc_id long, source string"
    )
    got = {
        (r.doc_id, r.interleave_rank)
        for r in cur.proportional_interleave(
            df, "source", "doc_id", n_buckets=n_buckets
        ).collect()
    }
    pri = cur.portable_hash("doc_id", "il")
    w_src = Window.partitionBy("source").orderBy(pri.asc(), F.col("doc_id").asc())
    totals = df.groupBy("source").agg(F.count(F.lit(1)).alias("__tot"))
    # null-safe: the naive reference must also keep NULL-source rows
    totals = totals.withColumnRenamed("source", "__src_t")
    ranked = (
        df.withColumn("__i", F.row_number().over(w_src))
        .join(totals, F.col("source").eqNullSafe(F.col("__src_t")))
        .drop("__src_t")
    )
    frac = (F.col("__i") - F.lit(0.5)) / F.col("__tot")
    w_all = Window.orderBy(frac.asc(), F.col("source").asc(), F.col("doc_id").asc())
    naive = ranked.withColumn(
        "interleave_rank", F.row_number().over(w_all).cast("int")
    )
    want = {(r.doc_id, r.interleave_rank) for r in naive.collect()}
    assert got == want


def test_interleave_oracle_null_source_tie_needs_nulls_first(spark):
    """ADVICE r08: with a NULL source tying another source on frac
    (equal counts ⇒ identical (i-1/2)/tot at every position), Spark's
    asc orderBy puts NULL first while DuckDB's default ORDER BY puts it
    last — the oracle must say NULLS FIRST explicitly or the ranks
    diverge. Pins the Spark output against the NULLS FIRST oracle form
    (and that the default DuckDB form WOULD diverge, proving the tie is
    actually exercised)."""
    import duckdb

    from ucr_bigdata_snowfallproject_spark.operators import curation as cur

    docs = [(i, None if i % 2 == 0 else "web") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, source string")
    got = sorted(
        (r.doc_id, r.interleave_rank)
        for r in cur.proportional_interleave(df, "source", "doc_id").collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW kept AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if s is None else repr(s)})" for i, s in docs
        )
        + ") AS t(doc_id, source)"
    )
    oracle_tmpl = """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#il'),
                                        1, 8))::BIGINT, doc_id) AS i,
             COUNT(*) OVER (PARTITION BY source) AS tot
      FROM kept
    )
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY (i - 0.5) / tot, source {nulls}, doc_id) AS INT)
             AS interleave_rank
    FROM ranked
    """
    fixed = sorted(
        map(tuple, con.sql(oracle_tmpl.format(nulls="NULLS FIRST")).fetchall())
    )
    default = sorted(map(tuple, con.sql(oracle_tmpl.format(nulls="")).fetchall()))
    assert got == fixed
    assert got != default  # the tie is real: default DuckDB order diverges
