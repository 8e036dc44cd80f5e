"""Property-based tests (hypothesis): operator semantics against
independent reference implementations on randomized inputs."""

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import skew, temporal

_EPOCH = datetime.datetime(2024, 1, 1)


def _rows(seconds_and_vals):
    return [
        (k, _EPOCH + datetime.timedelta(seconds=s), float(v))
        for k, s, v in seconds_and_vals
    ]


side = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=50),  # ts offset seconds
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=side, right=side)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # pandas merge_asof requires unique ordered keys per side; dedupe (k, ts)
    left = list({(k, s): (k, s, v) for k, s, v in left}.values())
    right = list({(k, s): (k, s, v) for k, s, v in right}.values())

    ldf = spark.createDataFrame(_rows(left), "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(_rows(right), "k int, ts timestamp, v double")
    got = {
        (r.k, r.ts): r.v
        for r in temporal.asof_join(ldf, rdf, ["k"], "ts", ["v"]).collect()
    }

    lp = pd.DataFrame(_rows(left), columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(_rows(right), columns=["k", "ts", "v"]).sort_values("ts")
    exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp = {
        (int(r.k), r.ts.to_pydatetime()): (None if pd.isna(r.v) else float(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=1, max_size=30
    ),
    salt=st.integers(min_value=1, max_value=7),
)
def test_salted_agg_always_equals_plain(spark, rows, salt):
    df = spark.createDataFrame([(k, float(v)) for k, v in rows], "k int, v double")
    plain = {
        r.k: (round(r.s, 6), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.k: (round(r.s, 6), r.n)
        for r in skew.salted_agg(
            df, ["k"], sums={"s": F.col("v")}, count_alias="n", salt=salt
        ).collect()
    }
    assert got == plain


bloom_keys = st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40, unique=True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=bloom_keys, probes=bloom_keys)
def test_bloom_never_false_negative(spark, keys, probes):
    from codecdb_queryengine_spark.operators import membership as MB

    ref = spark.createDataFrame([(k,) for k in keys], "k string")
    bloom = MB.bloom_build(ref, "k", num_bits=1 << 10, num_hashes=4)
    probe = spark.createDataFrame([(k,) for k in set(keys) | set(probes)], "k string")
    got = {
        r.k: r.m
        for r in probe.join(F.broadcast(bloom))
        .withColumn("m", MB.bloom_might_contain(F.col("bloom"), F.col("k"), 1 << 10, 4))
        .collect()
    }
    for k in keys:
        assert got[k] is True  # an inserted key can never probe negative


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_z_value_decodes_back_to_inputs(spark, pts):
    from codecdb_queryengine_spark.sources.layout import z_value

    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.withColumn("z", z_value([F.col("x"), F.col("y")], bits=8)).collect()
    for r in rows:
        x = sum(((r.z >> (2 * b)) & 1) << b for b in range(8))
        y = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(8))
        assert (x, y) == (r.x, r.y)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=side, right=side)
def test_asof_join_forward_matches_pandas(spark, left, right):
    left = list({(k, s): (k, s, v) for k, s, v in left}.values())
    right = list({(k, s): (k, s, v) for k, s, v in right}.values())

    ldf = spark.createDataFrame(_rows(left), "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(_rows(right), "k int, ts timestamp, v double")
    got = {
        (r.k, r.ts): r.v
        for r in temporal.asof_join(
            ldf, rdf, ["k"], "ts", ["v"], direction="forward"
        ).collect()
    }

    lp = pd.DataFrame(_rows(left), columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(_rows(right), columns=["k", "ts", "v"]).sort_values("ts")
    exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    exp = {
        (int(r.k), r.ts.to_pydatetime()): (None if pd.isna(r.v) else float(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp


# --- late-r5 operators: segment dedup, interpolation, phrase search ---------


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e1"]),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_segment_dedup_matches_python_reference(spark, docs):
    from codecdb_queryengine_spark.operators import dedup as D

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in D.segment_dedup(df, "text", "doc_id", seg_tokens=2).collect()
    }

    seen: set = set()
    for i, toks in enumerate(docs):
        segs = [" ".join(toks[j : j + 2]) for j in range(0, len(toks), 2)]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i] == (len(segs), len(kept), " ".join(kept)), (i, docs)


series_strategy = st.lists(
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=series_strategy)
def test_interpolate_linear_matches_python_reference(spark, vals):
    from codecdb_queryengine_spark.operators import temporal as TJ

    rows = [("k", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        r["t"]: r["v_filled"]
        for r in TJ.interpolate_linear(df, ["k"], "t", "v").collect()
    }
    obs = [(t, v) for t, v in enumerate(vals) if v is not None]
    for t, v in enumerate(vals):
        if v is not None:
            assert got[t] == float(v)
            continue
        prev = [(pt, pv) for pt, pv in obs if pt < t]
        nxt = [(nt, nv) for nt, nv in obs if nt > t]
        if not prev or not nxt:
            assert got[t] is None, (t, vals)
        else:
            pt, pv = prev[-1]
            nt, nv = nxt[0]
            assert got[t] == pv + (nv - pv) * ((t - pt) / (nt - pt)), (t, vals)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy, phrase=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3))
def test_phrase_search_matches_substring_reference(spark, docs, phrase, tmp_path_factory):
    from codecdb_queryengine_spark.sources import text_index as TI

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("ti"))
    TI.text_index_build_positional(df, path, num_buckets=4)
    got = {
        r["doc_id"]
        for r in TI.text_index_search_phrase(spark, path, phrase, num_buckets=4).collect()
    }
    needle = " " + " ".join(phrase) + " "
    expect = {
        i for i, toks in enumerate(docs) if needle in " " + " ".join(toks) + " "
    }
    assert got == expect, (docs, phrase)


# --- graph operators vs pure-Python references -------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=16,
).filter(lambda es: any(a != b for a, b in es))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from codecdb_queryengine_spark.operators.graph import triangle_counts

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    expect: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy, iters=st.integers(min_value=1, max_value=3))
def test_pagerank_micro_matches_python_replay(spark, edges, iters):
    from codecdb_queryengine_spark.operators.graph import pagerank_micro

    sym = sorted({(a, b) for a, b in edges if a != b} | {(b, a) for a, b in edges if a != b})
    deg: dict[int, int] = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    pr = {n: 1_000_000 for n in deg}
    for _ in range(iters):
        incoming: dict[int, int] = {n: 0 for n in deg}
        for a, b in sym:
            incoming[b] += pr[a] // deg[a]
        pr = {n: 150_000 + (85 * s) // 100 for n, s in incoming.items()}
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank_micro(df, iters=iters).collect()}
    assert got == pr


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_exact_substring_dedup_matches_python_reference(spark, docs):
    """ExactSubstr removal (k=2) against a brute-force reference: a token
    survives iff no duplicated 2-gram window covering it is a non-first
    occurrence (first = min (doc_id, pos) over the window's text)."""
    import hashlib

    from codecdb_queryengine_spark.operators import dedup as D

    k = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_ntok"],
                      r["clean_md5"])
        for r in D.exact_substring_dedup(df, "text", "doc_id", k=k).collect()
    }

    occs: dict = {}
    for i, toks in enumerate(docs):
        for pos in range(len(toks) - k + 1):
            occs.setdefault(" ".join(toks[pos : pos + k]), []).append((i, pos))
    removed: set = set()
    for locs in occs.values():
        for d, pos in sorted(locs)[1:]:
            removed.update((d, p) for p in range(pos, pos + k))
    for i, toks in enumerate(docs):
        clean = [t for p, t in enumerate(toks) if (i, p) not in removed]
        exp = (
            len(toks),
            len(toks) - len(clean),
            len(clean),
            hashlib.md5(" ".join(clean).encode()).hexdigest(),
        )
        assert got[i] == exp, (i, docs)
