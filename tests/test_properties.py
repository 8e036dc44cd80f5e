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
