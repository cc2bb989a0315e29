"""Unit tests for operators/analytics.py (funnel, cohort retention,
decayed engagement) and the portable HLL sketch — semantics checked
against tiny hand-computed frames, plus invariants on testdata."""


import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from traits_data_spark.operators.analytics import (
    cohort_retention,
    decayed_engagement,
    funnel_steps,
)
from traits_data_spark.operators.sketches import hll_estimate, hll_registers

DAY_US = 86_400_000_000
_TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', CAST(ts AS TIMESTAMP_NTZ))"


def _events_df(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts_us=ts, value=v) for u, t, ts, v in rows],
        "user_id long, event_type string, ts_us long, value double",
    )


class TestFunnel:
    def test_ordering_enforced(self, spark):
        # u1 completes in order; u2 clicks BEFORE viewing (click must
        # not count); u3 views only.
        df = _events_df(
            spark,
            [
                (1, "view", 100, 0.0),
                (1, "click", 200, 0.0),
                (1, "purchase", 300, 0.0),
                (2, "click", 50, 0.0),
                (2, "view", 60, 0.0),
                (3, "view", 10, 0.0),
            ],
        )
        out = {
            r["step"]: r["n_users"]
            for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
        }
        assert out == {"view": 3, "click": 1, "purchase": 1}

    def test_strictly_after(self, spark):
        # a click at the exact same ts as the view does not advance.
        df = _events_df(spark, [(1, "view", 100, 0.0), (1, "click", 100, 0.0)])
        out = {
            r["step"]: r["n_users"]
            for r in funnel_steps(df, ["view", "click"]).collect()
        }
        assert out == {"view": 1, "click": 0}

    def test_monotone_counts(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
            "user_id",
            "event_type",
            F.expr(_TS_US).alias("ts_us"),
        )
        rows = sorted(
            funnel_steps(ev, ["view", "click", "purchase"]).collect(),
            key=lambda r: r["step_idx"],
        )
        counts = [r["n_users"] for r in rows]
        assert counts == sorted(counts, reverse=True)

    def test_empty_steps_raises(self, spark):
        df = _events_df(spark, [(1, "view", 1, 0.0)])
        with pytest.raises(ValueError):
            funnel_steps(df, [])


class TestCohortRetention:
    def test_triangle(self, spark):
        # u1 first wk0 active wk0+wk2, u2 first wk0 only, u3 first wk1.
        wk = 7 * DAY_US
        df = _events_df(
            spark,
            [
                (1, "view", 0 * wk + 5, 0.0),
                (1, "view", 2 * wk + 5, 0.0),
                (2, "view", 0 * wk + 9, 0.0),
                (3, "view", 1 * wk + 1, 0.0),
            ],
        )
        out = {
            (r["cohort_period"], r["period_offset"]): (r["n_active"], r["n_cohort"])
            for r in cohort_retention(df).collect()
        }
        assert out == {(0, 0): (2, 2), (0, 2): (1, 2), (1, 0): (1, 1)}

    def test_offset_zero_equals_cohort_size(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
            "user_id", F.expr(_TS_US).alias("ts_us")
        )
        for r in cohort_retention(ev).filter(F.col("period_offset") == 0).collect():
            assert r["n_active"] == r["n_cohort"]


class TestDecayedEngagement:
    def test_hand_computed(self, spark):
        # one user: 100.00 today (day 10), 50.00 yesterday, 25.00 at
        # day 10-31 (outside the 30-day lookback -> dropped).
        df = _events_df(
            spark,
            [
                (1, "view", 10 * DAY_US + 5, 100.0),
                (1, "view", 9 * DAY_US + 5, 50.0),
                (1, "view", -21 * DAY_US + 5, 25.0),
            ],
        )
        row = decayed_engagement(df).collect()[0]
        assert row["ref_day"] == 10
        expected = (10000 << 30) + (5000 << 29)
        assert row["decayed_scaled"] == expected
        assert row["decayed_score"] == pytest.approx(10000 + 2500.0, abs=1e-9)

    def test_negative_values_ok(self, spark):
        df = _events_df(spark, [(1, "view", 0, -3.5), (1, "view", 0, 1.0)])
        row = decayed_engagement(df).collect()[0]
        assert row["decayed_score"] == pytest.approx(-250.0, abs=1e-9)

    def test_half_life_validation(self, spark):
        df = _events_df(spark, [(1, "view", 0, 1.0)])
        with pytest.raises(ValueError):
            decayed_engagement(df, half_life_days=7, lookback_days=30)


class TestHLL:
    def test_register_table_shape(self, spark):
        df = spark.range(1000).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("v")
        )
        regs = hll_registers(df, ["g"], "v")
        rows = regs.collect()
        assert len(rows) == 2 * 64
        assert all(0 <= r["register"] <= 55 for r in rows)

    def test_estimate_accuracy(self, spark):
        # HLL with m=64 has ~13% relative stderr; assert within 3 sigma.
        df = spark.range(20_000).select(
            F.lit("a").alias("g"), F.col("id").alias("v")
        )
        est = hll_estimate(hll_registers(df, ["g"], "v"), ["g"]).collect()[0]
        assert est["distinct_est"] == pytest.approx(20_000, rel=0.4)

    def test_merge_by_max(self, spark):
        # sketch(A union B) == max-merge(sketch(A), sketch(B))
        a = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
        b = spark.range(2500, 8000).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        )
        whole = hll_registers(a.unionByName(b), ["g"], "v")
        merged = (
            hll_registers(a, ["g"], "v")
            .unionByName(hll_registers(b, ["g"], "v"))
            .groupBy("g", "bucket")
            .agg(F.max("register").alias("register"))
        )
        ew = hll_estimate(whole, ["g"]).collect()[0]["distinct_est"]
        em = hll_estimate(merged, ["g"]).collect()[0]["distinct_est"]
        assert ew == em

    def test_rho_matches_python(self, spark):
        # cross-check rho against a driver-side recomputation of the
        # same md5-60 hash for a few values.
        import hashlib

        df = spark.range(50).select(F.lit("g").alias("g"), F.col("id").alias("v"))
        regs = {
            r["bucket"]: r["register"]
            for r in hll_registers(df, ["g"], "v").collect()
        }
        expected: dict[int, int] = {}
        for i in range(50):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            bucket, rem = h >> 54, h & ((1 << 54) - 1)
            rho = 55 if rem == 0 else 54 - (rem.bit_length() - 1)
            expected[bucket] = max(expected.get(bucket, 0), rho)
        for b in range(64):
            assert regs[b] == expected.get(b, 0)


class TestCountMin:
    def test_overestimate_invariant(self, spark, documents):
        from traits_data_spark.operators.sketches import (
            cms_estimate,
            count_min_sketch,
        )
        from traits_data_spark.operators.text import word_array

        words = documents.select(
            F.explode(word_array("text")).alias("__w")
        ).select(F.lower(F.col("__w")).alias("term"))
        sketch = count_min_sketch(words, "term", depth=4, width=128)
        exact = words.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
        est = cms_estimate(sketch, exact, "term", depth=4, width=128)
        rows = est.collect()
        assert rows and all(r["est_count"] >= r["n"] for r in rows)

    def test_exact_when_width_ample(self, spark):
        from traits_data_spark.operators.sketches import (
            cms_estimate,
            count_min_sketch,
        )

        # few distinct values + wide sketch -> no collisions -> exact
        df = spark.range(1000).select((F.col("id") % 5).alias("v"))
        sketch = count_min_sketch(df, "v", depth=4, width=4096)
        probes = df.distinct()
        est = cms_estimate(sketch, probes, "v", depth=4, width=4096)
        assert {(r["v"], r["est_count"]) for r in est.collect()} == {
            (i, 200) for i in range(5)
        }

    def test_merge_by_sum(self, spark):
        from pyspark.sql import functions as SF

        from traits_data_spark.operators.sketches import count_min_sketch

        a = spark.range(500).select((F.col("id") % 7).alias("v"))
        b = spark.range(300).select((F.col("id") % 3).alias("v"))
        whole = count_min_sketch(a.unionByName(b), "v", depth=2, width=64)
        merged = (
            count_min_sketch(a, "v", depth=2, width=64)
            .unionByName(count_min_sketch(b, "v", depth=2, width=64))
            .groupBy("row", "bucket")
            .agg(SF.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_validation(self, spark):
        from traits_data_spark.operators.sketches import count_min_sketch

        df = spark.range(1).select(F.col("id").alias("v"))
        with pytest.raises(ValueError):
            count_min_sketch(df, "v", depth=0)


class TestSampledQuantiles:
    def test_rank_selection_hand_computed(self, spark):
        from traits_data_spark.operators.sketches import sampled_quantiles

        # rate 100% -> the "sample" is the full frame; ranks are exact
        df = spark.createDataFrame(
            [(1, "g", float(v)) for v in range(1, 102)],
            "k long, g string, v double",
        )
        row = sampled_quantiles(
            df, ["g"], "v", "k", quantiles=(0.5, 0.9), rate_bp=10_000
        ).collect()[0]
        # n=101: p50 rank floor(.5*100)+1 = 51 -> value 51; p90 -> 91
        assert row["n_sample"] == 101
        assert row["p50"] == 51.0
        assert row["p90"] == 91.0

    def test_sample_median_near_true_median(self, spark, lineitem):
        from pyspark.sql import functions as F

        from traits_data_spark.operators.sketches import sampled_quantiles

        li = lineitem.withColumn(
            "__key",
            F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber")),
        )
        out = {
            r["l_returnflag"]: r
            for r in sampled_quantiles(
                li, ["l_returnflag"], "l_extendedprice", "__key", rate_bp=2000
            ).collect()
        }
        exact = {
            r["l_returnflag"]: r["m"]
            for r in li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
            .collect()
        }
        for flag, r in out.items():
            # 20% uniform sample of thousands of rows: the sample
            # median lands well within +-15% of the true median
            assert abs(r["p50"] - exact[flag]) / exact[flag] < 0.15
            assert r["p50"] <= r["p90"] <= r["p99"]

    def test_merge_by_union(self, spark):
        from traits_data_spark.operators.sketches import sampled_quantiles

        df = spark.range(10_000).selectExpr(
            "id AS k", "'g' AS g", "CAST(id % 997 AS DOUBLE) AS v"
        )
        a, b = df.filter("id < 5000"), df.filter("id >= 5000")
        whole = sampled_quantiles(df, ["g"], "v", "k", rate_bp=1500).collect()
        via_union = sampled_quantiles(
            a.unionByName(b), ["g"], "v", "k", rate_bp=1500
        ).collect()
        assert sorted(map(tuple, whole)) == sorted(map(tuple, via_union))

    def test_validation(self, spark):
        from traits_data_spark.operators.sketches import sampled_quantiles

        df = spark.range(1).selectExpr("id AS k", "'g' AS g", "1.0 AS v")
        with pytest.raises(ValueError):
            sampled_quantiles(df, ["g"], "v", "k", quantiles=())
        with pytest.raises(ValueError):
            sampled_quantiles(df, ["g"], "v", "k", rate_bp=0)


def test_decayed_and_cohort_pre_1970(spark):
    """Floor (not truncate-toward-zero) bucketing for pre-epoch
    timestamps, and negative values through the shift path — mirrors
    the oracle's pmod-based floor and multiply-by-power form."""
    from traits_data_spark.operators.analytics import (
        cohort_retention,
        decayed_engagement,
    )

    df = _events_df(
        spark,
        [(1, "view", -7 * DAY_US, -3.5), (1, "view", 4 * DAY_US, 2.0)],
    )
    row = decayed_engagement(df).collect()[0]
    assert row["ref_day"] == 4
    assert row["decayed_scaled"] == (-350 << 19) + (200 << 30)
    tri = {
        (r["cohort_period"], r["period_offset"]) for r in cohort_retention(df).collect()
    }
    assert tri == {(-1, 0), (-1, 1)}


def test_hll_null_group_counts_correctly(spark):
    """A NULL group key must still collect registers (null-safe
    zero-fill join) — a plain equality join would report the empty
    sketch's constant estimate regardless of true cardinality."""
    from pyspark.sql import functions as SF

    from traits_data_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.range(5000).select(
        SF.when(F.col("id") % 2 == 0, None).otherwise(F.lit("a")).alias("g"),
        F.col("id").alias("v"),
    )
    regs = hll_registers(df, ["g"], "v")
    assert regs.count() == 2 * 64
    ests = {r["g"]: r["distinct_est"] for r in hll_estimate(regs, ["g"]).collect()}
    # ~2500 distinct each; the empty-sketch constant is floor(.709*64)=45
    assert ests[None] > 500 and ests["a"] > 500


def test_funnel_conversion_window(spark):
    from traits_data_spark.operators.analytics import funnel_steps

    # u1 clicks 5 units after viewing; u2 clicks 500 after
    df = _events_df(
        spark,
        [
            (1, "view", 100, 0.0),
            (1, "click", 105, 0.0),
            (2, "view", 100, 0.0),
            (2, "click", 600, 0.0),
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_steps(df, ["view", "click"], within=50).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_event_transitions_sum(spark):
    """Transition counts total events minus one per active user."""
    from traits_data_spark import catalog

    sf = "/root/testdata/sf0.001"
    out = catalog.QUERIES["event_transitions"](spark, sf)
    total = sum(r["n_transitions"] for r in out.collect())
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_hourly_anomalies_flags_consistent(spark):
    from traits_data_spark import catalog

    rows = catalog.QUERIES["hourly_anomalies"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["is_anomaly"] == (abs(r["z"]) >= 2.0)


def test_funnel_repeated_step_type(spark):
    """A funnel can repeat an event type: the second 'view' must be a
    DIFFERENT (later) event than the first."""
    from traits_data_spark.operators.analytics import funnel_steps

    df = _events_df(
        spark,
        [(1, "view", 100, 0.0), (1, "view", 200, 0.0), (2, "view", 50, 0.0)],
    )
    rows = sorted(
        funnel_steps(df, ["view", "view"]).collect(), key=lambda r: r["step_idx"]
    )
    assert [r["n_users"] for r in rows] == [2, 1]


class TestHistogramSketch:
    def test_hand_computed_bins(self, spark):
        from traits_data_spark.operators.sketches import histogram_sketch

        df = spark.createDataFrame(
            [(v,) for v in [-5, 0, 9, 10, 19, 95, 100, 250]], "v long"
        ).selectExpr("'g' AS g", "v")
        out = {
            (r["bin"]): r["cnt"]
            for r in histogram_sketch(df, ["g"], "v", lo=0, hi=100, n_bins=10).collect()
        }
        # -5 clamps to bin 0; 100 and 250 clamp to bin 9; 95 -> bin 9
        assert out == {0: 3, 1: 2, 9: 3}

    def test_merge_by_sum(self, spark):
        from pyspark.sql import functions as SF

        from traits_data_spark.operators.sketches import histogram_sketch

        df = spark.range(1000).selectExpr("'g' AS g", "id % 97 AS v")
        a, b = df.filter("id < 400"), df.filter("id >= 400")
        whole = histogram_sketch(df, ["g"], "v", 0, 100, 10)
        merged = (
            histogram_sketch(a, ["g"], "v", 0, 100, 10)
            .unionByName(histogram_sketch(b, ["g"], "v", 0, 100, 10))
            .groupBy("g", "bin")
            .agg(SF.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_validation(self, spark):
        from traits_data_spark.operators.sketches import histogram_sketch

        df = spark.range(1).selectExpr("'g' AS g", "id AS v")
        with pytest.raises(ValueError):
            histogram_sketch(df, ["g"], "v", 0, 100, 7)  # not divisible
        with pytest.raises(ValueError):
            histogram_sketch(df, ["g"], "v", 100, 0, 10)
