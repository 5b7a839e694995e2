"""Both quantile paths (VERDICT r3 item 4): the exact ``percentile`` default
stays oracle-green (covered by the harness), and the bounded-state
``percentile_approx`` path — ``spark.rocana.quantile.approx=true`` — keeps
the same schema with values inside a bounded error of the exact ones.
"""

from __future__ import annotations

import pytest

from rocana_impala_udfs_spark.functions.quantiles import ACCURACY_CONF, APPROX_CONF

SF = "/root/testdata/sf0.001"

FOUR = [
    "histogram_price_equidepth",
    "winsorized_stats_price",
    "customer_rfm_segments",
    "corpus_length_report",
]


@pytest.fixture()
def approx_conf(spark):
    spark.conf.set(APPROX_CONF, "true")
    spark.conf.set(ACCURACY_CONF, "10000")
    yield spark
    spark.conf.unset(APPROX_CONF)
    spark.conf.unset(ACCURACY_CONF)


def _run(spark, key):
    import __spark_entry__ as e

    return e.queries()[key](spark, SF)


@pytest.mark.parametrize("key", FOUR)
def test_approx_path_same_schema_same_rowcount(spark, approx_conf, key):
    exact = _run(spark, key)
    spark.conf.set(APPROX_CONF, "false")
    try:
        base = _run(spark, key)
        base_schema, base_count = base.schema, base.count()
    finally:
        spark.conf.set(APPROX_CONF, "true")
    assert exact.schema == base_schema
    assert exact.count() == base_count


def test_corpus_length_report_approx_bounded_error(spark, approx_conf):
    approx = _run(spark, "corpus_length_report").collect()[0]
    spark.conf.set(APPROX_CONF, "false")
    try:
        exact = _run(spark, "corpus_length_report").collect()[0]
    finally:
        spark.conf.set(APPROX_CONF, "true")
    assert approx.n_docs == exact.n_docs
    assert approx.total_tokens == exact.total_tokens
    # accuracy=10000 ≫ n at sf0.001 → GK rank error ≤ 1 element; exact
    # interpolates between elements, so allow one inter-element gap
    for col in ("p50_tokens", "p90_tokens", "p99_tokens"):
        assert abs(approx[col] - exact[col]) <= max(2.0, 0.05 * exact[col])


def test_winsorized_approx_bounded_error(spark, approx_conf):
    approx = {r.l_returnflag: r for r in _run(spark, "winsorized_stats_price").collect()}
    spark.conf.set(APPROX_CONF, "false")
    try:
        exact = {r.l_returnflag: r for r in _run(spark, "winsorized_stats_price").collect()}
    finally:
        spark.conf.set(APPROX_CONF, "true")
    assert set(approx) == set(exact)
    for k in exact:
        assert approx[k].n == exact[k].n
        assert approx[k].wins_mean == pytest.approx(exact[k].wins_mean, rel=0.01)
        assert approx[k].wins_stddev == pytest.approx(exact[k].wins_stddev, rel=0.05)


def test_exact_path_is_the_default(spark):
    # no conf set → exact percentile in the plan, approx absent
    plan = _run(spark, "corpus_length_report")._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" not in plan


def test_approx_path_uses_bounded_state(spark, approx_conf):
    plan = _run(spark, "corpus_length_report")._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan
