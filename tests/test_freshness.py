"""Change-rate estimation (operators/freshness.py): closed-form
agreement, X=0 and X=n endpoints, monotonicity, clamping. Cross-engine
identity is pinned by the catalog's change_rate_estimate oracle row."""

from __future__ import annotations

import math

import pytest

from crawler_ai_spark.operators.freshness import estimate_change_rate


def _hist(spark, spec):
    # spec: {url: (n_visits, n_changed)}
    rows = []
    for url, (n, x) in spec.items():
        rows += [(url, i < x) for i in range(n)]
    return spark.createDataFrame(rows, "url string, changed boolean")


def test_closed_form_and_endpoints(spark):
    out = {
        r.url: r
        for r in estimate_change_rate(
            _hist(spark, {"a": (8, 3), "never": (8, 0), "always": (8, 8)}),
            interval_s=86400.0,
        ).collect()
    }
    lam = -math.log((8 - 3 + 0.5) / 8.5) / 86400.0
    assert out["a"].lambda_hat == pytest.approx(round(lam, 12))
    assert out["a"].revisit_s == int(math.log(2) / round(lam, 12))
    # X=0: rate exactly 0, parked at the max interval (no div-by-zero)
    assert out["never"].lambda_hat == 0.0
    assert out["never"].revisit_s == 30 * 86400
    # X=n: the naive estimator is infinite; the 0.5 correction is finite
    assert out["always"].lambda_hat > 0
    assert out["always"].revisit_s >= 3600


def test_monotone_in_change_count(spark):
    spec = {f"u{x}": (10, x) for x in range(11)}
    out = {r.url: r for r in estimate_change_rate(_hist(spark, spec), 3600.0).collect()}
    lams = [out[f"u{x}"].lambda_hat for x in range(11)]
    assert lams == sorted(lams)  # more observed changes -> higher rate
    revisits = [out[f"u{x}"].revisit_s for x in range(1, 11)]
    assert revisits == sorted(revisits, reverse=True)


def test_min_clamp(spark):
    # hourly visits, almost always changed: raw half-life < 1h floor
    out = estimate_change_rate(
        _hist(spark, {"hot": (20, 19)}), interval_s=600.0
    ).collect()[0]
    assert out.revisit_s == 3600


def test_quantized_zero_lambda_parks_at_max(spark):
    # 1 observed change over a huge visit interval: the raw rate is
    # positive but rounds to exactly 0 at 12 dp. Must take the
    # max-interval branch (not DIVIDE_BY_ZERO under ANSI, not an
    # inverted clamp to the MIN interval via NULL-skipping greatest).
    out = estimate_change_rate(
        _hist(spark, {"glacial": (2, 1)}), interval_s=2.0e12
    ).collect()[0]
    assert out.lambda_hat == 0.0 and out.n_changed == 1
    assert out.revisit_s == 30 * 86400
