"""Forecast harness (F1–F3 surrogates, F13): each grouped-UDF model is
checked against an independent driver-side numpy/pandas implementation —
the correctness story for operators the DuckDB oracle can't cover."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def events_pdf(spark, sf_dir):
    from portofolio_maximizer_spark.plans.queries_stats import _series

    return _series(spark, sf_dir).toPandas()


def test_ewma_matches_pandas(spark, sf_dir, events_pdf):
    got = QUERIES["ewma_vol_recursive"](spark, sf_dir).toPandas()
    one = events_pdf[events_pdf.user_id == events_pdf.user_id.iloc[0]].sort_values(
        "rn"
    )
    r = one.lr.dropna().to_numpy()
    lam, var = 0.94, r[0] ** 2
    expect = []
    for t in range(1, len(r)):
        var = lam * var + (1 - lam) * r[t - 1] ** 2
        expect.append(np.sqrt(var))
    mine = got[got.user_id == one.user_id.iloc[0]].sort_values("rn").sigma.to_numpy()
    assert len(mine) == len(expect)
    np.testing.assert_allclose(mine, np.round(expect, 6), atol=1e-6)


def test_ar_forecast_recovers_ar1(spark):
    """A synthetic AR(1) series must be identified (order 1 wins AIC) and
    forecast close to the true conditional mean."""
    rng = np.random.default_rng(7)
    n, phi, c = 400, 0.8, 2.0
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = c + phi * x[t - 1] + rng.normal(0, 0.1)
    pdf = pd.DataFrame(
        {"user_id": 1, "rn": np.arange(n), "value": x}
    )
    from portofolio_maximizer_spark.forecast import ar_grid_forecast

    out = ar_grid_forecast(spark.createDataFrame(pdf)).toPandas()
    assert (out.best_order == 1).all()
    step1 = out[out.horizon_step == 1].iloc[0]
    expect = c + phi * x[-1]
    assert abs(step1.yhat - expect) < 0.1
    assert step1.lo < step1.yhat < step1.hi


def test_ssa_beats_naive_on_structured_series(spark, sf_dir):
    out = QUERIES["ssa_reconstruction"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.evr >= 0.9).all()
    # reconstruction of a rank-truncated SVD must on average beat the
    # naive diff RMSE on series with any structure
    assert (out.recon_rmse <= out.naive_rmse).mean() > 0.5


def test_classifier_fits_and_is_deterministic(spark, sf_dir):
    """The synthetic embeddings carry no label signal (test accuracy ≈
    chance, by construction of the testdata) — what must hold is that the
    optimizer genuinely fits (train accuracy ≫ 10-class chance via
    memorization) and that the whole pipeline is run-to-run deterministic."""
    row = QUERIES["embedding_classifier_eval"](spark, sf_dir).collect()[0]
    assert row.n_train + row.n_test == 500
    assert row.train_accuracy > 0.3  # memorizes 64-dim train set, chance=0.1
    assert 0.0 <= row.accuracy <= 1.0
    row2 = QUERIES["embedding_classifier_eval"](spark, sf_dir).collect()[0]
    assert row.accuracy == row2.accuracy
    assert row.train_accuracy == row2.train_accuracy


def test_cusum_detects_injected_shift(spark):
    """A mean shift of +3σ at t=100 must raise an up-shift alarm shortly
    after the break, and a flat-noise series must raise none."""
    import numpy as np
    import pandas as pd

    from portofolio_maximizer_spark.forecast.models import cusum_changepoints

    rng = np.random.default_rng(3)
    calm = rng.normal(0, 1, 100)
    shifted = rng.normal(3, 1, 40)
    lr = np.concatenate([calm, shifted])
    pdf = pd.DataFrame({"user_id": 1, "rn": range(len(lr)), "lr": lr})
    out = cusum_changepoints(spark.createDataFrame(pdf), h=3.0).toPandas()
    ups = out[out.direction == 1]
    assert len(ups) >= 1
    assert ups.rn.min() >= 100  # no alarm before the break
    assert ups.rn.min() <= 110  # detected within ~10 bars

    # alarms in the calm pre-break segment must be rare (CUSUM standardizes
    # against its own history, so iid noise fires only occasionally)
    pre_break = out[out.rn < 100]
    assert len(pre_break) <= 3


def test_ar_fanout_matches_intask_and_fans_per_candidate(spark):
    """The (key, order) candidate fan-out must produce byte-identical
    output to the in-task grid, and the candidate table must contain one
    independent fit per (key, order) — the unit of parallelism."""
    rng = np.random.default_rng(11)
    frames = []
    for uid, phi in [(1, 0.7), (2, -0.4), (3, 0.2)]:
        n = 120
        x = np.zeros(n)
        for t in range(1, n):
            x[t] = 1.0 + phi * x[t - 1] + rng.normal(0, 0.2)
        frames.append(pd.DataFrame({"user_id": uid, "rn": np.arange(n), "value": x}))
    sdf = spark.createDataFrame(pd.concat(frames))

    from portofolio_maximizer_spark.forecast import (
        ar_candidate_fits,
        ar_grid_forecast,
        ar_grid_forecast_fanout,
    )

    cand = ar_candidate_fits(sdf).toPandas()
    # one fit (5 forecast rows) per (key, order) candidate: 3 keys × 3 orders
    combos = cand.groupby(["user_id", "p"]).size()
    assert len(combos) == 9
    assert (combos == 5).all()

    intask = (
        ar_grid_forecast(sdf).toPandas()
        .sort_values(["user_id", "horizon_step"]).reset_index(drop=True)
    )
    fanout = (
        ar_grid_forecast_fanout(sdf).toPandas()
        .sort_values(["user_id", "horizon_step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(intask, fanout, check_exact=True)


def test_ar_fanout_plan_groups_by_candidate(spark):
    """The fit stage's grouping key must include the order column — i.e.
    candidates, not just keys, are the distributed unit."""
    pdf = pd.DataFrame({"user_id": 1, "rn": range(40), "value": np.sin(np.arange(40))})
    from portofolio_maximizer_spark.forecast import ar_candidate_fits

    plan = ar_candidate_fits(spark.createDataFrame(pdf))._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan
    # grouping expressions carry both user_id and the candidate order p
    import re
    seg = plan[plan.index("FlatMapGroupsInPandas"):].split("\n")[0]
    assert "user_id" in seg and re.search(r"\bp\b|p#", seg)
