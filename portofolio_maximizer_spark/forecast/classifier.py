"""F13 — directional classifier as an MLlib pipeline.

Reference: `forcester_ts/directional_classifier.py:54-154` +
`scripts/train_directional_classifier.py` — LogisticRegression with
walk-forward CV and calibration. Here: MLlib ``LogisticRegression``
(L-BFGS, deterministic) over the embeddings table, with a hash-based
deterministic train/test split (no ``randomSplit`` — its row sampling is
partition-order dependent, which would break run-to-run hashing).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_eval_classifier(
    emb: DataFrame,
    label_col: str = "label",
    folds: int = 5,
    test_fold: int = 0,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> DataFrame:
    """Train multinomial logistic regression on ``embedding`` → ``label``
    and return a one-row metrics DataFrame (accuracy, n_train, n_test).

    Split is ``vec_id % folds`` — deterministic and reproducible across
    cluster layouts, the F9/SURVEY §7.3-style leak-free fold discipline.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    data = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
        (F.col("vec_id") % folds == test_fold).alias("is_test"),
    )
    train = data.filter(~F.col("is_test"))
    test = data.filter(F.col("is_test"))
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, family="multinomial"
    )
    model = lr.fit(train)
    hit = (F.col("prediction") == F.col("label")).cast("double")
    train_acc = model.transform(train).agg(F.round(F.avg(hit), 6)).collect()[0][0]
    pred = model.transform(test)
    return pred.agg(
        F.round(F.avg(hit), 6).alias("accuracy"),
        F.lit(train_acc).alias("train_accuracy"),
        F.count(F.lit(1)).alias("n_test"),
        F.lit(train.count()).alias("n_train"),
        F.lit(10).alias("n_classes"),
    )


def _confidence_correct(pred: DataFrame) -> DataFrame:
    """Per-row (confidence, correct) from an MLlib prediction frame:
    confidence = max class probability, correct = argmax hit."""
    from pyspark.ml.functions import vector_to_array

    conf = F.array_max(vector_to_array(F.col("probability")))
    return pred.select(
        conf.alias("conf"),
        (F.col("prediction") == F.col("label")).cast("double").alias("correct"),
    )


def expected_calibration_error(
    scored: DataFrame, conf_col: str = "conf", correct_col: str = "correct",
    n_bins: int = 15,
) -> float:
    """15-bin ECE (Guo et al. 2017; the reference publishes its gate as
    ECE=0.075, `/root/reference/README.md:150,250`):

        ECE = Σ_b (n_b / N) · |acc_b − conf_b|

    One groupBy over equal-width confidence bins — a bounded aggregate
    (≤ n_bins rows), so the final reduce is driver-side by design.
    """
    binned = (
        scored.withColumn(
            "_bin",
            F.least(
                F.floor(F.col(conf_col) * n_bins).cast("int"), F.lit(n_bins - 1)
            ),
        )
        .groupBy("_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(correct_col).alias("acc"),
            F.avg(conf_col).alias("avg_conf"),
        )
    )
    row = binned.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("acc") - F.col("avg_conf")))
            / F.sum("n")
        ).alias("ece")
    ).collect()[0]
    return float(row["ece"])


def fit_platt(
    scored: DataFrame, conf_col: str = "conf", correct_col: str = "correct",
    max_iter: int = 100, reg_param: float = 1e-6,
) -> tuple[float, float]:
    """Platt scaling (Platt 1999; reference
    `forcester_ts/directional_classifier.py:54-154` calibration stage):
    fit P(correct | s) = σ(a·s + b) on a held-out calibration fold, where
    s = logit(confidence). Distributed MLE via MLlib binary logistic
    regression with a single feature and a TINY ridge (1e-6): on a
    completely separable or single-class calibration fold (plausible on a
    small fold of a memorized train set) the unregularized MLE diverges
    and MLlib returns huge coefficients that make downstream ECE
    arbitrarily bad. Degenerate folds (one class, or a still-exploded
    fit) fall back to the identity calibration (a=1, b=0).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    eps = 1e-6
    s = F.col(conf_col)
    s = F.least(F.greatest(s, F.lit(eps)), F.lit(1.0 - eps))
    logit = F.log(s / (1 - s))
    data = scored.select(
        array_to_vector(F.array(logit)).alias("features"),
        F.col(correct_col).alias("label"),
    )
    n_classes = data.select("label").distinct().count()
    if n_classes < 2:
        return 1.0, 0.0
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, family="binomial"
    )
    m = lr.fit(data)
    a, b = float(m.coefficients[0]), float(m.intercept)
    if not (math.isfinite(a) and math.isfinite(b)) or abs(a) > 50 or abs(b) > 50:
        return 1.0, 0.0
    return a, b


def platt_confidence(conf: F.Column, a: float, b: float) -> F.Column:
    """Apply fitted Platt parameters to a confidence column (JVM-side)."""
    eps = 1e-6
    s = F.least(F.greatest(conf, F.lit(eps)), F.lit(1.0 - eps))
    logit = F.log(s / (1 - s))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(a) * logit + F.lit(b))))


def calibrated_classifier_scored(
    emb: DataFrame,
    label_col: str = "label",
    folds: int = 5,
    test_fold: int = 0,
    calib_fold: int = 1,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> DataFrame:
    """The STAGEABLE half of F13: fit LR, Platt-calibrate, and return the
    test-fold (conf, correct) rows with the fit's scalar outputs as
    constant columns — everything ``classifier_metrics_from_scored`` (and
    the SQL oracle) needs to re-derive the evaluation metrics. Splitting
    here lets the expensive fits run once per (code version, dataset)
    behind the stage cache."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    fold = F.col("vec_id") % folds
    data = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
        fold.alias("fold"),
    )
    train = data.filter(~F.col("fold").isin(test_fold, calib_fold))
    calib = data.filter(F.col("fold") == calib_fold)
    test = data.filter(F.col("fold") == test_fold)
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param, family="multinomial")
    model = lr.fit(train)
    hit = (F.col("prediction") == F.col("label")).cast("double")
    train_acc = model.transform(train).agg(F.round(F.avg(hit), 6)).collect()[0][0]
    a, b = fit_platt(_confidence_correct(model.transform(calib)))
    return _confidence_correct(model.transform(test)).select(
        "conf",
        "correct",
        F.lit(float(a)).alias("platt_a"),
        F.lit(float(b)).alias("platt_b"),
        F.lit(float(train_acc)).alias("train_accuracy"),
        F.lit(train.count()).alias("n_train"),
        F.lit(calib.count()).alias("n_calib"),
    )


def _ece_column_agg(scored: DataFrame, conf, name: str, n_bins: int) -> DataFrame:
    """One-row ECE aggregate as a lazy plan (no driver collect)."""
    binned = (
        scored.select(conf.alias("_c"), "correct")
        .withColumn(
            "_bin",
            F.least(F.floor(F.col("_c") * n_bins).cast("int"), F.lit(n_bins - 1)),
        )
        .groupBy("_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("correct").alias("acc"),
            F.avg("_c").alias("avg_conf"),
        )
    )
    return binned.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("acc") - F.col("avg_conf")))
            / F.sum("n")
        ).alias(name)
    )


def classifier_metrics_from_scored(scored: DataFrame, n_bins: int = 15) -> DataFrame:
    """Derive the F13 metrics row from a (staged) scored frame — pure
    column algebra over a KB-scale input, including the Platt
    re-application with the staged (a, b) as constant columns."""
    recal = (
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.col("platt_a")
                    * F.log(
                        F.least(F.greatest(F.col("conf"), F.lit(1e-6)), F.lit(1.0 - 1e-6))
                        / (
                            1
                            - F.least(
                                F.greatest(F.col("conf"), F.lit(1e-6)),
                                F.lit(1.0 - 1e-6),
                            )
                        )
                    )
                    + F.col("platt_b")
                )
            )
        )
    )
    base = scored.agg(
        F.round(F.avg("correct"), 6).alias("accuracy"),
        F.round(F.any_value("train_accuracy"), 6).alias("train_accuracy"),
        F.count(F.lit(1)).alias("n_test"),
        F.any_value("n_train").alias("n_train"),
        F.any_value("n_calib").alias("n_calib"),
        F.round(F.any_value("platt_a"), 6).alias("platt_a"),
        F.round(F.any_value("platt_b"), 6).alias("platt_b"),
    )
    e_raw = _ece_column_agg(scored, F.col("conf"), "_e_raw", n_bins)
    e_cal = _ece_column_agg(scored, recal, "_e_cal", n_bins)
    return (
        base.crossJoin(e_raw)
        .crossJoin(e_cal)
        .select(
            "accuracy",
            "train_accuracy",
            "n_test",
            "n_train",
            "n_calib",
            F.round(F.col("_e_raw"), 6).alias("ece_uncalibrated"),
            F.round(F.col("_e_cal"), 6).alias("ece_platt"),
            "platt_a",
            "platt_b",
        )
    )


def train_eval_calibrated_classifier(
    emb: DataFrame,
    label_col: str = "label",
    folds: int = 5,
    test_fold: int = 0,
    calib_fold: int = 1,
    max_iter: int = 50,
    reg_param: float = 0.01,
    n_bins: int = 15,
    stage_fn=None,
) -> DataFrame:
    """F13 with the reference's calibration stage: train on folds other
    than {test, calib}, Platt-calibrate on the calib fold, report
    accuracy + 15-bin ECE before/after calibration on the test fold
    (reference publishes DA **and** ECE as its gate,
    `/root/reference/README.md:150,250`). One-call composition of
    ``calibrated_classifier_scored`` + ``classifier_metrics_from_scored``
    (the query layer stages the scored half through the cache instead)."""
    scored = calibrated_classifier_scored(
        emb, label_col, folds, test_fold, calib_fold, max_iter, reg_param
    ).localCheckpoint(eager=True)
    if stage_fn is not None:
        stage_fn(scored)
    return classifier_metrics_from_scored(scored, n_bins=n_bins)
