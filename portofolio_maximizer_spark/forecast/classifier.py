"""F13 — directional classifier as an MLlib pipeline.

Reference: `forcester_ts/directional_classifier.py:54-154` +
`scripts/train_directional_classifier.py` — LogisticRegression with
walk-forward CV and calibration. Here: MLlib ``LogisticRegression``
(L-BFGS, deterministic) over the embeddings table, with a hash-based
deterministic train/test split (no ``randomSplit`` — its row sampling is
partition-order dependent, which would break run-to-run hashing).
"""

from __future__ import annotations

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
