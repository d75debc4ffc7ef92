"""pyspark.ml pipelines mirroring the reference's ML surface
(SURVEY.md §2.10 M1-M9), with the bugs fixed: temporal split utility
(P5), SEEDED randomSplit (§8 bug 7), StringIndexer fit inside the
Pipeline (not eagerly on train before it, sensor_data_classification.py:52),
and a working SQLTransformer stage (the reference's is a parse error,
§8 bug 3).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import MultilayerPerceptronClassifier
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import IndexToString, SQLTransformer, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_split(
    df: DataFrame, ts_col: str, cutoff: datetime | str, cache: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Leak-free train/test split on event time (reference P5 idiom:
    ``cond`` and ``~cond``, sensor_data_classification.py:30-32).

    ``cache=True`` persists both halves — right before an iterative
    fit (MLP/GBT rescan the train set every iteration; reference L2,
    sensor_data_classification.py:42-43)."""
    cond = F.col(ts_col) < F.lit(cutoff)
    train, test = df.where(cond), df.where(~cond)
    if cache:
        train, test = train.cache(), test.cache()
    return train, test


def classification_pipeline(
    feature_cols: Sequence[str],
    label_col: str,
    hidden: int = 20,
    n_classes: int | None = None,
    seed: int = 42,
    max_iter: int = 50,
) -> Pipeline:
    """MLP classifier pipeline: assemble → index label → MLP → decode
    prediction (reference M1-M3+M5+M7,
    sensor_data_classification.py:50-57). Layers [n_features, hidden,
    n_classes] mirror the reference's [4, 20, 4]."""
    assembler = VectorAssembler(inputCols=list(feature_cols), outputCol="features")
    indexer = StringIndexer(inputCol=label_col, outputCol="label", handleInvalid="keep")
    mlp = MultilayerPerceptronClassifier(
        layers=[len(feature_cols), hidden, (n_classes or 2) + 1],  # +1: 'keep' bucket
        seed=seed,
        maxIter=max_iter,
        featuresCol="features",
        labelCol="label",
    )
    return Pipeline(stages=[assembler, indexer, mlp])


def decode_predictions(model: PipelineModel, predictions: DataFrame) -> DataFrame:
    """IndexToString with the FITTED indexer's labels (reference M3).
    MLP predictions carry no label metadata, so the decoder needs the
    labels passed explicitly — inside the Pipeline it throws."""
    labels = model.stages[1].labelsArray[0]
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=list(labels) + ["__unseen__"]
    )
    return decoder.transform(predictions)


def regression_pipeline(
    feature_cols: Sequence[str],
    label_col: str,
    seed: int = 42,
    max_iter: int = 20,
    project_sql: str | None = None,
) -> Pipeline:
    """GBT regression pipeline (reference M1+M4+M6+M7,
    sensor_data_regression.py:62-78). ``project_sql`` adds the
    SQLTransformer stage the reference intended (sensor_data_train.py:48-51,
    with the missing-space bug fixed by taking a whole statement)."""
    stages = []
    if project_sql:
        stages.append(SQLTransformer(statement=project_sql))
    stages.append(VectorAssembler(inputCols=list(feature_cols), outputCol="features"))
    stages.append(
        GBTRegressor(
            featuresCol="features", labelCol=label_col, seed=seed, maxIter=max_iter
        )
    )
    return Pipeline(stages=stages)


def evaluate_classifier(predictions: DataFrame, metric: str = "f1") -> float:
    return MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName=metric
    ).evaluate(predictions)


def evaluate_regression(predictions: DataFrame, label_col: str, metric: str = "rmse") -> float:
    return RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName=metric
    ).evaluate(predictions)


def feature_importances(model: PipelineModel) -> list[float]:
    """GBT featureImportances (reference M9, sensor_data_regression.py:88)."""
    return list(model.stages[-1].featureImportances.toArray())


def fpgrowth_itemsets(
    baskets: DataFrame,
    items_col: str,
    min_support: float = 0.01,
    max_size: int | None = None,
):
    """Frequent-itemset mining via MLlib FPGrowth — the scale path for
    market-basket analysis (operators/analytics.py:market_basket_pairs
    and the Apriori-style q146 lattice are the exact-SQL twins for
    pairs/triples; FPGrowth handles arbitrary itemset sizes with two
    passes over the baskets and no candidate explosion).

    FPGrowth counts are EXACT (the FP-tree is a lossless compression),
    so size-limited output is differential-testable against plain SQL
    counts — that is q196's oracle. Itemsets are returned as a sorted
    '|'-joined string (engine-friendly key; array columns don't hash
    portably in comparisons) plus the basket frequency.

    Output: (itemset, size, freq).
    """
    from pyspark.ml.fpm import FPGrowth

    fp = FPGrowth(itemsCol=items_col, minSupport=min_support, minConfidence=0.5)
    model = fp.fit(baskets)
    out = model.freqItemsets.select(
        F.array_join(F.array_sort("items"), "|").alias("itemset"),
        F.size("items").alias("size"),
        F.col("freq"),
    )
    if max_size is not None:
        out = out.where(F.col("size") <= max_size)
    return out
