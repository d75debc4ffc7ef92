"""MLP event-profile classification (reference
sensor_data_classification.py parity): wide features → seeded pipeline
→ f1 on a leak-free temporal split."""

from __future__ import annotations

import argparse

from sensor_time_series_pyspark_spark.ml import (
    classification_pipeline,
    decode_predictions,
    evaluate_classifier,
    temporal_split,
)
from sensor_time_series_pyspark_spark.plans import sensor_etl
from sensor_time_series_pyspark_spark.session import get_spark

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def main(sf_dir: str, cutoff: str = "2024-01-25") -> int:
    spark = get_spark("example-classify")
    wide = sensor_etl(spark, sf_dir)
    train, test = temporal_split(wide, "bucket", cutoff, cache=True)
    pipe = classification_pipeline(
        EVENT_TYPES, "n_name", hidden=20, n_classes=25, seed=42, max_iter=20
    )
    model = pipe.fit(train)
    preds = decode_predictions(model, model.transform(test))
    f1 = evaluate_classifier(preds)
    print(f"f1={f1:.4f} on {preds.count()} test rows")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir))
