"""Curate a document corpus and publish it as a versioned table —
the end-to-end 'make a training-data release' job:

    plans/curation.py:curate      normalize -> lang -> quality ->
                                  exact dedup -> LSH near-dup -> chunks
    sources/versioned.py          write-audit-publish: the snapshot is
                                  validated BEFORE the atomic pointer
                                  move; readers never see a bad release

Usage: python examples/curate_and_publish.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensor_time_series_pyspark_spark.plans.curation import (
    CurationConfig,
    curate,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.sources.versioned import (
    current_version,
    read_latest,
    write_version,
)


def main(sf_dir: str, out_dir: str) -> int:
    spark = get_spark("curate_and_publish")
    docs = read_table(spark, sf_dir, "documents")
    cfg = CurationConfig(lang_from_column="lang", keep_langs=("en", "de"))
    chunks, survivors, funnel, weights = curate(docs, cfg)

    def audit(df):
        # release gate: non-empty, schema carries the chunk contract
        n = df.count()
        if n == 0:
            raise ValueError("refusing to publish an empty release")
        required = {"id", "chunk_id", "chunk_text", "n_tokens"}
        if not required <= set(df.columns):
            raise ValueError(f"schema missing {required - set(df.columns)}")

    version = write_version(chunks, out_dir, validate=audit)
    funnel.show()
    print(
        f"published v{version} ({read_latest(spark, out_dir).count()} chunks), "
        f"current={current_version(spark, out_dir)}"
    )
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_release"
    raise SystemExit(main(sf, out))
