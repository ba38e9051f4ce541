"""Durable staging seam (round-6 VERDICT item 3): the pipeline's
corpus-proportional materializations can land in parquet instead of
executor memory, and both shapes are value-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce__spark.operators.dedup import lsh_near_duplicate_pairs
from mapreduce__spark.plans.tier2 import JACCARD_THRESHOLD, training_data_pipeline_full
from mapreduce__spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lsh_pairs_staged_equals_memory(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    mem = lsh_near_duplicate_pairs(docs, JACCARD_THRESHOLD)
    staged = lsh_near_duplicate_pairs(
        docs, JACCARD_THRESHOLD, staging_dir=str(tmp_path / "lsh")
    )
    assert _rows(mem) == _rows(staged)
    # the durable shape actually wrote the signature table
    assert os.path.isdir(tmp_path / "lsh" / "lsh_signatures")


def test_pipeline_full_staged_equals_memory(spark, sf_small, tmp_path):
    mem = training_data_pipeline_full(spark, sf_small)
    staged = training_data_pipeline_full(
        spark, sf_small, staging_dir=str(tmp_path / "stage")
    )
    assert _rows(mem) == _rows(staged)
    # all three corpus-proportional intermediates went durable
    for name in ("scrubbed", "decontaminated", "lsh_signatures"):
        assert os.path.isdir(tmp_path / "stage" / name), name


def test_staged_intermediate_is_readable_deliverable(spark, sf_small, tmp_path):
    """The scrubbed corpus is a deliverable in its own right: the staged
    parquet must round-trip as a standalone table with the scrub applied
    (same doc_ids as the source, text column present)."""
    training_data_pipeline_full(spark, sf_small, staging_dir=str(tmp_path))
    scrubbed = spark.read.parquet(str(tmp_path / "scrubbed"))
    assert scrubbed.columns == ["doc_id", "text"]
    src_n = load_table(spark, sf_small, "documents").count()
    assert scrubbed.count() == src_n
    assert scrubbed.where(F.col("text").isNull()).count() == 0


def test_bounded_collect_enforces_declared_bound(spark):
    """The shared bounded-driver-action seam (round-7 verdict item 8):
    within-bound relations collect normally; an over-bound relation
    raises instead of materializing on the driver."""
    import pytest

    from mapreduce__spark.operators.staging import bounded_collect

    small = spark.range(3)
    assert len(bounded_collect(small, 3, "three rows")) == 3
    assert len(bounded_collect(small, 10, "slack")) == 3
    with pytest.raises(ValueError, match="declared .*bound of 2"):
        bounded_collect(spark.range(50), 2, "too big")
