"""Structured Streaming extraction: the windowed stream must produce exactly
the features the batch engine computes on the same data."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.extract import compute_series_features
from tsfresh_spark.settings import minimal_settings
from tsfresh_spark.streaming.stream_extract import windowed_feature_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src"))
    rng = np.random.RandomState(3)
    rows = []
    for doc, source in [("d1", "web"), ("d2", "code")]:
        for i in range(240):
            rows.append(
                (
                    doc,
                    source,
                    T0 + dt.timedelta(seconds=int(i * 37 + rng.randint(0, 9))),
                    float(rng.randint(0, 100)),
                )
            )
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "ts", "value"])
    spark.createDataFrame(pdf).repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_windowed_stream_matches_batch(spark, event_files):
    schema = "doc_id string, source string, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(event_files)
    out = windowed_feature_stream(
        stream,
        minimal_settings(),
        id_cols=["doc_id", "source"],
        window="30 minutes",
        watermark="0 seconds",
    )
    query = (
        out.writeStream.format("memory")
        .queryName("feat_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = spark.sql("select * from feat_stream").toPandas()
    assert len(got) > 0

    batch = spark.read.parquet(event_files).toPandas()
    batch["window_start"] = batch.ts.dt.floor("30min")
    max_event = batch.ts.max()
    checked = 0
    for (doc, source, ws), grp in batch.groupby(["doc_id", "source", "window_start"]):
        if ws + pd.Timedelta("30min") > max_event:
            # the still-open final window is correctly NOT emitted in
            # append mode (watermark never passes its end)
            assert got[(got.doc_id == doc) & (got.window_start == ws)].empty
            continue
        grp = grp.sort_values("ts")
        want = dict(
            compute_series_features(
                grp.value.values, source, minimal_settings()
            )
        )
        row = got[
            (got.doc_id == doc)
            & (got.source == source)
            & (got.window_start == ws)
        ]
        assert len(row) == 1, (doc, source, ws)
        features = dict(row.features.iloc[0])
        assert features == want
        assert row.n_points.iloc[0] == len(grp)
        checked += 1
    assert checked >= 4
