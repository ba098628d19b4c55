"""User-extension surface: callable settings keys (cloudpickled through
Spark closures, reference extraction.py:340-343 / settings.py:109-129).

Callables are defined inside the tests (closure-style, like notebook user
code) so cloudpickle ships them by value; module-level user functions ship
via --py-files exactly like any other code.
"""

import numpy as np
import pytest


def test_callable_simple_kernel(spark):
    from tsfresh_spark.extract import extract_features_tokens

    def my_peak_to_peak(x):
        return np.max(x) - np.min(x)

    df = spark.createDataFrame(
        [("d1", [1, 5, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    out = extract_features_tokens(df, {my_peak_to_peak: None}).toPandas()
    assert out.variable.tolist() == ["web__my_peak_to_peak"]
    assert out.value.tolist() == [4.0]


def test_callable_with_params_and_combiner(spark):
    from tsfresh_spark.extract import extract_features_tokens

    def my_combiner(x, param):
        return [(f"p_{cfg['p']}", float(np.sum(x) * cfg["p"])) for cfg in param]

    my_combiner.fctype = "combiner"

    df = spark.createDataFrame(
        [("d1", [1, 2, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    out = (
        extract_features_tokens(df, {my_combiner: [{"p": 2}, {"p": 10}]})
        .toPandas()
        .set_index("variable")
    )
    assert out.loc["web__my_combiner__p_2", "value"] == 12.0
    assert out.loc["web__my_combiner__p_10", "value"] == 60.0


def test_mixed_builtin_and_custom(spark):
    from tsfresh_spark.extract import extract_features_tokens

    def my_peak_to_peak(x):
        return np.max(x) - np.min(x)

    df = spark.createDataFrame(
        [("d1", [4, 4, 4], "web")], "doc_id string, tokens array<int>, source string"
    )
    out = extract_features_tokens(
        df, {"mean": None, my_peak_to_peak: None}
    ).toPandas()
    got = dict(zip(out.variable, out.value))
    assert got == {"web__mean": 4.0, "web__my_peak_to_peak": 0.0}
