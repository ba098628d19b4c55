"""Dict-of-kinds input adapter — the last ``to_tsdata`` dispatch arm
(reference data.py:294-338, dispatch at data.py:502-503), mirrored from the
reference's dict-adapter cases in
tests/units/feature_extraction/test_data.py (test_dict_tsframe,
test_with_dictionaries_two_rows, test_wrong_input dict arms)."""

import pandas as pd
import pytest

from tsfresh_spark.extract import (
    extract_features_dict,
    extract_features_long,
    union_dict_of_kinds,
)

SETTINGS = {
    "length": None,
    "sum_values": None,
    "minimum": None,
    "maximum": None,
    "mean": None,
}


def _two_row_frame(spark, with_sort: bool):
    if with_sort:
        pdf = pd.DataFrame(
            [
                {"value": 2.0, "sort": 2, "id": "id_1"},
                {"value": 1.0, "sort": 1, "id": "id_1"},
            ]
        )
    else:
        pdf = pd.DataFrame(
            [{"value": 1.0, "id": "id_1"}, {"value": 2.0, "id": "id_1"}]
        )
    return spark.createDataFrame(pdf)


def test_with_dictionaries_two_rows_sorted(spark):
    # reference test_data.py:327-344 — the same frame under two kinds,
    # sort column honored (series is [1, 2] after the sort)
    df = _two_row_frame(spark, with_sort=True)
    out = extract_features_dict(
        {"a": df, "b": df},
        SETTINGS,
        column_id="id",
        column_value="value",
        column_sort="sort",
    ).toPandas()
    assert set(out["kind"]) == {"a", "b"}
    for kind in ("a", "b"):
        sub = out[out["kind"] == kind].set_index("variable")["value"]
        assert sub[f"{kind}__length"] == 2.0
        assert sub[f"{kind}__sum_values"] == 3.0
        assert sub[f"{kind}__minimum"] == 1.0
        assert sub[f"{kind}__maximum"] == 2.0
        assert sub[f"{kind}__mean"] == 1.5


def test_with_dictionaries_two_rows_unsorted(spark):
    # reference test_data.py:345-356 — no sort column: input order stands
    df = _two_row_frame(spark, with_sort=False)
    out = extract_features_dict(
        {"a": df, "b": df},
        SETTINGS,
        column_id="id",
        column_value="value",
        column_sort=None,
    ).toPandas()
    assert len(out) == 2 * len(SETTINGS)
    sub = out[out["kind"] == "a"].set_index("variable")["value"]
    assert sub["a__sum_values"] == 3.0


def test_dict_matches_long_path(spark):
    # reference test_dict_tsframe (test_data.py:284-288): splitting a long
    # frame by kind into a dict must yield IDENTICAL features to running
    # the long path on the original frame
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 2, 2, 2, 1, 1, 2, 2],
            "kind": ["a"] * 6 + ["b"] * 4,
            "sort": [3, 1, 2, 1, 2, 3, 2, 1, 1, 2],
            "val": [11.0, 7.0, 5.0, 2.0, 9.0, 4.0, 6.0, 8.0, 3.0, 10.0],
        }
    )
    long_df = spark.createDataFrame(pdf)
    ts_dict = {
        kind: spark.createDataFrame(sub.drop(columns=["kind"]))
        for kind, sub in pdf.groupby("kind")
    }
    got = (
        extract_features_dict(
            ts_dict,
            SETTINGS,
            column_id="id",
            column_value="val",
            column_sort="sort",
        )
        .toPandas()
        .sort_values(["id", "kind", "variable"])
        .reset_index(drop=True)
    )
    want = (
        extract_features_long(
            long_df,
            SETTINGS,
            column_id="id",
            column_kind="kind",
            column_sort="sort",
            column_value="val",
        )
        .toPandas()
        .sort_values(["id", "kind", "variable"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_invalid_kind_names(spark):
    # reference _check_colname (data.py:124-146): keys ending in '_' or
    # containing '__' collide with the from_columns parser
    df = _two_row_frame(spark, with_sort=False)
    with pytest.raises(ValueError, match="end with '_'"):
        union_dict_of_kinds({"a_": df}, column_id="id", column_value="value")
    with pytest.raises(ValueError, match="contain '__'"):
        union_dict_of_kinds({"a__b": df}, column_id="id", column_value="value")


def test_missing_columns_and_empty_dict(spark):
    # reference test_wrong_input dict arms (test_data.py:500-519)
    df = _two_row_frame(spark, with_sort=False)
    with pytest.raises(ValueError, match="missing"):
        union_dict_of_kinds({"a": df}, column_id="id", column_value="nope")
    with pytest.raises(ValueError, match="missing"):
        union_dict_of_kinds(
            {"a": df}, column_id="id", column_value="value", column_sort="sort"
        )
    with pytest.raises(ValueError, match="at least one kind"):
        union_dict_of_kinds({}, column_id="id", column_value="value")
    with pytest.raises(ValueError, match="required"):
        extract_features_dict(
            {"a": df}, SETTINGS, column_id=None, column_value="value"
        )
    with pytest.raises(ValueError, match="collides"):
        union_dict_of_kinds(
            {"a": df}, column_id="id", column_value="value", column_kind="id"
        )
