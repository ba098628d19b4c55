"""Feature extraction operators.

Two physical strategies, both Arrow-batched (never per-row Python):

* :func:`extract_features_tokens` — for the engine's primary input shape
  (BASELINE.json input_hint): one row already holds a whole series as an
  ``array<int>`` column, so extraction is a **shuffle-free** ``mapInPandas``
  — a narrow transformation that scales linearly with partitions and never
  materializes a grouped shuffle.  This is the 100-TB path.

* :func:`extract_features_long` — for the canonical long format
  ``(id, kind, sort, value)``: ``groupBy(id, kind).applyInPandas`` with the
  per-group sort applied inside the UDF.  Same physical plan as the
  reference's own Spark binding
  (/root/reference/tsfresh/convenience/bindings.py:164-265), generalized.

The per-series evaluation loop mirrors ``_do_extraction_on_chunk``
(/root/reference/tsfresh/feature_extraction/extraction.py:308-386): simple
kernels are called once per parameter set, combiner kernels once per
parameter list (sharing expensive intermediates), names follow the
``kind__calculator__params`` grammar.
"""

from __future__ import annotations

import warnings
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsfresh_spark.kernels import KERNELS, KernelInfo
from tsfresh_spark.naming import encode_parameters


def _resolve_kernel(name_or_func) -> tuple[str, KernelInfo]:
    """Settings keys may be registry names or user callables (transported by
    cloudpickle, exactly how PySpark ships closures; cf. reference
    settings.py:109-129, extraction.py:340-343)."""
    if callable(name_or_func):
        info = KernelInfo(
            func=name_or_func,
            fctype=getattr(name_or_func, "fctype", "simple"),
            input=getattr(name_or_func, "input", "numpy"),
        )
        return name_or_func.__name__, info
    if name_or_func in KERNELS:
        return name_or_func, KERNELS[name_or_func]
    raise ValueError(f"unknown feature calculator {name_or_func!r}")


def _validate_settings(settings: dict, kind_to_settings: dict | None = None) -> None:
    """Fail fast on the driver for unknown calculator names instead of
    surfacing them as executor-side PythonExceptions."""
    for key in settings:
        _resolve_kernel(key)
    for sub in (kind_to_settings or {}).values():
        for key in sub:
            _resolve_kernel(key)


def _batched_simple() -> dict:
    """Grid-sharing fast paths for 'simple' kernels whose parameter grids
    share expensive intermediates (values identical to per-param calls)."""
    from tsfresh_spark.kernels.entropy import (
        approximate_entropy_batch,
        fourier_entropy_batch,
    )
    from tsfresh_spark.kernels.ordered import change_quantiles_batch
    from tsfresh_spark.kernels.statistics import (
        autocorrelation_batch,
        large_standard_deviation_batch,
        quantile_batch,
        ratio_beyond_r_sigma_batch,
    )

    return {
        "change_quantiles": change_quantiles_batch,
        "fourier_entropy": fourier_entropy_batch,
        "approximate_entropy": approximate_entropy_batch,
        "quantile": quantile_batch,
        "ratio_beyond_r_sigma": ratio_beyond_r_sigma_batch,
        "large_standard_deviation": large_standard_deviation_batch,
        "autocorrelation": autocorrelation_batch,
    }


_BATCHED_SIMPLE = _batched_simple()


class _CompiledPlan:
    """Per-(settings, kind) execution plan: kernel lookups and simple-path
    feature-name strings resolved once, reused for every series in the
    Arrow batch (names for ~800 features would otherwise be re-encoded per
    series)."""

    __slots__ = ("entries",)

    def __init__(self, settings: dict, kind: str):
        self.entries = []
        for key, parameter_list in settings.items():
            name, info = _resolve_kernel(key)
            if not info.available:
                continue
            prefix = f"{kind}__{name}"
            batched = _BATCHED_SIMPLE.get(name) if not callable(key) else None
            if info.fctype != "combiner" and parameter_list and batched is None:
                names = [
                    f"{prefix}__{encode_parameters(p)}" for p in parameter_list
                ]
            else:
                names = None
            self.entries.append(
                (name, info, parameter_list, prefix, names, batched)
            )


_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 64  # bound: ad-hoc settings dicts must not pin memory


def _get_plan(settings: dict, kind: str) -> _CompiledPlan:
    """LRU: hits move to the end, eviction takes the least-recently-used —
    a session's primary settings plan survives any number of ad-hoc dicts
    cycling through (FIFO would evict the hottest, oldest-inserted entry)."""
    key = (id(settings), kind)
    hit = _PLAN_CACHE.pop(key, None)
    if hit is None or hit[0] is not settings:
        hit = (settings, _CompiledPlan(settings, kind))
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = hit
    return hit[1]


def compute_series_features(
    values: np.ndarray,
    kind: str,
    settings: dict,
    timestamps: pd.Index | None = None,
    show_warnings: bool = False,
) -> Iterator[tuple[str, float]]:
    """Evaluate every configured kernel on one series; yields
    ``(feature_name, value)`` with values coerced to float64."""
    plan = _get_plan(settings, kind)
    try:
        yield from _run_plan(plan, values, timestamps, show_warnings)
    finally:
        # sample_entropy/ApEn share Chebyshev matrices through a one-slot
        # cache; once this series is done the slot would otherwise pin up to
        # ~66 MB per reused python worker between jobs.  The Welch-PSD
        # (fourier_entropy / spkt_welch_density) and rfft (fft_coefficient /
        # fft_aggregated) one-slot shares are cleared for the same reason
        # (they pin the series bytes as their keys).
        from tsfresh_spark.kernels.entropy import clear_cheb_cache
        from tsfresh_spark.kernels.helpers import clear_psd_cache
        from tsfresh_spark.kernels.spectral import clear_rfft_cache

        clear_cheb_cache()
        clear_psd_cache()
        clear_rfft_cache()


def _run_plan(plan, values, timestamps, show_warnings):
    series = None  # built lazily, only if some kernel needs pandas input
    with warnings.catch_warnings():
        warnings.simplefilter("default" if show_warnings else "ignore")
        for name, info, parameter_list, prefix, names, batched in plan.entries:
            if info.requires_timestamps and not isinstance(
                timestamps, pd.DatetimeIndex
            ):
                # reference warns and skips when the index type is wrong
                # (extraction.py:347-358)
                continue
            if info.input == "series":
                if series is None:
                    series = pd.Series(values, index=timestamps)
                x = series
            else:
                x = values
            func = info.func
            if info.fctype == "combiner":
                for suffix, value in func(x, param=parameter_list):
                    yield f"{prefix}__{suffix}", float(value)
            elif parameter_list:
                if batched is not None:
                    for suffix, value in batched(x, parameter_list):
                        yield f"{prefix}__{suffix}", float(value)
                else:
                    for p, fname in zip(parameter_list, names):
                        yield fname, float(func(x, **p))
            else:
                yield prefix, float(func(x))


# ---------------------------------------------------------------------------
# tokens-table path: (doc_id, tokens, n_tok, source) — shuffle-free
# ---------------------------------------------------------------------------


def extract_features_tokens(
    df: DataFrame,
    settings: dict,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    kind_col: str = "source",
    kind_to_settings: dict | None = None,
    output: str = "long",
    engine: str = "kernels",
) -> DataFrame:
    """Extract features from pre-grouped token-array rows via ``mapInPandas``.

    No shuffle: each input row is a complete series, so this is a narrow
    map over Arrow batches.  ``output`` is ``"long"`` (one row per feature —
    id, kind, variable, value) or ``"map"`` (one row per series with a
    ``map<string,double>`` of features, avoiding a 794-column wide plan; cf.
    the reference's own advice in docs/text/large_data.rst:33-38).

    ``engine="hybrid"`` evaluates the SQL-coverable calculator subset as
    Catalyst expressions (zero Python) and routes only the remainder through
    the Arrow UDF — bit-identical to the kernel path on integer tokens,
    ≤1e-12 relative otherwise; still shuffle-free.  **Measured caveat**
    (BASELINE.md): Spark's higher-order array functions evaluate
    per-element without cross-feature subexpression sharing, so on 1k-token
    arrays the Arrow-batched numpy kernels are faster (minimal set: 3.9M
    vs 2.9M tokens/s; sort-heavy features far worse).  Keep the default
    ``kernels`` engine unless the cluster cannot run python workers.
    """
    if output not in ("long", "map"):
        raise ValueError("output must be 'long' or 'map'")
    if engine not in ("kernels", "hybrid"):
        raise ValueError("engine must be 'kernels' or 'hybrid'")
    _validate_settings(settings, kind_to_settings)
    if engine == "hybrid":
        return _extract_tokens_hybrid(
            df,
            settings,
            id_col=id_col,
            tokens_col=tokens_col,
            kind_col=kind_col,
            kind_to_settings=kind_to_settings,
            output=output,
        )

    id_field = df.schema[id_col]
    id_type = id_field.dataType.simpleString()

    # cap the long-form buffer: with ~800 features/series a full Arrow batch
    # would hold millions of rows before yielding
    FLUSH_ROWS = 200_000

    def run_batch(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        ids, kinds, variables, values = [], [], [], []
        map_rows = []

        def flush_long():
            out = pd.DataFrame(
                {
                    id_col: ids,
                    kind_col: kinds,
                    "variable": variables,
                    "value": np.asarray(values, dtype=np.float64),
                }
            )
            ids.clear(), kinds.clear(), variables.clear(), values.clear()
            return out

        for doc_id, tokens, kind in zip(
            pdf[id_col].values, pdf[tokens_col].values, pdf[kind_col].values
        ):
            # pandas would surface an integer value column as int64 — match it
            x = np.asarray(tokens, dtype=np.int64)
            fc = (
                kind_to_settings.get(kind, settings)
                if kind_to_settings
                else settings
            )
            if output == "long":
                for feature, value in compute_series_features(x, str(kind), fc):
                    ids.append(doc_id)
                    kinds.append(kind)
                    variables.append(feature)
                    values.append(value)
                if len(ids) >= FLUSH_ROWS:
                    yield flush_long()
            else:
                feats = dict(compute_series_features(x, str(kind), fc))
                map_rows.append((doc_id, kind, feats))
        if output == "long":
            if ids:
                yield flush_long()
        else:
            yield pd.DataFrame(
                map_rows, columns=[id_col, kind_col, "features"]
            )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield from run_batch(pdf)

    if output == "long":
        schema = f"{id_col} {id_type}, {kind_col} string, variable string, value double"
    else:
        schema = f"{id_col} {id_type}, {kind_col} string, features map<string,double>"
    return df.select(id_col, tokens_col, kind_col).mapInPandas(run, schema=schema)


def _rest_map_udf(settings: dict):
    """Scalar Arrow UDF computing the kernel-remainder feature map per row —
    lets the hybrid map output stay a single narrow projection
    (covered Catalyst map ++ remainder map), zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("map<string,double>")
    def _compute(tokens: pd.Series, kinds: pd.Series) -> pd.Series:
        out = []
        for toks, kind in zip(tokens.values, kinds.values):
            x = np.asarray(toks, dtype=np.int64)
            out.append(dict(compute_series_features(x, str(kind), settings)))
        return pd.Series(out)

    return _compute


def _extract_tokens_hybrid(
    df: DataFrame,
    settings: dict,
    *,
    id_col: str,
    tokens_col: str,
    kind_col: str,
    kind_to_settings: dict | None = None,
    output: str = "long",
) -> DataFrame:
    """Catalyst expressions for the coverable subset + kernel UDF for the
    rest.  Long output unions an exploded Catalyst branch with the kernel
    branch; map output builds ``map_from_entries(covered) ++ rest_udf`` as
    one narrow projection.  Every shape is shuffle-free.

    ``kind_to_settings`` routes each listed kind through its own expression
    split via a filtered branch per kind (filters push to the scan; the
    number of kinds is small, so the extra scans are cheap and each branch
    keeps its own fully-compiled Catalyst plan).  Caveat: each branch
    re-executes the full upstream plan of ``df`` — cheap for a bare parquet
    scan (the intended input), but if ``df`` is a derived frame
    (join/aggregation upstream) persist() or localCheckpoint() it before
    calling, or the subplan runs len(kinds)+1 times."""
    from tsfresh_spark.functions.sql_features import hybrid_plan

    if kind_to_settings:
        kinds = list(kind_to_settings)
        branches = [
            _extract_tokens_hybrid(
                df.filter(F.col(kind_col) == k),
                kind_to_settings[k],
                id_col=id_col,
                tokens_col=tokens_col,
                kind_col=kind_col,
                output=output,
            )
            for k in kinds
        ]
        branches.append(
            _extract_tokens_hybrid(
                # NULL kinds must land in the default branch too: ~isin()
                # evaluates to NULL (not true) for NULL, which would
                # silently drop those rows — the kernels engine routes them
                # through the default settings, and the engines are
                # documented bit-identical
                df.filter(
                    (~F.col(kind_col).isin(kinds)) | F.col(kind_col).isNull()
                ),
                settings,
                id_col=id_col,
                tokens_col=tokens_col,
                kind_col=kind_col,
                output=output,
            )
        )
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    covered, rest = hybrid_plan(tokens_col, settings)
    # NULL kinds: the kernels engine names features str(kind) → "None__…";
    # a bare concat(kind, '__…') would be NULL (map_from_entries then
    # rejects the null key at runtime, long output emits NULL variables)
    kind_key = F.coalesce(F.col(kind_col).cast("string"), F.lit("None"))
    if output == "map":
        feat = None
        if covered:
            feat = F.map_from_entries(
                F.array(
                    *[
                        F.struct(
                            F.concat(
                                kind_key, F.lit(f"__{suffix}")
                            ).alias("key"),
                            expr.cast("double").alias("value"),
                        )
                        for suffix, expr in covered
                    ]
                )
            )
        if rest:
            rest_map = _rest_map_udf(rest)(F.col(tokens_col), F.col(kind_col))
            feat = rest_map if feat is None else F.map_concat(feat, rest_map)
        if feat is None:
            # empty settings: mirror the kernels engine's empty feature map
            feat = F.create_map().cast("map<string,double>")
        return df.select(
            F.col(id_col), F.col(kind_col), feat.alias("features")
        )
    parts = []
    if covered:
        entries = F.array(
            *[
                F.struct(
                    F.concat(kind_key, F.lit(f"__{suffix}")).alias("variable"),
                    expr.cast("double").alias("value"),
                )
                for suffix, expr in covered
            ]
        )
        parts.append(
            df.select(
                F.col(id_col),
                F.col(kind_col),
                F.explode(entries).alias("_e"),
            ).select(
                id_col, kind_col, F.col("_e.variable"), F.col("_e.value")
            )
        )
    if rest:
        parts.append(
            extract_features_tokens(
                df,
                rest,
                id_col=id_col,
                tokens_col=tokens_col,
                kind_col=kind_col,
                output="long",
                engine="kernels",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# long-format path: (id, kind, sort, value) — grouped shuffle
# ---------------------------------------------------------------------------


def extract_features_long(
    df: DataFrame,
    settings: dict,
    *,
    column_id: str = "id",
    column_kind: str = "kind",
    column_sort: str | list[str] | None = "time",
    column_value: str = "value",
    kind_to_settings: dict | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Extract features from a long frame via
    ``groupBy(id, kind).applyInPandas`` — the reference's own Spark-binding
    plan (bindings.py:164-265) with modern ``applyInPandas``.

    The per-group sort happens inside the UDF (bindings.py:30-31); Spark
    only has to co-locate groups, never globally sort.  Output is the long
    triple frame ``(id, kind, variable, value:double)``.

    The grouping shuffle is pinned with an explicit ``repartition`` on the
    group keys (AQE honors user repartitions): grouped-map UDFs are
    compute-bound, so AQE's byte-based partition coalescing misjudges them
    badly — a few-MB long frame coalesces to 1-2 partitions and the whole
    kernel evaluation runs on 1-2 cores.  ``num_partitions`` overrides the
    default max(shuffle partitions, 2×parallelism); pass ``0`` to opt out
    and let AQE decide.
    """
    from tsfresh_spark.plans.partitioning import pin_group_partitions

    _validate_settings(settings, kind_to_settings)
    if num_partitions != 0:
        df = pin_group_partitions(
            df, column_id, column_kind, num_partitions=num_partitions
        )
    id_type = df.schema[column_id].dataType.simpleString()
    # column_sort may be a list of columns (composite order key, e.g.
    # (ts, event_id) to break timestamp ties deterministically) — pandas
    # sort_values takes either form; timestamp-index kernels only engage
    # for a single timestamp-typed sort column
    sort_is_timestamp = (
        column_sort is not None
        and isinstance(column_sort, str)
        and df.schema[column_sort].dataType.simpleString().startswith("timestamp")
    )

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if column_sort is not None:
            pdf = pdf.sort_values(column_sort)
        kind = pdf[column_kind].iloc[0]
        sample_id = pdf[column_id].iloc[0]
        values = pdf[column_value].values
        timestamps = (
            pd.DatetimeIndex(pdf[column_sort].values) if sort_is_timestamp else None
        )
        fc = kind_to_settings.get(kind, settings) if kind_to_settings else settings
        feats = list(
            compute_series_features(values, str(kind), fc, timestamps=timestamps)
        )
        return pd.DataFrame(
            {
                column_id: [sample_id] * len(feats),
                column_kind: [kind] * len(feats),
                "variable": [f for f, _ in feats],
                "value": np.asarray([v for _, v in feats], dtype=np.float64),
            }
        )

    schema = (
        f"{column_id} {id_type}, {column_kind} string, variable string, value double"
    )
    return df.groupBy(column_id, column_kind).applyInPandas(run_group, schema=schema)


def melt_wide(
    df: DataFrame,
    *,
    column_id: str,
    column_sort: str | None,
    value_columns: list[str] | None = None,
) -> DataFrame:
    """Wide → long restructuring (one column per kind), the Spark-native
    ``unpivot`` — equivalent of the reference's melt recipe
    (data.py:396-401, bindings.py:98-100)."""
    fixed = [column_id] + ([column_sort] if column_sort else [])
    if value_columns is None:
        value_columns = [c for c in df.columns if c not in fixed]
    return df.unpivot(
        ids=fixed, values=value_columns, variableColumnName="kind",
        valueColumnName="value",
    )


def _check_kind_name(kind) -> None:
    """Kind names feed feature-column names (``kind__calculator__params``),
    so they must not collide with the ``from_columns`` parser — the
    reference's ``_check_colname`` contract (data.py:124-146)."""
    s = str(kind)
    if s.endswith("_"):
        raise ValueError(f"Dict keys are not allowed to end with '_': {s}")
    if "__" in s:
        raise ValueError(f"Dict keys are not allowed to contain '__': {s}")


def union_dict_of_kinds(
    ts_dict: dict,
    *,
    column_id: str,
    column_value: str,
    column_sort: str | list[str] | None = None,
    column_kind: str = "kind",
) -> DataFrame:
    """Dict-of-kinds → one long frame: each ``{kind: DataFrame}`` entry
    contributes its ``(id, sort?, value)`` columns tagged with a literal
    kind column — the Spark equivalent of the reference's ``TsDictAdapter``
    (data.py:294-338; dispatch arm at data.py:502-503).

    The union is narrow (no shuffle); the one grouping shuffle happens
    downstream in :func:`extract_features_long`.  Kind keys are validated
    against the ``from_columns`` naming contract, and column presence is
    checked eagerly per frame (schema-only — free), mirroring the
    adapter's ValueError surface."""
    if not ts_dict:
        raise ValueError("ts_dict must contain at least one kind")
    if column_id is None or column_value is None:
        raise ValueError(
            "column_id and column_value are required for dict input"
        )
    sort_cols = (
        []
        if column_sort is None
        else ([column_sort] if isinstance(column_sort, str) else list(column_sort))
    )
    needed = [column_id, *sort_cols, column_value]
    if column_kind in needed:
        raise ValueError(
            f"column_kind={column_kind!r} collides with an input column"
        )
    frames = []
    for kind, df in ts_dict.items():
        _check_kind_name(kind)
        missing = [c for c in needed if c not in df.columns]
        if missing:
            raise ValueError(
                f"Column(s) {missing} missing from the frame for kind {kind!r}"
            )
        frames.append(
            df.select(*needed).withColumn(column_kind, F.lit(str(kind)))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def extract_features_dict(
    ts_dict: dict,
    settings: dict,
    *,
    column_id: str,
    column_value: str,
    column_sort: str | list[str] | None = None,
    column_kind: str = "kind",
    kind_to_settings: dict | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Extract features from a ``{kind: DataFrame}`` dict — the last
    ``to_tsdata`` dispatch arm (reference data.py:447-512): per-kind frames
    are unioned under a literal kind column, then routed through the long
    grouped path.  Output is the usual long triple frame
    ``(column_id, column_kind, variable, value)``."""
    long_df = union_dict_of_kinds(
        ts_dict,
        column_id=column_id,
        column_value=column_value,
        column_sort=column_sort,
        column_kind=column_kind,
    )
    return extract_features_long(
        long_df,
        settings,
        column_id=column_id,
        column_kind=column_kind,
        column_sort=column_sort,
        column_value=column_value,
        kind_to_settings=kind_to_settings,
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# pivot: long triples → wide feature matrix
# ---------------------------------------------------------------------------


def pivot_features(
    long_df: DataFrame,
    *,
    id_cols: list[str] | str = "doc_id",
    feature_names: list[str] | None = None,
) -> DataFrame:
    """Long → wide: one row per id, one double column per feature, columns
    sorted ascending (reference output contract, data.py:113-119).

    Passing ``feature_names`` skips Spark's distinct-values scan job — for
    the default comprehensive set that is 794 columns per kind, so prefer
    :func:`pivot_features_map` in pipelines and pivot only at the edge."""
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    pivoted = long_df.groupBy(*id_cols)
    if feature_names is not None:
        df = pivoted.pivot("variable", sorted(feature_names)).agg(F.first("value"))
    else:
        df = pivoted.pivot("variable").agg(F.first("value"))
        df = df.select(*id_cols, *sorted(c for c in df.columns if c not in id_cols))
    return df


def pivot_features_map(
    long_df: DataFrame, *, id_cols: list[str] | str = "doc_id"
) -> DataFrame:
    """Long → one ``map<string,double>`` column per id: constant-width plan
    regardless of feature count — the scale-friendly wide form."""
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    return long_df.groupBy(*id_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("variable"), F.col("value")))
        ).alias("features")
    )
