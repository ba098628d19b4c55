"""Feature-name micro-grammar.

The output "schema" of the engine is the feature name string
``<kind>__<calculator>__<param>_<value>__<param>_<value>...`` with parameters
sorted by name and string values wrapped in double quotes.  This reproduces
the grammar of the reference (see
/root/reference/tsfresh/utilities/string_manipulation.py:10-74) so that a
feature matrix produced by this engine is column-name-compatible with one
produced by the reference, and so that ``settings_from_feature_names`` can
replay an exact feature subset.
"""

from __future__ import annotations

import ast

import numpy as np


def encode_parameters(params: dict) -> str:
    """Render a parameter dict as the canonical name suffix.

    Keys sorted ascending; string values double-quoted; everything else via
    ``str()`` (so tuples render as ``(2, 5, 10, 20)``, bools as ``True``).
    """
    out = []
    for key in sorted(params):
        val = params[key]
        rendered = f'"{val}"' if isinstance(val, str) else str(val)
        out.append(f"{key}_{rendered}")
    return "__".join(out)


_NAME_CACHE: dict = {}
_NAME_CACHE_MAX = 64


def cached_param_names(param_list) -> list[str]:
    """Per-param-list memo of :func:`encode_parameters` results, keyed by
    list identity (settings objects are long-lived across an Arrow batch,
    so batched evaluators would otherwise re-encode every name for every
    series).  Bounded; identity-checked against id() reuse."""
    key = id(param_list)
    hit = _NAME_CACHE.get(key)
    if hit is None or hit[0] is not param_list:
        hit = (param_list, [encode_parameters(p) for p in param_list])
        if len(_NAME_CACHE) >= _NAME_CACHE_MAX:
            _NAME_CACHE.pop(next(iter(_NAME_CACHE)))
        _NAME_CACHE[key] = hit
    return hit[1]


def feature_name(kind: str, calculator: str, params: dict | None = None) -> str:
    """Full feature column name ``kind__calculator[__params]``."""
    name = f"{kind}__{calculator}"
    if params:
        suffix = encode_parameters(params)
        if suffix:
            name += f"__{suffix}"
    return name


def _parse_value(raw: str):
    low = raw.lower()
    if low == "nan":
        return np.nan
    if low == "inf":
        return np.inf
    if low == "-inf":
        return -np.inf
    return ast.literal_eval(raw)


def decode_parameters(parts: list[str]) -> dict | None:
    """Inverse of :func:`encode_parameters`.

    ``parts`` is the full ``__``-split of a feature name; the first two
    elements (kind, calculator) are skipped.  Returns ``None`` when the name
    carries no parameters.
    """
    param_parts = parts[2:]
    if not param_parts:
        return None
    out = {}
    for part in param_parts:
        key, _, raw = part.rpartition("_")
        out[key] = _parse_value(raw)
    return out


def parse_feature_name(column: str) -> tuple[str, str, dict | None]:
    """Split a feature column name into (kind, calculator, params)."""
    parts = column.split("__")
    if len(parts) < 2:
        raise ValueError(
            f"feature name {column!r} does not follow kind__calculator[__params]"
        )
    return parts[0], parts[1], decode_parameters(parts)
