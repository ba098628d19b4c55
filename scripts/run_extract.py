#!/usr/bin/env python
"""CLI entry point: file in → feature matrix out.

The Spark analog of the reference's command-line runner
(/root/reference/tsfresh/scripts/run_tsfresh.py:47-140): read a long or
tokens table (csv/parquet), extract the requested feature family, write the
result.  Designed for ``spark-submit --py-files tsfresh_spark.zip``.

Examples:
    python scripts/run_extract.py --input data.parquet --format tokens \
        --settings efficient --output features.parquet
    python scripts/run_extract.py --input long.csv --format long \
        --id-col id --kind-col kind --sort-col time --value-col value \
        --settings minimal --pivot --output wide.parquet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", choices=["tokens", "long"], default="tokens")
    ap.add_argument(
        "--settings", choices=["comprehensive", "efficient", "minimal"],
        default="efficient",
    )
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--kind-col", default="source")
    ap.add_argument("--tokens-col", default="tokens")
    ap.add_argument("--sort-col", default="time")
    ap.add_argument("--value-col", default="value")
    ap.add_argument("--pivot", action="store_true", help="wide output")
    ap.add_argument("--impute", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tsfresh_spark import settings as settings_mod
    from tsfresh_spark.extract import (
        extract_features_long,
        extract_features_tokens,
        pivot_features,
    )
    from tsfresh_spark.operators.impute import impute_long
    from tsfresh_spark.session import build_session

    spark = build_session("tsfresh_spark-cli", master=args.master)
    reader = spark.read
    if args.input.endswith(".csv"):
        df = reader.option("header", "true").option("inferSchema", "true").csv(
            args.input
        )
    else:
        df = reader.parquet(args.input)

    fc = getattr(settings_mod, f"{args.settings}_settings")()
    if args.format == "tokens":
        long_feats = extract_features_tokens(
            df, fc, id_col=args.id_col, tokens_col=args.tokens_col,
            kind_col=args.kind_col,
        )
        id_cols = [args.id_col]
    else:
        long_feats = extract_features_long(
            df, fc, column_id=args.id_col, column_kind=args.kind_col,
            column_sort=args.sort_col, column_value=args.value_col,
        )
        id_cols = [args.id_col]

    if args.impute:
        long_feats = impute_long(long_feats)
    out = (
        pivot_features(long_feats.drop(args.kind_col), id_cols=id_cols)
        if args.pivot
        else long_feats
    )
    if args.output.endswith(".csv"):
        out.write.mode("overwrite").option("header", "true").csv(args.output)
    else:
        out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
