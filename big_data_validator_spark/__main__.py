"""CLI entry point — the reference's `spark-submit big_data_validator.py
<TABLE_NAME>` contract (``README.md:32-36``,
``big_data_validator.py:300-301``), rebuilt:

    python -m big_data_validator_spark <TABLE_NAME> [--base-dir DIR]
    python -m big_data_validator_spark stage <TABLE_NAME> \
        --input data.csv --metadata meta.csv [--base-dir DIR]

Uses the reference's naming conventions (``base_data_validation.py:41``,
``big_data_validator.py:261``):

- input table at   ``<base>/inputs/<TABLE>.csv``
- contract at      ``<base>/metadata/csv/<TABLE>_metadata.csv``
- failure sink at  ``<base>/inputs/VALIDATION/<TABLE>_TMP/``

``stage`` is the reference's Django upload surface
(``validator/views.py:4-24``, ``forms.py:4-7``) without the web layer: the
view only ever SAVED the two uploaded files into that layout — it never
invoked the validator (a human ran the CLI afterwards).  ``stage`` does the
same file placement; ``TABLE`` is reserved as a subcommand name.

Exit code 0 on validation success, 1 on failure (the reference raised
``ValidationErr``); the report prints as JSON either way.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def stage(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(prog="big_data_validator_spark stage")
    parser.add_argument("table", help="table name the files are staged under")
    parser.add_argument("--input", required=True, help="data CSV to stage")
    parser.add_argument(
        "--metadata", required=True, help="metadata contract CSV to stage"
    )
    parser.add_argument(
        "--base-dir", default=".", help="directory holding inputs/ and metadata/"
    )
    args = parser.parse_args(argv)
    for src in (args.input, args.metadata):
        if not os.path.exists(src):
            print(f"file not found: {src}", file=sys.stderr)
            return 2
    inputs_dir = os.path.join(args.base_dir, "inputs")
    meta_dir = os.path.join(args.base_dir, "metadata", "csv")
    os.makedirs(inputs_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    dst_input = os.path.join(inputs_dir, f"{args.table}.csv")
    dst_meta = os.path.join(meta_dir, f"{args.table}_metadata.csv")
    shutil.copyfile(args.input, dst_input)
    shutil.copyfile(args.metadata, dst_meta)
    print(json.dumps({"staged": {"input": dst_input, "metadata": dst_meta}}))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "stage":
        return stage(argv[1:])
    parser = argparse.ArgumentParser(prog="big_data_validator_spark")
    parser.add_argument("table", help="table name (reference CLI argument)")
    parser.add_argument(
        "--base-dir", default=".", help="directory holding inputs/ and metadata/"
    )
    parser.add_argument(
        "--master", default="local[*]", help="Spark master (default local[*])"
    )
    parser.add_argument(
        "--no-type-enforcement",
        action="store_true",
        help="skip declared-type checks (reference-exact behavior: it "
        "declares types but never checks them)",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    from big_data_validator_spark.contract import TableContract
    from big_data_validator_spark.runner import RunnerConfig, ValidationRunner

    csv_path = os.path.join(args.base_dir, "inputs", f"{args.table}.csv")
    meta_path = os.path.join(
        args.base_dir, "metadata", "csv", f"{args.table}_metadata.csv"
    )
    if not os.path.exists(meta_path):
        print(f"metadata contract not found: {meta_path}", file=sys.stderr)
        return 2

    contract = TableContract.from_metadata_csv(meta_path)
    # keep the reference's compiled-JSON artifact convention
    json_dir = os.path.join(args.base_dir, "metadata", "json")
    os.makedirs(json_dir, exist_ok=True)
    contract.to_json_file(
        os.path.join(json_dir, f"{args.table}_metadata.json")
    )

    spark = (
        SparkSession.builder.master(args.master)
        .appName("big-data-validator-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        runner = ValidationRunner(
            spark,
            RunnerConfig(
                enforce_types=not args.no_type_enforcement,
                failure_base_dir=os.path.join(args.base_dir, "inputs"),
            ),
        )
        report = runner.validate_csv(args.table, csv_path, contract)
        print(report.to_json())
        return 0 if report.ok else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
