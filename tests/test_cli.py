"""CLI surface: the reference's spark-submit contract rebuilt as
``python -m big_data_validator_spark <TABLE>``."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def layout(tmp_path, csv_text, meta_text, table="T"):
    (tmp_path / "inputs").mkdir()
    (tmp_path / "metadata" / "csv").mkdir(parents=True)
    (tmp_path / "inputs" / f"{table}.csv").write_text(csv_text)
    (tmp_path / "metadata" / "csv" / f"{table}_metadata.csv").write_text(meta_text)
    return tmp_path


def run_cli(base, table="T", extra=()):
    return subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", table,
         "--base-dir", str(base), "--master", "local[2]", *extra],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )


META = (
    "COLUMN_NAME;DATA_TYPE;STRING_SEPARATOR;FIELD_SEPARATOR;DECIMAL_SEPARATOR;NULLABLE;DATA_FORMAT\n"
    "A;NUMBER;;|;.;TRUE;\n"
    "B;VARCHAR2;;|;.;TRUE;\n"
)


def test_cli_pass(tmp_path):
    base = layout(tmp_path, "A|B\n1|x\n2|y\n", META)
    proc = run_cli(base)
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is True
    # the compiled-JSON contract artifact is written (reference convention)
    assert (base / "metadata" / "json" / "T_metadata.json").exists()


def test_cli_fail_exit_code_and_sink(tmp_path):
    base = layout(tmp_path, "A|B\n1|x\nbroken\n2|y\n", META)
    proc = run_cli(base)
    assert proc.returncode == 1
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is False
    assert (base / "inputs" / "VALIDATION" / "T_TMP").exists()


def test_cli_missing_metadata(tmp_path):
    (tmp_path / "inputs").mkdir()
    (tmp_path / "inputs" / "T.csv").write_text("A|B\n1|2\n")
    proc = run_cli(tmp_path)
    assert proc.returncode == 2
    assert "not found" in proc.stderr


FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _fixture(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return f.read()


def test_cli_reference_fail_column_metadata(tmp_path):
    """Replay of the reference's own fail fixture
    (``tableExamples/fail_column_metadata (1).csv`` + ``success (1).csv``):
    the contract expects BIRH_DATE (typo), the header says BIRTH_DATE —
    superset column semantics (``big_data_validator.py:53-74``) must fail
    the run through the full CLI path."""
    base = layout(
        tmp_path,
        _fixture("PERSON.csv"),
        _fixture("PERSON_fail_column_metadata.csv"),
        table="PERSON",
    )
    proc = run_cli(base, table="PERSON")
    assert proc.returncode == 1, proc.stderr[-2000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is False
    names = {r["rule"]: r for r in report["results"]}["column_names"]
    assert not names["passed"]
    assert "BIRH_DATE" in names["details"]["missing"]


def test_cli_reference_fail_data_type(tmp_path):
    """Replay of the reference's type-fail intent
    (``tableExamples/fail_data_type_metadata (1).csv``: ``ID;NUMBER``):
    with the column-name typo corrected so the name rule passes (type
    enforcement requires resolvable columns), a non-numeric ID value must
    fail declared-type enforcement end-to-end through the CLI."""
    meta = _fixture("PERSON_fail_data_type_metadata.csv").replace(
        "BIRH_DATE", "BIRTH_DATE"
    )
    csv_text = _fixture("PERSON.csv").replace('"12378687"', '"12x78687"', 1)
    base = layout(tmp_path, csv_text, meta, table="PERSON")
    proc = run_cli(base, table="PERSON")
    assert proc.returncode == 1, proc.stderr[-2000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is False
    types = {r["rule"]: r for r in report["results"]}["type_enforcement"]
    assert not types["passed"]
    assert types["violation_count"] >= 1
    assert "ID" in str(types["details"])


def test_cli_stage_then_validate(tmp_path):
    """The reference's upload surface (views.py:4-24) as a CLI: `stage`
    places the two files into the conventional layout, after which the
    normal validate invocation runs against them."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "data.csv").write_text("A|B\n1|x\n2|y\n")
    (src / "meta.csv").write_text(META)
    base = tmp_path / "base"
    base.mkdir()
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "stage", "T",
         "--input", str(src / "data.csv"), "--metadata", str(src / "meta.csv"),
         "--base-dir", str(base)],
        capture_output=True, text=True, cwd=REPO, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    staged = json.loads(proc.stdout)["staged"]
    assert staged["input"].endswith("inputs/T.csv")
    assert (base / "inputs" / "T.csv").exists()
    assert (base / "metadata" / "csv" / "T_metadata.csv").exists()
    proc = run_cli(base)
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is True


def test_cli_stage_missing_file(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "stage", "T",
         "--input", str(tmp_path / "nope.csv"),
         "--metadata", str(tmp_path / "nope_meta.csv"),
         "--base-dir", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO, timeout=60,
    )
    assert proc.returncode == 2
    assert "not found" in proc.stderr


def test_cli_query_list():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "query", "--list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    lines = dict(
        l.split("\t") for l in proc.stdout.strip().splitlines() if "\t" in l
    )
    assert lines["validation_summary_lineitem"] == "oracled"
    assert lines["dedup_minhash_lsh"] == "rows-only"
    assert len(lines) >= 100


def test_cli_query_run_and_unknown(tmp_path):
    import json as _json
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "big_data_validator_spark",
            "query",
            "gen_synthetic_validated",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [
        _json.loads(l)
        for l in proc.stdout.strip().splitlines()
        if l.startswith("{")
    ]
    assert len(rows) == 5
    assert sum(r["n_rows"] for r in rows) == 10000

    bad = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "query", "nope"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert bad.returncode == 2
    assert "unknown query" in bad.stderr


def test_suggest_subcommand_drafts_usable_contract(spark, tmp_path):
    """CLI suggest (subprocess — the CLI stops its own session): profile
    a parquet snapshot, print the suggestions JSON, and write a
    metadata CSV the normal loader parses back."""
    import json
    import subprocess
    import sys

    from big_data_validator_spark.contract import TableContract

    src_path = str(tmp_path / "snap.parquet")
    spark.createDataFrame(
        [(1, "A", None), (2, "B", "x"), (3, "A", "y")],
        "id long, status string, note string",
    ).write.parquet(src_path)
    meta_out = str(tmp_path / "SNAP_metadata.csv")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "suggest",
         "--input", src_path, "--metadata-out", meta_out,
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    sug = json.loads(proc.stdout.strip().splitlines()[-1])
    assert sug["candidate_keys"] == ["id"]
    assert set(sug["domains"]["status"]) == {"A", "B"}
    assert sug["metadata_out"] == meta_out
    # the drafted file parses back through the reference-format loader
    contract = TableContract.from_metadata_csv(meta_out)
    by = {c.name: c for c in contract.columns}
    assert by["id"].source_type == "NUMBER" and by["id"].nullable is False
    assert by["note"].nullable is True
    assert contract.field_separator == "|"
    # loader-breaking separators are rejected up front
    bad = subprocess.run(
        [sys.executable, "-m", "big_data_validator_spark", "suggest",
         "--input", src_path, "--metadata-out", meta_out,
         "--field-sep", ","],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "FIELD_SEPARATOR" in bad.stderr
