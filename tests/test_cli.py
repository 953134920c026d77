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
