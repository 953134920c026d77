"""COVERAGE.md freshness (VERDICT r7 item 8): the committed ledger must
equal what scripts/gen_coverage.py generates from the CURRENT registry
and the committed CORRECTNESS files — a stale ledger misreports
rotation debt, which is the one thing it exists to make visible."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_is_fresh():
    spec = importlib.util.spec_from_file_location(
        "gen_coverage", os.path.join(REPO, "scripts", "gen_coverage.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        committed = fh.read()
    assert committed == mod.build_ledger(), (
        "COVERAGE.md is stale — regenerate with "
        "`python scripts/gen_coverage.py`"
    )


def test_ledger_accounts_for_every_registry_entry():
    from big_data_validator_spark.queries import REGISTRY

    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        committed = fh.read()
    missing = [n for n in REGISTRY if f"`{n}`" not in committed]
    assert not missing, missing
