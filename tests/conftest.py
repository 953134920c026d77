from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("spark-warehouse"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bdv-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        # static conf: set at build time so bucketed-table tests write to
        # a tmp warehouse, never into the repo
        .config("spark.sql.warehouse.dir", warehouse)
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def person_csv(tmp_path):
    """Reference-shaped pass fixture: pipe-delimited, double-quoted, with a
    deliberately unbalanced quote in SURNAME (FIXTURES.md §A1) so the
    quote-aware counter sees 3 fields instead of 4 and the CSV-parser
    escalation path is exercised."""
    p = tmp_path / "PERSON.csv"
    p.write_text(
        '"ID"|"NAME"|"SURNAME"|"BIRTH_DATE"\n'
        '"1001"|"Ada"|"Lovelace"|"10/12/1815"\n'
        '"1002"|"Patricia A. (Patricia Ann)"|"Turner|"23/1/2002"\n'
        '"1003"|"Grace"|"Hopper"|"9/12/1906"\n'
    )
    return str(p)


@pytest.fixture()
def person_metadata_csv(tmp_path):
    """Reference-format semicolon metadata descriptor (FIXTURES.md §A2)."""
    p = tmp_path / "PERSON_metadata.csv"
    p.write_text(
        "COLUMN_NAME;DATA_TYPE;STRING_SEPARATOR;FIELD_SEPARATOR;DECIMAL_SEPARATOR;NULLABLE;DATA_FORMAT\n"
        'ID;NUMBER;"""";|;.;TRUE;\n'
        'NAME;VARCHAR2;"""";|;.;TRUE;\n'
        'SURNAME;VARCHAR2;"""";|;.;TRUE;\n'
        'BIRTH_DATE;DATE;"""";|;.;TRUE;dd/M/yyyy\n'
    )
    return str(p)
