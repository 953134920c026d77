from __future__ import annotations

from big_data_validator_spark.contract import (
    CORRUPT_RECORD_COL,
    TableContract,
    normalize_quote,
)


def test_parse_reference_metadata_format(person_metadata_csv):
    c = TableContract.from_metadata_csv(person_metadata_csv)
    assert [s.name for s in c.columns] == ["ID", "NAME", "SURNAME", "BIRTH_DATE"]
    assert c.field_separator == "|"
    # csv.reader passes the semicolon-embedded quoted cell through raw:
    # the reference's shipped contract compiles it to 4 quote chars.
    assert c.string_separator == '""""'
    assert c.quote_char == '"'  # normalized (SURVEY §7 hard-list 1)
    assert c.decimal_separator == "."
    assert c.columns[0].source_type == "NUMBER"
    assert c.columns[3].source_format == "dd/M/yyyy"
    assert all(s.nullable for s in c.columns)


def test_json_round_trip(person_metadata_csv, tmp_path):
    c = TableContract.from_metadata_csv(person_metadata_csv)
    p = tmp_path / "meta.json"
    c.to_json_file(str(p))
    c2 = TableContract.from_json_file(str(p))
    assert c2.to_json_dict() == c.to_json_dict()
    assert [s.name for s in c2.columns] == [s.name for s in c.columns]


def test_normalize_quote():
    assert normalize_quote('""""') == '"'
    assert normalize_quote('"') == '"'
    assert normalize_quote("nan") is None  # pandas-NaN sentinel (ref :16-17)
    assert normalize_quote("") is None
    assert normalize_quote(None) is None


def test_read_schema_uses_actual_columns_plus_corrupt_col(person_metadata_csv):
    c = TableContract.from_metadata_csv(person_metadata_csv)
    schema = c.read_schema(["ID", "NAME", "SURNAME", "BIRTH_DATE", "EXTRA"])
    assert schema.fieldNames() == [
        "ID", "NAME", "SURNAME", "BIRTH_DATE", "EXTRA", CORRUPT_RECORD_COL,
    ]
    assert all(f.dataType.typeName() == "string" for f in schema.fields)


def test_schema_drift_report():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from big_data_validator_spark.contract import schema_drift

    old = StructType(
        [
            StructField("a", LongType(), True),
            StructField("b", StringType(), True),
            StructField("c", IntegerType(), True),
            StructField("d", StringType(), True),
        ]
    )
    new = StructType(
        [
            StructField("a", LongType(), True),  # unchanged
            StructField("b", LongType(), True),  # type change
            StructField("c", IntegerType(), False),  # nullability
            StructField("e", StringType(), True),  # added (d removed)
        ]
    )
    got = schema_drift(old, new)
    by_col = {r["column"]: r for r in got}
    assert by_col["b"]["change"] == "type_changed"
    assert by_col["b"]["old_type"] == "string"
    assert by_col["b"]["new_type"] == "bigint"
    assert by_col["c"]["change"] == "nullability_changed"
    assert by_col["d"]["change"] == "removed"
    assert by_col["e"]["change"] == "added"
    assert "a" not in by_col
    assert schema_drift(old, old) == []


def test_schema_drift_on_real_snapshots(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_validator_spark.contract import schema_drift

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    o.write.parquet(p1)
    o.withColumn("late_col", F.lit(1)).drop("o_orderstatus").write.parquet(
        p2
    )
    got = schema_drift(
        spark.read.parquet(p1).schema, spark.read.parquet(p2).schema
    )
    changes = {(r["column"], r["change"]) for r in got}
    assert ("late_col", "added") in changes
    assert ("o_orderstatus", "removed") in changes
    assert len(got) == 2
