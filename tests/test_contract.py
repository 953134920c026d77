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
