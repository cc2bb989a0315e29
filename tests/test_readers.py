"""S1-S5, S3 filename extraction, O3 newest-file selection."""

import json

from traits_data_spark.sources.readers import (
    newest_file,
    read_csv,
    read_json_files,
    with_filename_column,
)


def test_newest_file_by_embedded_date():
    paths = ["dump_01022020.json", "dump_15062021.json", "dump_030112021.json"]
    assert newest_file(paths) == "dump_15062021.json"


def test_newest_file_ignores_unparseable():
    assert newest_file(["a.json", "b_99999999.json"]) is None
    assert newest_file(["a_01012024.json", "nodate.json"]) == "a_01012024.json"


def test_read_json_with_filename_column(spark, tmp_path):
    for mid in (101, 202):
        (tmp_path / f"{mid}.json").write_text(
            json.dumps({"playerId": mid * 10}) + "\n"
        )
    df = read_json_files(spark, str(tmp_path) + "/*.json")
    out = with_filename_column(df, out_col="match_id")
    got = {r["match_id"]: r["playerId"] for r in out.collect()}
    assert got == {"101": 1010, "202": 2020}


def test_read_csv_header_inference(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["a", "b"]
    assert df.count() == 2
    assert df.schema["a"].dataType.simpleString() == "int"


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n")
    df = read_csv(spark, str(p), schema="a string, b string")
    assert df.schema["a"].dataType.simpleString() == "string"


def test_from_pandas_bridge(spark):
    import pandas as pd

    from traits_data_spark.sources.readers import from_pandas

    pdf = pd.DataFrame({"teamId": [1, 2], "name": ["A", "B"]})
    df = from_pandas(spark, pdf, schema="teamId long, name string")
    assert df.count() == 2
    assert df.schema["teamId"].dataType.simpleString() == "bigint"


def test_filter_valid_seasons(spark):
    from traits_data_spark.sources.readers import filter_valid_seasons

    rows = [
        (2019, "2019-08-01"),
        (2026, "2026-09-01"),  # starts in the future as of the pin
        (1995, "1995-08-01"),  # before min_year
    ]
    df = spark.createDataFrame(rows, ["startYear", "startDate"])
    out = filter_valid_seasons(
        df, min_year=2000, max_year=2030,
        start_date_col="startDate", as_of="2026-08-13",
    )
    assert [r["startYear"] for r in out.collect()] == [2019]
