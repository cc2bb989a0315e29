"""Champion (AFL) silver-variant fixture: the third E1 adapter shape —
CSV scan → `Player (TEAM)` regex split → per-competition team-suffix
disambiguation → ANY union → champion playtime predicate → stint-
seconds feature aggregate.

Reference shape: STAGING/SILVER-adapter-champion-notebook.json cells
7-13 (spark.read.csv header+infer PERMISSIVE; team abbr regex
r'\\(([^)]*)\\)'; add_suffix_udf; SUB_ON==0 AND SUB_OFF==0 OR ANY;
SUM(ON_STINT_SECS) feature GROUP BY), DEPRECATED/champion-silver.py:256-320.
"""

from pyspark.sql import functions as F

from traits_data_spark.functions.feature_store import FeatureStore
from traits_data_spark.functions.scalars import suffixed_name
from traits_data_spark.operators.any_union import union_with_coarse_group
from traits_data_spark.sources.readers import read_csv

CSV = """Player,COMP,POS,SUB_ON,SUB_OFF,ON_STINT_SECS,Disposal
Alpha One (CARL),AFL,DEF,0,0,3600,20
Alpha One (CARL),AFL,DEF,0,0,3000,15
Beta Two (COLL),AFL,MID,1,0,1200,8
Gamma Three (CARL),AFLW,DEF,0,0,2400,12
"""


def _champion_frame(spark, tmp_path):
    p = tmp_path / "champion.csv"
    p.write_text(CSV)
    return read_csv(spark, str(p))


def test_champion_csv_scan_infers_types(spark, tmp_path):
    df = _champion_frame(spark, tmp_path)
    kinds = dict(df.dtypes)
    assert kinds["Player"] == "string"
    assert kinds["ON_STINT_SECS"] in ("int", "bigint")


def test_champion_player_team_split_and_suffix(spark, tmp_path):
    df = _champion_frame(spark, tmp_path)
    parsed = df.withColumns(
        {
            "teamAbbr": F.regexp_extract("Player", r"\(([^)]*)\)", 1),
            "playerName": F.trim(F.element_at(F.split("Player", r"\("), 1)),
        }
    ).withColumn(
        # AFLW teams get a league suffix so CARL(AFL) != CARL(AFLW)
        "teamName",
        suffixed_name("teamAbbr", "COMP", {"AFLW": "(W)"}),
    )
    rows = {
        (r["playerName"], r["COMP"]): (r["teamAbbr"], r["teamName"])
        for r in parsed.collect()
    }
    assert rows[("Alpha One", "AFL")] == ("CARL", "CARL")
    assert rows[("Gamma Three", "AFLW")] == ("CARL", "CARL (W)")


def test_champion_any_union_playtime_and_stint_aggregate(spark, tmp_path):
    df = _champion_frame(spark, tmp_path)
    # ANY union then the champion playtime predicate: full-game rows
    # (no sub on/off) or the ANY duplicate
    doubled = union_with_coarse_group(df, {"POS": "ANY"})
    filtered = doubled.filter(
        ((F.col("SUB_ON") == 0) & (F.col("SUB_OFF") == 0))
        | (F.col("POS") == "ANY")
    )
    fs = FeatureStore.from_csv(
        "feature_name,base_sql\n"
        "totalStintSecs,SUM(ON_STINT_SECS)\n"
        "disposals,SUM(Disposal)\n"
        "appearances,COUNT(1)\n"
    )
    fs.validate(spark)
    out = fs.aggregate(
        filtered.withColumn(
            "profileId", F.concat_ws("-", "Player", "COMP", "POS")
        ),
        ["profileId"],
    )
    got = {r["profileId"]: r.asDict() for r in out.collect()}
    # Alpha One: two full games -> DEF row sums both; Beta Two was
    # subbed on, so only the ANY duplicate survives the filter
    assert got["Alpha One (CARL)-AFL-DEF"]["totalStintSecs"] == 6600
    assert got["Alpha One (CARL)-AFL-ANY"]["appearances"] == 2
    assert "Beta Two (COLL)-AFL-MID" not in got
    assert got["Beta Two (COLL)-AFL-ANY"]["disposals"] == 8
    assert got["Gamma Three (CARL)-AFLW-DEF"]["totalStintSecs"] == 2400
