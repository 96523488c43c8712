"""DateTools — sortable resolution-truncated date strings
(core/document/DateTools.java; TestDateTools patterns)."""

import datetime as dt

import pandas as pd
import pytest

from lucene_spark.util import datetools as DT

UTC = dt.timezone.utc
D = dt.datetime(2004, 2, 3, 22, 8, 56, 333000, tzinfo=UTC)


def test_date_to_string_resolutions():
    assert DT.date_to_string(D, "year") == "2004"
    assert DT.date_to_string(D, "month") == "200402"
    assert DT.date_to_string(D, "day") == "20040203"
    assert DT.date_to_string(D, "hour") == "2004020322"
    assert DT.date_to_string(D, "minute") == "200402032208"
    assert DT.date_to_string(D, "second") == "20040203220856"
    assert DT.date_to_string(D, "millisecond") == "20040203220856333"


def test_coarser_is_prefix_and_sortable():
    earlier = D - dt.timedelta(days=40)
    for res in DT.RESOLUTIONS:
        s = DT.date_to_string(D, res)
        assert DT.date_to_string(D, "millisecond").startswith(s[: len(s)])
        assert DT.date_to_string(earlier, res) <= s


def test_string_to_date_roundtrip():
    for res, want in [
        ("year", dt.datetime(2004, 1, 1, tzinfo=UTC)),
        ("month", dt.datetime(2004, 2, 1, tzinfo=UTC)),
        ("day", dt.datetime(2004, 2, 3, tzinfo=UTC)),
        ("hour", dt.datetime(2004, 2, 3, 22, tzinfo=UTC)),
        ("minute", dt.datetime(2004, 2, 3, 22, 8, tzinfo=UTC)),
        ("second", dt.datetime(2004, 2, 3, 22, 8, 56, tzinfo=UTC)),
        ("millisecond", D),
    ]:
        assert DT.string_to_date(DT.date_to_string(D, res)) == want
    with pytest.raises(ValueError):
        DT.string_to_date("2004020")


def test_round_time():
    ms = int(D.timestamp() * 1000)
    assert DT.round_time(ms, "month") == int(
        dt.datetime(2004, 2, 1, tzinfo=UTC).timestamp() * 1000
    )
    assert DT.round_time(ms, "second") == (ms // 1000) * 1000
    assert DT.round_time(ms, "millisecond") == ms


def test_time_to_string():
    ms = int(D.timestamp() * 1000)
    assert DT.time_to_string(ms, "millisecond") == "20040203220856333"
    assert DT.time_to_string(ms, "day") == "20040203"


def test_column_encode_and_range(spark):
    times = pd.to_datetime(
        ["2024-01-01 00:09:58.778", "2024-02-15 12:00:00.000",
         "2024-03-01 23:59:59.999"]
    )
    df = spark.createDataFrame(pd.DataFrame({"i": [0, 1, 2], "ts": times}))
    enc = df.select(
        "i", DT.date_to_string_column(df.ts, "millisecond").alias("e")
    )
    got = enc.toPandas().sort_values("i")["e"].tolist()
    assert got == [
        "20240101000958778", "20240215120000000", "20240301235959999"
    ]
    # coarser upper bound: everything in Feb 2024
    feb = enc.filter(DT.date_range(enc.e, "202402", "202402"))
    assert feb.toPandas()["i"].tolist() == [1]
    rounded = df.select(
        DT.round_column(df.ts, "day").cast("string").alias("r")
    ).toPandas()["r"].tolist()
    assert rounded[0].startswith("2024-01-01 00:00:00")
