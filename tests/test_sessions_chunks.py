"""sessionize (gap-based) and chunk_documents (token windows) semantics."""

import datetime as dt

import pytest

from mapalgebra_spark.streaming import sessionize
from mapalgebra_spark.textops import chunk_documents

pytestmark = pytest.mark.spark

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, "t", v, "{}")
         for i, (m, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_semantics(spark):
    # user 1: events at 0, 10, 50 min -> gap 40 > 30 splits sessions
    # user 2: events at 0, 29, 58 -> each gap 29 <= 30: ONE session
    ev = _ev(spark, [
        (0, 1, 1.0), (10, 1, 2.0), (50, 1, 4.0),
        (0, 2, 10.0), (29, 2, 10.0), (58, 2, 10.0),
    ])
    got = {(r["user_id"], r["session_id"]): r.asDict()
           for r in sessionize(ev, gap_minutes=30).collect()}
    assert len(got) == 3
    s11, s12 = got[(1, 1)], got[(1, 2)]
    assert s11["n_events"] == 2 and s11["total_value"] == 3.0
    assert s12["n_events"] == 1 and s12["total_value"] == 4.0
    assert s11["session_end"] - s11["session_start"] == 600
    s21 = got[(2, 1)]
    assert s21["n_events"] == 3 and s21["session_end"] - s21["session_start"] == 58 * 60


def test_sessionize_exact_gap_is_same_session(spark):
    # gap of exactly 30 min does NOT split (strict >)
    ev = _ev(spark, [(0, 1, 1.0), (30, 1, 1.0)])
    rows = sessionize(ev, gap_minutes=30).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return sorted(
        (r["chunk_start"], r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, size=size, stride=stride).collect()
    )


def test_chunking_overlap_and_tail(spark):
    toks = [f"w{i}" for i in range(10)]
    got = _chunks(spark, " ".join(toks), size=4, stride=3)
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (3, "w3 w4 w5 w6", 4),
        (6, "w6 w7 w8 w9", 4),
        (9, "w9", 1),          # short tail kept, length recorded
    ]


def test_chunking_short_doc_and_validation(spark):
    got = _chunks(spark, "only two", size=64, stride=48)
    assert got == [(0, "only two", 2)]
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=5)


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from mapalgebra_spark.streaming import stream_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exp = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in stream_sessionize(events).collect()
    }
    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    out_rows = []
    q = (
        stream_sessionize(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: out_rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
           for r in out_rows}
    # append emits only watermark-closed sessions; every emitted session
    # must match the batch analog exactly
    assert got
    for k, v in got.items():
        assert exp[k] == v, k


def test_stream_sessionize_membership_matches_batch_rollup(spark):
    # same gap -> identical session memberships as the lag/cumsum batch
    # rollup (boundary: exact-gap ties are measure-zero on micro
    # timestamps; the sf0.001 table has none)
    from mapalgebra_spark.streaming import sessionize, stream_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in sessionize(events, gap_minutes=30).collect()
    )
    b = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in stream_sessionize(events, gap="30 minutes").collect()
    )
    assert a == b


# --- ring_measures (vector geometry, spatial.py r4) --------------------------


def test_line_dedup_first_occurrence_wins(spark):
    from mapalgebra_spark.textops import line_dedup

    df = spark.createDataFrame(
        [
            (0, "a b c d"),      # lines: "a b", "c d"
            (1, "c d a b x"),    # lines: "c d"(dup), "a b"(dup), "x"(new)
        ],
        "doc_id long, text string",
    )
    # doc 0 lines: ["a b", "c d"]; doc 1 lines: ["c d", "a b", "x"]
    got = {r["doc_id"]: r for r in line_dedup(df, line_tokens=2).collect()}
    assert got[0]["n_lines"] == 2 and got[0]["kept_lines"] == 2
    assert got[0]["dedup_text"] == "a b c d"
    assert got[1]["n_lines"] == 3 and got[1]["kept_lines"] == 1
    assert got[1]["dedup_text"] == "x"


def test_line_dedup_within_doc_and_empty_result(spark):
    from mapalgebra_spark.textops import line_dedup

    df = spark.createDataFrame(
        [(0, "p q p q"), (1, "p q")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(df, line_tokens=2).collect()}
    # doc 0 repeats its own line: second copy dropped
    assert got[0]["kept_lines"] == 1 and got[0]["dedup_text"] == "p q"
    # doc 1's only line already seen in doc 0 -> everything dropped
    assert got[1]["kept_lines"] == 0 and got[1]["dedup_text"] == ""


def test_line_dedup_order_preserved_and_validation(spark):
    from mapalgebra_spark.textops import line_dedup

    df = spark.createDataFrame(
        [(5, "a a b b a a c c")], "doc_id long, text string"
    )
    got = line_dedup(df, line_tokens=2).collect()[0]
    # lines: "a a","b b","a a"(dup),"c c" -> kept in original order
    assert got["dedup_text"] == "a a b b c c"
    with pytest.raises(ValueError):
        line_dedup(df, line_tokens=0)


def test_ring_measures_orientation_and_degenerate(spark):
    from mapalgebra_spark.spatial import ring_measures

    polys = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 3.0], [0.0, 4.0, 0.0]),   # CW triangle (signed < 0)
            (2, [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]),   # same triangle CCW
            (3, [1.0, 1.0, 1.0], [0.0, 5.0, 2.0]),   # collinear: zero area
        ],
        "poly_id long, ring_lat array<double>, ring_lng array<double>",
    )
    got = {r["poly_id"]: r.asDict() for r in ring_measures(polys).collect()}
    # 3-4-5 right triangle either orientation: area 6, perimeter 12
    for pid in (1, 2):
        assert got[pid]["area"] == 6.0
        assert got[pid]["perimeter"] == 12.0
        assert got[pid]["centroid_x"] == pytest.approx(4.0 / 3.0)
        assert got[pid]["centroid_y"] == pytest.approx(1.0)
    assert got[3]["area"] == 0.0
    assert got[3]["centroid_x"] is None and got[3]["centroid_y"] is None
