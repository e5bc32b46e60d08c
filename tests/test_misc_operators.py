"""Serving builders, multimodal plumbing, watermark incremental scan,
structured streaming smoke."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from news_combinator_spark.operators import serving
from news_combinator_spark.operators.multimodal import (
    decode_image_meta,
    encode_fake_image,
    gc_old_media,
    with_image_features,
)
from news_combinator_spark.streaming.incremental import (
    WatermarkStore,
    advance,
    incremental_scan,
)

from conftest import SF_MED


def test_clamp_range_days():
    assert serving.clamp_range_days(None) == 3
    assert serving.clamp_range_days(0) == 1
    assert serving.clamp_range_days(999) == 50
    assert serving.clamp_range_days(7) == 7


def test_rank_front_page_ordering(spark):
    rows = [
        (1, 20240102, "sina,netease"),
        (2, 20240102, "reetsee,sina,netease"),
        (3, 20240102, "sina"),
        (4, 20240103, "sina"),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id long, day_time int, source_names string"
    )
    out = [r["cluster_id"] for r in serving.rank_front_page(df).collect()]
    # newest day first; within a day: reetsee first, then diversity
    assert out == [4, 2, 1, 3]


def test_entry_lookup_join(spark):
    clusters = spark.createDataFrame(
        [(100, "1,2,3")], "cluster_id long, abstract_ids string"
    )
    contents = spark.createDataFrame(
        [(1, "t1"), (2, "t2"), (3, "t3"), (4, "t4")],
        "abstract_id long, title string",
    )
    out = serving.entry_lookup(clusters, contents).collect()
    assert sorted(r["abstract_id"] for r in out) == [1, 2, 3]


def test_paginate(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "x long")
    page2 = serving.paginate(df, [F.asc("x")], pn=2, rn=10).collect()
    assert sorted(r["x"] for r in page2) == list(range(10, 20))


def test_multimodal_roundtrip_and_stub_gate(spark):
    payload = encode_fake_image(8, 6, 42)
    assert decode_image_meta(payload) == (8, 6, 42)
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\xff\xd8\xff\xe0 not our format")
    media = spark.createDataFrame(
        [(1, 10, 20240105, "image", payload)],
        "media_id long, abstract_id long, day_time int, kind string, "
        "payload binary",
    )
    out = with_image_features(media).collect()[0]
    assert (out["width"], out["height"]) == (8, 6)
    assert 0 <= out["mean_pixel"] <= 255


def test_gc_old_media(spark):
    media = spark.createDataFrame(
        [(1, 20240101), (2, 20240106), (3, 20240110)],
        "media_id long, day_time int",
    )
    kept = sorted(
        r["media_id"] for r in gc_old_media(media, today_day=20240110).collect()
    )
    assert kept == [2, 3]  # day <= today-5 dropped (clearpic.php:38-77)


def test_watermark_incremental_scan(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [(i, i * 100) for i in range(1, 6)], "id long, ts long"
    )
    batch1 = incremental_scan(df, store, "ts")
    assert batch1.count() == 5
    advance(store, batch1, "ts")
    assert store.read() == 500
    # nothing new
    assert incremental_scan(df, store, "ts").count() == 0
    # late row with old ts is silently skipped forever (reference
    # semantics: categorize.py:31-37)
    df2 = df.union(spark.createDataFrame([(99, 50)], "id long, ts long"))
    assert incremental_scan(df2, store, "ts").count() == 0


def test_structured_streaming_windowed_counts(spark):
    from news_combinator_spark.streaming.incremental import (
        streaming_event_counts,
    )

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    q = streaming_event_counts(
        spark, SF_MED, schema, window="1 hour", watermark="2 hours",
        query_name="t_counts",
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM t_counts")
        assert out.count() > 0
        row = out.limit(1).collect()[0]
        assert row["n"] >= 1
    finally:
        q.stop()


def test_streaming_seen_filter_exact_mode(spark, tmp_path):
    """state='exact' stores urls, not 64-bit hashes: no collision can
    drop a never-seen URL (parity with the batch frontier's exact
    anti-join semantics)."""
    from news_combinator_spark.streaming.incremental import (
        streaming_seen_filter,
    )

    in_dir = str(tmp_path / "disc2")
    schema = "url string, host string, priority int"
    spark.createDataFrame(
        [("http://x.test/1", "x.test", 1),
         ("http://x.test/2", "x.test", 2),
         ("http://x.test/1", "x.test", 1)],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming_seen_filter(
        spark, in_dir, query_name="t_seen_exact", state="exact"
    )
    try:
        q.processAllAvailable()
        urls = [r["url"] for r in spark.sql("SELECT url FROM t_seen_exact").collect()]
        assert sorted(urls) == ["http://x.test/1", "http://x.test/2"]
    finally:
        q.stop()
    with pytest.raises(ValueError):
        streaming_seen_filter(spark, in_dir, state="bogus")


def test_streaming_stateful_seen_filter(spark, tmp_path):
    """C1 as a stateful streaming op: URLs seen in an earlier
    micro-batch must not be re-emitted by a later one."""
    from news_combinator_spark.streaming.incremental import (
        streaming_seen_filter,
    )

    in_dir = str(tmp_path / "discovered")
    schema = "url string, host string, priority int"

    def write_batch(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    write_batch(
        [("http://a.test/1", "a.test", 1),
         ("http://a.test/2", "a.test", 2),
         ("http://b.test/1", "b.test", 1),
         ("http://a.test/1", "a.test", 1)],  # within-batch dup
        0,
    )
    q = streaming_seen_filter(spark, in_dir, query_name="t_seen")
    try:
        q.processAllAvailable()
        got1 = {r["url"] for r in spark.sql("SELECT * FROM t_seen").collect()}
        assert got1 == {"http://a.test/1", "http://a.test/2", "http://b.test/1"}
        # second micro-batch: two repeats + two fresh
        write_batch(
            [("http://a.test/2", "a.test", 2),
             ("http://b.test/1", "b.test", 1),
             ("http://b.test/2", "b.test", 2),
             ("http://c.test/1", "c.test", 1)],
            1,
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT url FROM t_seen").collect()
        urls = [r["url"] for r in rows]
        assert len(urls) == len(set(urls)), "a url was emitted twice"
        assert set(urls) == {
            "http://a.test/1", "http://a.test/2", "http://b.test/1",
            "http://b.test/2", "http://c.test/1",
        }
    finally:
        q.stop()


def test_streaming_politeness_scheduler(spark, tmp_path):
    """C2 as a stateful streaming op: per host at most `budget` URLs
    per micro-batch chosen by (priority, url); losers persist as a
    capped backlog and win later batches; batch_seq numbers each
    host's emissions cumulatively."""
    from news_combinator_spark.streaming.incremental import (
        streaming_politeness_scheduler,
    )

    in_dir = str(tmp_path / "cand")
    schema = "url string, host string, priority int"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # batch 1: 4 candidates on a.test (budget 2) + 1 on b.test
    write_batch(
        [("http://a.test/3", "a.test", 1),
         ("http://a.test/1", "a.test", 0),
         ("http://a.test/2", "a.test", 0),
         ("http://a.test/4", "a.test", 2),
         ("http://b.test/1", "b.test", 1)],
    )
    q = streaming_politeness_scheduler(
        spark, in_dir, budget=2, query_name="t_sched"
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM t_sched ORDER BY host, batch_seq"
        ).collect()
        a1 = [(r.url, r.batch_seq) for r in got if r.host == "a.test"]
        assert a1 == [("http://a.test/1", 0), ("http://a.test/2", 1)]
        assert [(r.url, r.batch_seq) for r in got if r.host == "b.test"] == [
            ("http://b.test/1", 0)
        ]
        # batch 2: one better-priority newcomer competes with backlog
        write_batch([("http://a.test/0", "a.test", 0)])
        q.processAllAvailable()
        got2 = spark.sql(
            "SELECT * FROM t_sched WHERE host = 'a.test' "
            "ORDER BY batch_seq"
        ).collect()
        # newcomer (prio 0) wins slot 2; backlog prio-1 url takes slot 3;
        # the prio-2 url stays backlogged
        assert [(r.url, r.batch_seq) for r in got2] == [
            ("http://a.test/1", 0), ("http://a.test/2", 1),
            ("http://a.test/0", 2), ("http://a.test/3", 3),
        ]
        # batch 3: any a.test traffic re-invokes the host's group, so
        # the backlogged prio-2 url finally drains ahead of the worse
        # newcomer (NoTimeout: an idle host's backlog waits — see
        # the operator docstring)
        write_batch([("http://a.test/9", "a.test", 5)])
        q.processAllAvailable()
        got3 = spark.sql(
            "SELECT url, batch_seq FROM t_sched WHERE host = 'a.test' "
            "ORDER BY batch_seq"
        ).collect()
        assert [(r.url, r.batch_seq) for r in got3[-2:]] == [
            ("http://a.test/4", 4), ("http://a.test/9", 5),
        ]
    finally:
        q.stop()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        streaming_politeness_scheduler(spark, in_dir, budget=0)


def test_streaming_politeness_drain_timeout(spark, tmp_path):
    """ProcessingTimeTimeout mode (VERDICT r4 #6): an idle host's
    backlog drains at the politeness rate via per-host timers with NO
    further input. In timeout mode the micro-batch engine polls
    batches continuously (processAllAvailable never settles — see the
    operator docstring), so this test drives a wall-clock timeline
    and polls the sink: admit (budget 2 of 5, backlog 3) -> hold
    under the 6s timer (proves no premature drain) -> timer drain of
    2 -> timer drain of the last 1 -> reappearance restarts the
    politeness session."""
    import time

    from news_combinator_spark.streaming.incremental import (
        streaming_politeness_scheduler,
    )

    in_dir = str(tmp_path / "cand")
    schema = "url string, host string, priority int"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def a_rows():
        return [
            (r.url, r.batch_seq)
            for r in spark.sql(
                "SELECT url, batch_seq FROM t_drain "
                "WHERE url LIKE '%a.test%' ORDER BY batch_seq"
            ).collect()
        ]

    def poll_until(n, deadline_s=45):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            rows = a_rows()
            if len(rows) >= n:
                return rows
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows: {a_rows()}")

    # priorities chosen so the (priority, url) drain order is unique
    write_batch(
        [("http://a.test/1", "a.test", 0),
         ("http://a.test/2", "a.test", 0),
         ("http://a.test/3", "a.test", 1),
         ("http://a.test/4", "a.test", 1),
         ("http://a.test/5", "a.test", 2)],
    )
    q = streaming_politeness_scheduler(
        spark, in_dir, budget=2, query_name="t_drain",
        drain_timeout_ms=6000,
    )
    try:
        got = poll_until(2)
        # initial batch: exactly budget rows, best (priority, url)
        # first; the 6s timer cannot have fired yet, so the backlog
        # held — this IS the politeness rate limit
        assert got == [
            ("http://a.test/1", 0), ("http://a.test/2", 1),
        ], got
        # first timer firing drains budget more, no input written
        got = poll_until(4)
        assert got[2:] == [
            ("http://a.test/3", 2), ("http://a.test/4", 3),
        ], got
        # second firing drains the last backlog row and removes state
        got = poll_until(5)
        assert got[-1] == ("http://a.test/5", 4), got
        # reappearing host = fresh politeness session: seq restarts
        write_batch([("http://a.test/9", "a.test", 0)])
        got = poll_until(6)
        assert ("http://a.test/9", 0) in got, got
    finally:
        q.stop()


def test_streaming_admission_filter(spark, tmp_path):
    """The batch page-health gates run unchanged on a stream: an
    error page drops, a mojibake page repairs and admits, a short
    page and a non-English page drop, a clean page admits."""
    from news_combinator_spark.streaming.incremental import (
        streaming_admission_filter,
    )

    in_dir = str(tmp_path / "landed")
    big = "<html><h1>Doc</h1><p>" + "x" * 3000 + "</p></html>"
    long_text = " ".join(f"w{i}" for i in range(40))
    rows = [
        ("http://h/err", "h", "<html><h1>404 Not Found</h1></html>",
         "gone", "en"),
        ("http://h/moji", "h", big,
         long_text.replace("w1 ", "thÃ©Ã©Ã© "), "en"),
        ("http://h/short", "h", big, "too short", "en"),
        ("http://h/fr", "h", big, long_text, "fr"),
        ("http://h/good", "h", big, long_text + "  extra   spaces ", "en"),
    ]
    spark.createDataFrame(
        rows,
        "url string, host string, html_str string, text string, "
        "lang string",
    ).coalesce(1).write.parquet(in_dir)
    q = streaming_admission_filter(spark, in_dir, query_name="t_adm")
    try:
        q.processAllAvailable()
        got = {
            r.url: r for r in spark.sql("SELECT * FROM t_adm").collect()
        }
        assert set(got) == {"http://h/moji", "http://h/good"}
        assert "thééé" in got["http://h/moji"].norm_text
        assert "  " not in got["http://h/good"].norm_text
    finally:
        q.stop()


def test_png_codec_roundtrip_and_integrity(spark):
    import struct
    import zlib

    from news_combinator_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
        with_png_features,
    )

    png = encode_png_gray(5, 4, 7)
    # genuine PNG container: signature + IHDR first
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    w, h, px = decode_png_gray(png)
    assert (w, h) == (5, 4)
    assert list(px) == [(7 + i * 31) % 251 for i in range(20)]

    # CRC corruption must be detected, not silently decoded
    bad = bytearray(png)
    bad[20] ^= 0xFF  # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(bad))

    # Sub/Up filtered scanlines decode too (an external encoder may
    # pick them); build one by hand: 3x2, row0 Sub, row1 Up
    raw = bytes([1, 10, 5, 5, 2, 1, 1, 1])  # row0: 10,15,20; row1: 11,16,21
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    filt = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    w2, h2, px2 = decode_png_gray(filt)
    assert (w2, h2) == (3, 2)
    assert list(px2) == [10, 15, 20, 11, 16, 21]

    # non-PNG payloads act like an unsupported codec
    with pytest.raises(NotImplementedError):
        decode_png_gray(b"\xff\xd8\xff\xe0 jpeg-ish")

    # the Spark kernel end-to-end
    media = spark.createDataFrame(
        [(1, png)], "media_id long, payload binary"
    )
    out = with_png_features(media).collect()[0]
    assert (out["width"], out["height"]) == (5, 4)
    assert out["mean_pixel"] == sum(px) / 20


def test_wav_codec_roundtrip_and_integrity(spark):
    import struct

    from news_combinator_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        with_wav_features,
    )

    wav = encode_wav_pcm16(240, 8000, 5)
    # genuine RIFF/WAVE container: RIFF size WAVE, fmt chunk first
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert wav[12:16] == b"fmt "
    rate, data = decode_wav_pcm16(wav)
    assert rate == 8000 and len(data) == 480
    samples = struct.unpack("<240h", data)
    assert list(samples) == [
        ((5 + j * 97) % 4001) - 2000 for j in range(240)
    ]

    # odd-length chunks are word-aligned: splice a 3-byte LIST chunk
    # between fmt and data (pad byte after it, per RIFF) and the walk
    # must still find the data chunk
    fmt_end = 12 + 8 + 16
    body = (
        b"WAVE" + wav[12:fmt_end]
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        + wav[fmt_end:]
    )
    spliced = b"RIFF" + struct.pack("<I", len(body)) + body
    rate2, data2 = decode_wav_pcm16(spliced)
    assert rate2 == 8000 and data2 == data

    # unsupported formats act like a missing codec, not a crash
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(b"\xff\xfb mpeg-ish frame")
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    stereo = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + stereo_fmt
    )
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav_pcm16(stereo)
    with pytest.raises(ValueError, match="missing"):
        decode_wav_pcm16(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    # the Spark kernel end-to-end
    media = spark.createDataFrame(
        [(1, wav)], "media_id long, payload binary"
    )
    out = with_wav_features(media).collect()[0]
    assert out["sample_rate"] == 8000
    assert out["n_samples"] == 240
    assert out["duration_ms"] == 30
    assert out["peak_amp"] == max(abs(s) for s in samples)
    assert out["mean_abs_amp"] == sum(abs(s) for s in samples) / 240


def test_avi_codec_roundtrip_and_frame_sampling(spark):
    import struct

    from news_combinator_spark.operators.multimodal import (
        decode_avi_gray,
        encode_avi_gray,
        with_video_features,
    )

    avi = encode_avi_gray(8, 6, 5, 10, 3)
    # genuine RIFF/AVI container: RIFF size 'AVI ', hdrl LIST first
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert avi[12:16] == b"LIST" and avi[20:24] == b"hdrl"
    w, h, n, uspf, frames = decode_avi_gray(avi)
    assert (w, h, n, uspf) == (8, 6, 5, 100_000)
    for f, fr in enumerate(frames):
        assert list(fr) == [
            (3 + f * 13 + i * 31) % 251 for i in range(48)
        ]

    # header/body frame-count mismatch must be detected
    truncated = avi[: avi.rfind(b"00db")]
    # fix the RIFF size so only the frame loss is the defect
    body_len = len(truncated) - 8
    truncated = (
        truncated[:4] + struct.pack("<I", body_len) + truncated[8:]
    )
    with pytest.raises(ValueError, match="frame count"):
        decode_avi_gray(truncated)

    # compressed streams act like a missing codec
    with pytest.raises(NotImplementedError):
        decode_avi_gray(b"\x00\x00\x01\xba mpeg-ps")

    # the Spark kernel end-to-end: every 2nd frame sampled
    media = spark.createDataFrame(
        [(1, avi)], "media_id long, payload binary"
    )
    out = with_video_features(media, sample_stride=2).collect()[0]
    assert (out["width"], out["height"], out["n_frames"]) == (8, 6, 5)
    assert out["duration_ms"] == (5 * 100_000) // 1000
    sampled = frames[::2]
    exp_mean = sum(sum(fr) for fr in sampled) / sum(
        len(fr) for fr in sampled
    )
    assert out["sampled_mean"] == exp_mean


def test_avi_header_flags_match_container_shape():
    """Review fix: the avih dwFlags word must be 0 — the encoder writes
    no idx1 chunk, so AVIF_HASINDEX (0x10) would promise an index that
    is not there and break strict players/parsers."""
    import struct

    from news_combinator_spark.operators.multimodal import (
        encode_avi_gray,
    )

    avi = encode_avi_gray(4, 4, 2, 10, 1)
    assert b"idx1" not in avi
    pos = avi.find(b"avih")
    assert pos > 0
    size = struct.unpack_from("<I", avi, pos + 4)[0]
    avih = avi[pos + 8: pos + 8 + size]
    # avih layout: dwMicroSecPerFrame, dwMaxBytesPerSec, dwPadding,
    # dwFlags, dwTotalFrames, ...
    dw_flags = struct.unpack_from("<I", avih, 12)[0]
    assert dw_flags == 0
    total_frames = struct.unpack_from("<I", avih, 16)[0]
    assert total_frames == 2


def test_media_kernels_accept_payload_only_input(spark):
    """Review fix: when the payload is the ONLY column, the mapInPandas
    output schema must not start with a leading comma."""
    from news_combinator_spark.operators.multimodal import (
        encode_avi_gray,
        encode_png_gray,
        encode_wav_pcm16,
        with_png_features,
        with_video_features,
        with_wav_features,
    )

    png = spark.createDataFrame(
        [(encode_png_gray(4, 3, 7),)], "payload binary"
    )
    row = with_png_features(png).collect()[0]
    assert (row["width"], row["height"]) == (4, 3)

    wav = spark.createDataFrame(
        [(encode_wav_pcm16(50, 8000, 3),)], "payload binary"
    )
    row = with_wav_features(wav).collect()[0]
    assert (row["sample_rate"], row["n_samples"]) == (8000, 50)

    avi = spark.createDataFrame(
        [(encode_avi_gray(4, 4, 3, 10, 1),)], "payload binary"
    )
    row = with_video_features(avi).collect()[0]
    assert (row["width"], row["n_frames"]) == (4, 3)


def test_avi_strh_is_56_bytes():
    """AVISTREAMHEADER is a fixed 56-byte struct; an extra DWORD would
    shift rcFrame for conformant readers (review fix)."""
    import struct

    from news_combinator_spark.operators.multimodal import (
        encode_avi_gray,
    )

    avi = encode_avi_gray(6, 4, 2, 10, 5)
    pos = avi.find(b"strh")
    size = struct.unpack_from("<I", avi, pos + 4)[0]
    assert size == 56
    body = avi[pos + 8: pos + 8 + size]
    # rcFrame occupies the final 8 bytes: (left, top, right, bottom)
    assert struct.unpack_from("<HHHH", body, 48) == (0, 0, 6, 4)
