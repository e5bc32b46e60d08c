"""WARC envelope parsing unit tests (segmentation, header nulls,
Content-Length truncation)."""

from news_combinator_spark.functions.warc import records_from_warc

_BLOB = (
    "WARC/1.0\n"
    "WARC-Type: warcinfo\n"
    "X-Synth: 1\n"
    "\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-Target-URI: http://h.test/a\n"
    "WARC-Date: 2024-01-02 03:04:05\n"
    "Content-Length: 11\n"
    "\n"
    "hello world\n\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-Target-URI: http://h.test/b\n"
    "WARC-Date: 2024-01-02 03:04:06\n"
    "Content-Length: 14\n"
    "\n"
    "first\n\nsecond!\n\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-Target-URI: http://h.test/c\n"
    "WARC-Date: not-a-date\n"
    "\n"
    "no length header\n\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-Target-URI: http://h.test/d\n"
    "Content-Length: 4\n"
    "\n"
    "truncate me\n\n"
)


def test_records_from_warc(spark):
    blobs = spark.createDataFrame(
        [("h.test", _BLOB)], "host string, warc string"
    )
    rows = records_from_warc(blobs).collect()
    assert len(rows) == 5
    by_uri = {r.target_uri: r for r in rows}

    info = by_uri[None]
    assert info.rec_type == "warcinfo"
    assert info.warc_date is None
    assert info.content_length is None and info.payload is None

    a = by_uri["http://h.test/a"]
    assert a.payload == "hello world"
    assert a.content_length == 11
    assert a.warc_date.isoformat() == "2024-01-02T03:04:05"

    # a blank line INSIDE the body is payload, not a separator —
    # Content-Length is authoritative
    b = by_uri["http://h.test/b"]
    assert b.payload == "first\n\nsecond!"

    # unparseable date -> null; missing Content-Length -> null payload
    c = by_uri["http://h.test/c"]
    assert c.warc_date is None and c.payload is None

    # declared length clips an over-long body
    d = by_uri["http://h.test/d"]
    assert d.payload == "trun"
