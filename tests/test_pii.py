"""PII scrubbing semantics beyond the DuckDB hash gate: pattern
precision, application order, count timing."""

import pyspark.sql.functions as F
import pytest

from news_combinator_spark.functions.pii import scrub_pii, scrub_pii_col


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(spark, text):
    return scrub_pii(_docs(spark, [(0, text)])).collect()[0]


def test_email_redacted_and_counted(spark):
    r = _one(spark, "write to first.last+tag@sub.example.co today")
    assert r.n_emails == 1 and r.n_ips == 0 and r.n_phones == 0
    assert r.clean == "write to <EMAIL> today"


def test_ip_redacted(spark):
    r = _one(spark, "server at 192.168.0.17 responded")
    assert r.n_ips == 1
    assert r.clean == "server at <IP> responded"


def test_version_string_not_an_ip(spark):
    # 1.2.3.4.5 has five octets — the \b-anchored pattern must not
    # fire inside it on either end
    r = _one(spark, "release 1.2.3.4.5 is out")
    assert r.n_ips == 0 and "<IP>" not in r.clean


def test_phone_redacted(spark):
    r = _one(spark, "call +44 201 555 0199 now")
    assert r.n_phones == 1
    assert r.clean == "call <PHONE> now"


def test_bare_number_run_not_a_phone(spark):
    # conservative pattern: requires +CC prefix and separators
    r = _one(spark, "order number 123456789012 shipped")
    assert r.n_phones == 0 and r.clean.endswith("123456789012 shipped")


def test_email_digits_not_double_counted_as_phone(spark):
    # the email is redacted before the phone pass runs, so its digit
    # run can never match the phone pattern
    r = _one(spark, "mail +15550123456@sms.example.com please")
    assert r.n_emails == 1 and r.n_phones == 0
    assert r.clean == "mail <EMAIL> please"


def test_multiple_occurrences_all_redacted(spark):
    r = _one(spark, "a@b.co c@d.org and 10.0.0.1 10.0.0.2")
    assert r.n_emails == 2 and r.n_ips == 2
    assert r.clean == "<EMAIL> <EMAIL> and <IP> <IP>"


def test_scrub_col_matches_scrub_df(spark):
    docs = _docs(spark, [(0, "x a@b.co 1.2.3.4 +1 555 0100 y")])
    via_col = docs.select(scrub_pii_col("text").alias("clean")).collect()
    via_df = scrub_pii(docs).collect()
    assert via_col[0].clean == via_df[0].clean


def test_sentence_final_ip_redacted(spark):
    r = _one(spark, "request came from 10.1.2.3. Then it stopped")
    assert r.n_ips == 1
    assert r.clean == "request came from <IP>. Then it stopped"


def test_trailing_dot_at_end_of_text(spark):
    r = _one(spark, "ping 10.1.2.3.")
    assert r.n_ips == 1 and r.clean == "ping <IP>."
