"""mbox/MIME email source (sources/mbox.py): writer-inverse roundtrips
across transfer encodings and multipart shapes, RFC 2047 subject
decoding, mboxo From-escaping, date parsing, and the malformed-message
quarantine contract."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.sources.mbox import parse_mbox, to_mbox

MSGS = [
    {
        "subject": "Plain seven bit",
        "sender": "a@example.com",
        "date": "Mon, 01 Jan 2024 10:00:00 +0000",
        "body": "hello world\nsecond line\n",
        "encoding": "7bit",
    },
    {
        "subject": "Ünïcode sübject",  # forces RFC 2047 encoding
        "sender": "b@example.com",
        "date": "Tue, 02 Jan 2024 11:30:00 +0200",
        "body": "bäse64 bödy with ümlauts\n",
        "encoding": "base64",
    },
    {
        "subject": "QP + html alternative",
        "sender": "c@example.com",
        "date": "Wed, 03 Jan 2024 00:00:00 -0500",
        "body": "soft wrapped häppy text\n",
        "encoding": "qp",
        "html_alt": True,
    },
]


def test_mbox_roundtrip():
    got = parse_mbox(to_mbox(MSGS))
    assert [m["msg_index"] for m in got] == [0, 1, 2]
    assert [m["subject"] for m in got] == [m["subject"] for m in MSGS]
    assert [m["sender"] for m in got] == [m["sender"] for m in MSGS]
    assert [m["body"] for m in got] == [m["body"] for m in MSGS]
    # multipart/alternative counts both leaves; text/plain wins
    assert [m["n_parts"] for m in got] == [1, 1, 2]
    # epoch seconds honor the timezone offsets
    assert got[0]["date_ts"] == 1704103200  # 10:00 UTC
    assert got[1]["date_ts"] == 1704187800  # 11:30 +0200 = 09:30 UTC
    assert got[2]["date_ts"] == 1704258000  # 00:00 -0500 = 05:00 UTC


def test_from_escaping_in_bodies():
    msgs = [{
        "subject": "s", "sender": "x@y", "date": "Mon, 01 Jan 2024 00:00:00 +0000",
        "body": "From the top\nnot a separator\n", "encoding": "7bit",
    }]
    text = to_mbox(msgs)
    assert ">From the top" in text
    (got,) = parse_mbox(text)
    assert got["body"].startswith("From the top")


def test_missing_date_and_html_only_fallback():
    raw = (
        "From MAILER-DAEMON Thu Jan  1 00:00:00 1970\n"
        "Subject: no date\n"
        "From: z@example.com\n"
        "Content-Type: text/html\n"
        "\n"
        "<p>only html</p>\n"
    )
    (got,) = parse_mbox(raw)
    assert got["date_ts"] is None
    assert "only html" in got["body"]


def test_quarantine_and_skip_bad():
    raw = "From MAILER-DAEMON\n\njust a body, no headers at all\n"
    with pytest.raises(ValueError, match="no headers"):
        parse_mbox(raw)
    assert parse_mbox(raw, skip_bad=True) == []
    mixed = raw + to_mbox(MSGS[:1])
    got = parse_mbox(mixed, skip_bad=True)
    assert len(got) == 1 and got[0]["subject"] == "Plain seven bit"


def test_mbox_messages_distributed_equals_whole_file(spark):
    """The JVM-split + per-message Arrow parse (mbox_messages — the
    mega-mailbox-proof shape) must produce exactly the rows of the
    whole-file parse_mbox walk, including the mboxo '>From ' unescape
    and the From_-line drop."""
    from wc_vector_indexing_spark.sources.mbox import mbox_messages

    msgs = list(MSGS)
    msgs.append({
        "subject": "Body with From-escapes",
        "sender": "d@example.com",
        "date": "Thu, 04 Jan 2024 09:00:00 +0000",
        "body": "From the top\nordinary line\nFrom here too\n",
        "encoding": "7bit",
    })
    text = to_mbox(msgs)
    expected = parse_mbox(text)
    df = spark.createDataFrame([(7, text)], "doc_id long, mbox_text string")
    got = sorted(
        (r.asDict() for r in mbox_messages(df, shuffle_partitions=4).collect()),
        key=lambda r: r["msg_index"],
    )
    assert len(got) == len(expected) == 4
    for g, e in zip(got, expected):
        assert g.pop("doc_id") == 7
        assert g == e, (g, e)
