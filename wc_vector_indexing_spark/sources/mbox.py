"""mbox / MIME email source (public RFC 4155 mbox framing + RFC 2045
MIME + RFC 2047 encoded-word headers, parsed with the stdlib ``email``
package): mailing-list archives are a classic training corpus, and a
pipeline ingests them as one row per message — subject/sender/date
plus the decoded text/plain body, whatever transfer encoding
(base64, quoted-printable, 7bit) and charset the writer picked.

Framing: messages start at lines beginning ``From `` (mboxo); body
lines that themselves start with ``From `` arrive ``>``-escaped and
are unescaped here. Bodies prefer the first text/plain leaf of a
multipart tree; HTML-only messages fall back to the first text/* leaf.
Malformed messages raise ValueError (quarantine contract) unless
``skip_bad``.

Spark shape: per-blob parse is an embarrassingly parallel Arrow map
exploding one row per message; zero shuffle until the caller
aggregates.

Reference note: the reference engine ingests only store rows (SURVEY
§1.1); north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import email
import email.header
import email.policy
import email.utils

from wc_vector_indexing_spark.operators.contract import quarantine


def _decode_header(value: str | None) -> str | None:
    if value is None:
        return None
    parts = []
    for chunk, charset in email.header.decode_header(value):
        if isinstance(chunk, bytes):
            parts.append(chunk.decode(charset or "ascii", "replace"))
        else:
            parts.append(chunk)
    return "".join(parts)


def _body_text(msg) -> str | None:
    """First text/plain leaf (fallback: first text/* leaf), decoded
    per its Content-Transfer-Encoding and charset."""
    fallback = None
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if ctype == "text/plain" or (fallback is None and ctype.startswith("text/")):
            payload = part.get_payload(decode=True)
            if payload is None:
                continue
            charset = part.get_content_charset() or "utf-8"
            text = payload.decode(charset, "replace")
            if ctype == "text/plain":
                return text
            fallback = text
    return fallback


def _parse_message_lines(lines: list[str], i: int) -> dict:
    """One framed message (already unescaped, From_ line removed) →
    the per-message row dict. Raises ValueError (quarantine contract)."""
    if lines and lines[-1] == "":
        lines = lines[:-1]  # the blank separator line is mbox framing
    try:
        msg = email.message_from_string("\n".join(lines))
        if not msg.keys():
            raise ValueError("mbox: message has no headers")
        date_ts = None
        if msg["Date"]:
            dt = email.utils.parsedate_to_datetime(msg["Date"])
            if dt is not None:
                date_ts = int(dt.timestamp())
        n_parts = sum(1 for p in msg.walk() if not p.is_multipart())
        return {
            "msg_index": i,
            "subject": _decode_header(msg["Subject"]),
            "sender": _decode_header(msg["From"]),
            "date_ts": date_ts,
            "body": _body_text(msg),
            "n_parts": n_parts,
        }
    except Exception as exc:
        raise ValueError(f"mbox: message {i} failed to parse: {exc}") from exc


@quarantine("mbox")
def parse_mbox(text: str, skip_bad: bool = False) -> list[dict]:
    """mbox text → [{msg_index, subject, sender, date_ts, body,
    n_parts}] in file order. date_ts is epoch seconds (None when the
    Date header is absent/unparseable)."""
    raw_msgs: list[list[str]] = []
    cur: list[str] | None = None
    for line in text.split("\n"):
        if line.startswith("From "):
            cur = []
            raw_msgs.append(cur)
        elif cur is not None:
            # mboxo unescaping: '>From ' at line start was a body line
            cur.append(line[1:] if line.startswith(">From ") else line)
    out: list[dict] = []
    for i, lines in enumerate(raw_msgs):
        try:
            out.append(_parse_message_lines(lines, i))
        except ValueError:
            if skip_bad:
                continue
            raise
    return out


def mbox_messages(df, text_col: str = "mbox_text", id_col: str = "doc_id",
                  shuffle_partitions: int = 32):
    """Distributed mbox explode: the shape that survives a mega-mailbox.

    The only per-FILE work is JVM codegen string surgery (mboxo
    unescape + RFC 4155 ``\\nFrom `` framing split + posexplode); the
    per-MESSAGE MIME parse then runs as an Arrow map over rows that a
    repartition has already spread across the cluster — so one
    2000-message mailbox costs the same wall-clock as 2000 one-message
    mailboxes (measured in BENCH_SKEW.json's fixture section; the
    whole-file ``parse_mbox`` walk is the straggler form this
    replaces). Returns (id_col, msg_index, subject, sender, date_ts,
    body, n_parts)."""
    from pyspark.sql import functions as F

    # Split FIRST on the still-escaped text (body '>From ' lines can't
    # match '\nFrom '), THEN unescape per message — the reverse order
    # would turn escaped body lines into false message boundaries.
    parts = F.split(F.concat(F.lit("\n"), F.col(text_col)), "\nFrom ")
    framed = df.select(
        id_col,
        F.posexplode(F.slice(parts, 2, F.size(parts))).alias(
            "msg_index", "_raw"),
    ).select(
        id_col,
        "msg_index",
        F.regexp_replace("_raw", "\n>From ", "\nFrom ").alias("_raw"),
    )

    def parse(batches):
        import pandas as pd

        cols = [id_col, "msg_index", "subject", "sender", "date_ts",
                "body", "n_parts"]
        for pdf in batches:
            out = []
            for did, idx, raw in zip(pdf[id_col], pdf["msg_index"],
                                     pdf["_raw"]):
                body_lines = str(raw).split("\n")[1:]  # drop the From_ line
                row = _parse_message_lines(body_lines, int(idx))
                out.append({id_col: int(did), **row})
            yield pd.DataFrame(out, columns=cols)

    return framed.repartition(shuffle_partitions).mapInPandas(
        parse,
        schema=f"{id_col} long, msg_index long, subject string, "
               "sender string, date_ts long, body string, n_parts long",
    )


def to_mbox(messages: list[dict]) -> str:
    """Writer half (independent of the parser: stdlib EmailMessage +
    generator): each dict carries subject, sender, date (RFC 2822
    string), body, and optional encoding ('base64' | 'qp' | '7bit')
    and html_alt (adds a multipart/alternative HTML part)."""
    from email.message import EmailMessage

    chunks = []
    for m in messages:
        em = EmailMessage()
        em["Subject"] = m["subject"]
        em["From"] = m["sender"]
        em["Date"] = m["date"]
        cte = m.get("encoding", "7bit")
        em.set_content(
            m["body"],
            cte=("base64" if cte == "base64"
                 else "quoted-printable" if cte == "qp" else "7bit"),
        )
        if m.get("html_alt"):
            em.add_alternative(f"<p>{m['body']}</p>", subtype="html")
        text = em.as_string()
        # mboxo escaping of body lines that start with 'From '
        body_escaped = "\n".join(
            ">" + ln if ln.startswith("From ") else ln
            for ln in text.split("\n")
        )
        chunks.append(f"From MAILER-DAEMON Thu Jan  1 00:00:00 1970\n{body_escaped}\n")
    return "\n".join(chunks)
