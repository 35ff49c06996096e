"""C4 line cleaning + Gopher document rules + stratified hash sampling:
golden behavior on crafted text (the catalog oracle runs the same
expressions over the synthetic corpus; rule richness is pinned here)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.heuristics import c4_line_clean, gopher_rules


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends properly.",  # keep
            "Too short.",  # < 5 words
            "this line has plenty of words but no terminal punct",  # no punct
            "Please enable JavaScript to view the comments.",  # blocklist
            "We use cookie banners on every page of this site.",  # blocklist
            'He said "this quoted line has plenty of words too."',  # keep
            "A line mentioning the privacy policy should not stay.",  # blocklist
            "if (x) { return y; } else { return z; }",  # brace blocklist
            "Another perfectly ordinary sentence survives the filter!",  # keep
        ]
    )
    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    row = c4_line_clean(docs).head()
    assert row.n_lines == 9
    assert row.n_kept == 3
    assert row.c4_keep
    kept_lines = row.clean_text.split("\n")
    assert kept_lines[0].startswith("This line has enough")
    assert kept_lines[1].startswith('He said "this quoted')
    assert kept_lines[2].startswith("Another perfectly")


def test_c4_doc_drop_when_nothing_survives(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="no punct here at all"), Row(doc_id=2, text="Short.")]
    )
    out = {r.doc_id: r for r in c4_line_clean(docs).collect()}
    assert not out[1].c4_keep and out[1].n_kept == 0
    assert not out[2].c4_keep  # terminal punct but < 5 words


def test_gopher_rules_signals(spark):
    good = " ".join(["sensible"] * 10 + ["words"] * 25 + ["making"] * 20) + "."
    short = "only three words"
    symbols = " ".join(["word"] * 60) + " # # # # # # # ... ... ..."
    bullets = "\n".join(["- bullet item one two", "- bullet item three four"])
    numeric = " ".join(["12345"] * 60)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=short),
            Row(doc_id=3, text=symbols),
            Row(doc_id=4, text=bullets),
            Row(doc_id=5, text=numeric),
        ]
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].gopher_pass
    assert not out[2].gopher_pass  # word-count floor
    assert out[3].symbol_ratio > 0.1 and not out[3].gopher_pass
    assert out[4].bullet_ratio == 1.0 and not out[4].gopher_pass
    assert out[5].alpha_ratio == 0.0 and not out[5].gopher_pass
    assert out[1].n_words == 55 and 3.0 <= out[1].mean_word_len <= 10.0


def test_stratified_hash_sample_deterministic(spark):
    from wc_vector_indexing_spark.operators.sampling import stratified_hash_sample

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"src{i % 4}") for i in range(2000)]
    )
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = stratified_hash_sample(docs, "source", fr, salt="s")
    b = stratified_hash_sample(docs, "source", fr, salt="s")
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())  # pure function
    by_src = {
        r.source: r.n
        for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["src0"] == 500  # fraction 1.0 keeps everything
    assert "src2" not in by_src  # fraction 0.0 drops everything
    assert 150 <= by_src["src1"] <= 350  # ~50% of 500
    assert by_src.get("src3", 0) == 0  # default fraction 0.0
    # different salt → different (but still deterministic) kept set
    c = stratified_hash_sample(docs, "source", fr, salt="other")
    assert sorted(r.doc_id for r in c.collect()) != ids_a

def test_gate_columns_are_stream_safe(spark):
    """c4_keep_col / gopher_pass_col are pure per-row expressions: they
    must apply to a STREAMING frame without analysis errors (the same
    contract as quality_score_col)."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.heuristics import (
        c4_keep_col,
        gopher_pass_col,
    )

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .withColumn("text", F.lit("A sentence with enough words to pass."))
    )
    gated = stream.filter(c4_keep_col("text")).filter(gopher_pass_col("text", min_words=3))
    assert gated.isStreaming  # plan analyzed clean, no batch-only op

    # batch semantics: the column twins agree with the frame operators
    from wc_vector_indexing_spark.operators.heuristics import c4_line_clean, gopher_rules
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="This line has plenty of words and ends well."),
            Row(doc_id=2, text="no terminal punctuation so c4 drops it"),
        ]
    )
    via_col = {
        r.doc_id: (r.c4, r.gp)
        for r in docs.select(
            "doc_id",
            c4_keep_col("text").alias("c4"),
            gopher_pass_col("text", min_words=3).alias("gp"),
        ).collect()
    }
    via_frame_c4 = {r.doc_id: r.c4_keep for r in c4_line_clean(docs).collect()}
    via_frame_gp = {
        r.doc_id: r.gopher_pass for r in gopher_rules(docs, min_words=3).collect()
    }
    for d in (1, 2):
        assert via_col[d] == (via_frame_c4[d], via_frame_gp[d])


def test_blocklist_gate_word_boundary_exact(spark):
    from wc_vector_indexing_spark.operators.heuristics import blocklist_gate

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a clean page with Nothing listed"),
            Row(doc_id=2, text="contains BANNED word"),          # case-folds
            Row(doc_id=3, text="banned banned twice"),           # counts hits
            Row(doc_id=4, text="unbanned is a different token"), # no substring FP
        ]
    )
    out = {
        r["doc_id"]: (r["n_blocked"], r["keep"])
        for r in blocklist_gate(docs, blocklist=("banned", "forbidden")).collect()
    }
    assert out == {1: (0, True), 2: (1, False), 3: (2, False), 4: (0, True)}
