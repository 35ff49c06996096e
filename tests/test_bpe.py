"""BPE trainer: golden merge sequence on a hand-computed corpus,
determinism, encode properties (concatenation roundtrip, monotone
compression), and the distributed word-count split."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.bpe import (
    END_WORD,
    bpe_encode_col,
    segment_word,
    train_bpe,
    train_bpe_from_counts,
    word_counts,
)


def test_golden_merges_hand_computed():
    # aaab x2, aab x1 with end-of-word marker. Pair counts round 1:
    # (a,a): 2*2 + 1 = 5; (a,b): 3; (b,</w>): 3 → merge (a,a).
    # Round 2: aaab=[aa,a,b,</w>] x2, aab=[aa,b,</w>]:
    # (aa,a):2, (a,b):2, (aa,b):1, (b,</w>):3 → merge (b,</w>).
    # Round 3: (aa,a):2, (a,b</w>):2, (aa,b</w>):1 → tie broken
    # lexicographically: ('a','b</w>') < ('aa','a') → merge (a, b</w>).
    merges = train_bpe_from_counts({"aaab": 2, "aab": 1}, num_merges=3)
    assert merges == [("a", "a"), ("b", END_WORD), ("a", "b" + END_WORD)]


def test_min_pair_count_stops():
    merges = train_bpe_from_counts({"ab": 1, "cd": 1}, num_merges=10, min_pair_count=2)
    assert merges == []  # no pair reaches count 2


def test_segment_word_roundtrip_and_compression():
    counts = {"lower": 4, "lowest": 3, "newer": 2, "newest": 5}
    m_few = train_bpe_from_counts(counts, num_merges=3, min_pair_count=1)
    m_many = train_bpe_from_counts(counts, num_merges=12, min_pair_count=1)
    ranks_few = {p: i for i, p in enumerate(m_few)}
    ranks_many = {p: i for i, p in enumerate(m_many)}
    for w in counts:
        seg_few = segment_word(w, ranks_few)
        seg_many = segment_word(w, ranks_many)
        assert "".join(seg_few) == w + END_WORD  # lossless
        assert "".join(seg_many) == w + END_WORD
        assert len(seg_many) <= len(seg_few)  # more merges never worse


def test_train_bpe_distributed_matches_local(spark):
    texts = ["low low lower", "newest newest newest widest", "low widest newest"]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    assert train_bpe(docs, num_merges=8, min_pair_count=1) == train_bpe_from_counts(
        counts, num_merges=8, min_pair_count=1
    )
    wc = {r.word: r.n for r in word_counts(docs).collect()}
    assert wc == counts


def test_bpe_encode_col(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="newest lowest"), Row(doc_id=2, text="")]
    )
    merges = train_bpe_from_counts(
        {"newest": 5, "lowest": 4, "newer": 2}, num_merges=10, min_pair_count=1
    )
    out = {
        r.doc_id: r.pieces
        for r in docs.select(
            "doc_id", bpe_encode_col(merges, "text").alias("pieces")
        ).collect()
    }
    assert "".join(out[1]) == "newest" + END_WORD + "lowest" + END_WORD
    assert out[2] == []
    # frequent suffix 'est</w>' should have merged into one piece
    assert any(p.endswith("est" + END_WORD) or p == "est" + END_WORD for p in out[1])

def test_tokenizer_eval_scorecard(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.bpe import tokenizer_eval

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="low low lower"), Row(doc_id=2, text="lowest low")]
    )
    # merges that rebuild 'low' fully: l+o, lo+w
    merges = [("l", "o"), ("lo", "w")]
    rows = {r.tokenizer: r for r in tokenizer_eval(docs, merges).collect()}
    assert set(rows) == {"whitespace", "regex_bpeish", "trained_bpe"}
    assert rows["whitespace"].n_tokens == 5
    # every tokenizer sees the same bytes
    assert len({r.n_bytes for r in rows.values()}) == 1
    # segment_word appends the </w> marker: 'low'×3 → [low,</w>] (2 each);
    # 'lower' → [low,e,r,</w>] (4); 'lowest' → [low,e,s,t,</w>] (5)
    assert rows["trained_bpe"].n_tokens == 3 * 2 + 4 + 5
    for r in rows.values():
        assert r.bytes_per_token == round(r.n_bytes / r.n_tokens, 4)
