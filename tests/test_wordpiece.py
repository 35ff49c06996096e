"""WordPiece trainer/encoder: likelihood-vs-frequency argmax pinned,
greedy longest-match goldens, all-or-nothing UNK rule, and the
distributed pair-score stage vs a driver recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.bpe import word_counts
from wc_vector_indexing_spark.operators.wordpiece import (
    UNK,
    _SCALE,
    pair_scores,
    train_wordpiece_from_counts,
    wordpiece_encode_col,
    wordpiece_tokenize,
)


# ------------------------------------------------------------ trainer

def test_likelihood_beats_raw_frequency():
    # BPE would merge (a,##a) first (count 100 vs 2); WordPiece's
    # count(ab)/(count(a)count(b)) picks the rare-but-exclusive pair:
    # (a,##a): 100/(100*100)=0.01   (x,##y): 2/(2*2)=0.5
    vocab = train_wordpiece_from_counts({"aa": 100, "xy": 2},
                                        vocab_size=5, min_pair_count=1)
    assert vocab[:4] == ["##a", "##y", "a", "x"]  # alphabet, sorted
    assert vocab[4] == "xy"  # first merge


def test_merge_strips_continuation_prefix():
    vocab = train_wordpiece_from_counts({"ab": 3}, vocab_size=4,
                                        min_pair_count=1)
    assert "ab" in vocab and "a##b" not in vocab


def test_tie_breaks_lexicographic():
    # equal scores: 10/(11*10) == 1/(11*1); smaller (a,b) pair wins
    vocab = train_wordpiece_from_counts({"ab": 10, "ac": 1},
                                        vocab_size=4, min_pair_count=1)
    assert vocab[3] == "ab"


def test_min_pair_count_floor():
    vocab = train_wordpiece_from_counts({"ab": 1}, vocab_size=10,
                                        min_pair_count=2)
    assert vocab == ["##b", "a"]  # no merge possible


def test_trainer_deterministic():
    counts = {"hugging": 5, "hugs": 3, "huh": 2, "bug": 7}
    a = train_wordpiece_from_counts(counts, vocab_size=30)
    b = train_wordpiece_from_counts(dict(reversed(list(counts.items()))),
                                    vocab_size=30)
    assert a == b


# ------------------------------------------------------------ tokenize

def test_tokenize_goldens():
    vocab = {"un", "##want", "##ed", "want", "##aff", "##able"}
    assert wordpiece_tokenize("unwanted", vocab) == ["un", "##want", "##ed"]
    assert wordpiece_tokenize("want", vocab) == ["want"]
    # dead end anywhere -> whole word UNK (all-or-nothing, not per-char)
    assert wordpiece_tokenize("unwantedly", vocab) == [UNK]
    assert wordpiece_tokenize("xyz", vocab) == [UNK]
    assert wordpiece_tokenize("", vocab) == []


def test_tokenize_greedy_longest_first():
    vocab = {"a", "ab", "##b", "##c"}
    # longest match at the cursor: "ab" beats "a"+"##b"
    assert wordpiece_tokenize("abc", vocab) == ["ab", "##c"]


def test_tokenize_long_word_guard():
    assert wordpiece_tokenize("a" * 101, {"a", "##a"},
                              max_word_chars=100) == [UNK]


def test_roundtrip_own_training_words():
    counts = {"hugging": 5, "hugs": 3, "pug": 4}
    vocab = train_wordpiece_from_counts(counts, vocab_size=40,
                                        min_pair_count=1)
    vset = set(vocab)
    for w in counts:  # a big-enough vocab segments training words UNK-free
        pieces = wordpiece_tokenize(w, vset)
        assert UNK not in pieces
        assert (pieces[0] + "".join(p[2:] for p in pieces[1:])) == w


# ------------------------------------------------------------ Spark side

def test_encode_col_matches_python_twin(spark):
    vocab = ["the", "quick", "##ick", "qu", "b", "##rown", "fox"]
    df = spark.createDataFrame(
        [("The quick brown fox",), ("",), (None,)], ["text"])
    got = df.select(wordpiece_encode_col(vocab, "text").alias("p")).collect()
    assert got[0].p == ["the", "quick", "b", "##rown", "fox"]
    assert got[1].p == [] and got[2].p == []


def test_pair_scores_matches_driver_recompute(spark):
    rows = [("hugging face hugs the bug",), ("the bug hugs back",)]
    docs = spark.createDataFrame(rows, ["text"])
    wc = word_counts(docs)
    got = {(r.a, r.b): (r.pair_n, r.score_ppb)
           for r in pair_scores(wc, top_k=100).collect()}
    # driver recompute from the same counts
    counts = {r.word: r.n for r in wc.collect()}
    sym_n: dict[str, int] = {}
    pair_n: dict[tuple[str, str], int] = {}
    for w, n in counts.items():
        syms = [w[0]] + ["##" + c for c in w[1:]]
        for s in syms:
            sym_n[s] = sym_n.get(s, 0) + n
        for a, b in zip(syms, syms[1:]):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + n
    want = {p: (c, c * _SCALE // (sym_n[p[0]] * sym_n[p[1]]))
            for p, c in pair_n.items()}
    assert got == want
