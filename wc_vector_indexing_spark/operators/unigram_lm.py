"""Unigram-LM (SentencePiece-style) tokenizer training — the other
half of the tokenizer family next to BPE (operators/bpe.py): the
public algorithm from Kudo 2018 ("Subword Regularization", the
sentencepiece unigram trainer). Reference behavior analogue: the
tokenizer/keyword surface the reference exposes for text indexing
(class-indexer.php document assembly feeding embeddings) — re-expressed
as trainable subword models over the corpus.

Spark shape — identical scale posture to BPE training:

- the ONLY corpus-wide operations are (1) the word-frequency
  aggregation (``bpe.word_counts``, one groupBy capped at top-K) and
  (2) the candidate-piece seeding (:func:`seed_candidates` — one
  substring explode over the bounded word table, one groupBy, top-K).
  Both are plain Catalyst aggregations that scale with executors.
- EM + pruning run DRIVER-LOCAL over the bounded (word, freq) table
  and the bounded candidate set — like the BPE merge loop and the
  PQ/IVF fits, the artifact fit is small by construction; 100 TB of
  corpus changes the counts, not the loop size.
- encoding back over the corpus is one Arrow pass with the trained
  pieces in the task closure (:func:`unigram_encode_col`), zero
  shuffle.

EM here is the exact lattice forward-backward (expected piece counts
under the current model, words weighted by corpus frequency); pruning
keeps the highest-expected-count pieces per round (the common
simplified criterion; sentencepiece's exact loss-drop ranking differs
in ties but converges to the same vocabularies on the corpora the
tests pin) and ALWAYS keeps single characters so every string stays
segmentable. Deterministic throughout: ties break lexicographically.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.bpe import word_counts


# ----------------------------------------------------------- seeding

def seed_candidates(
    words: DataFrame,
    max_piece_len: int = 4,
    seed_size: int = 2000,
) -> DataFrame:
    """Candidate pieces: every substring (length 1..max_piece_len) of
    the bounded word table, scored by frequency × length (the standard
    seed heuristic: long frequent substrings are the pieces worth
    keeping), top ``seed_size`` by (score desc, piece asc). One
    explode + one groupBy over the already-capped word table — the
    distributed half of training. Input: (word, n) from
    ``bpe.word_counts``."""
    pieces = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.length("word"), F.lit(max_piece_len))),
                    lambda ln: F.transform(
                        F.sequence(F.lit(1), F.length("word") - ln + 1),
                        lambda s: F.substring(F.col("word"), s, ln),
                    ),
                )
            )
        ).alias("piece"),
        "n",
    )
    return (
        pieces.groupBy("piece")
        .agg(F.sum(F.col("n") * F.length("piece")).alias("score"),
             F.sum("n").alias("n_occurrences"))
        .orderBy(F.desc("score"), F.asc("piece"))
        .limit(seed_size)
    )


# ----------------------------------------------------- driver-side EM

def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]] | None:
    """Expected piece counts for one word under the current model.
    Returns (log-likelihood, {piece: expected_count}) or None if the
    word cannot be segmented (a char outside the vocab)."""
    n = len(word)
    NEG = -math.inf
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or alpha[j] == NEG:
                continue
            x = alpha[j] + lp
            acc = x if acc == NEG else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x))))
        alpha[i] = acc
    if alpha[n] == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == NEG:
                continue
            x = beta[j] + lp
            acc = x if acc == NEG else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x))))
        beta[i] = acc
    z = alpha[n]
    exp_counts: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == NEG:
                continue
            post = math.exp(alpha[i] + lp + beta[j] - z)
            if post > 0.0:
                exp_counts[piece] = exp_counts.get(piece, 0.0) + post
    return z, exp_counts


def train_unigram_from_counts(
    counts: dict[str, int],
    vocab_size: int = 300,
    seed: dict[str, float] | None = None,
    max_piece_len: int = 4,
    seed_size: int = 2000,
    em_iters: int = 2,
    prune_keep: float = 0.75,
) -> dict[str, float]:
    """EM + prune loop over a (word → corpus frequency) dict. Returns
    {piece: log-probability} of the final vocabulary. ``seed`` (e.g.
    collected from :func:`seed_candidates`) maps candidate pieces to
    initial scores; when None, candidates are seeded locally with the
    same frequency×length heuristic. Single characters present in the
    corpus are never pruned."""
    chars = {c for w in counts for c in w}
    if seed is None:
        scores: dict[str, float] = {}
        for w, n in counts.items():
            for ln in range(1, min(max_piece_len, len(w)) + 1):
                for s in range(len(w) - ln + 1):
                    p = w[s:s + ln]
                    scores[p] = scores.get(p, 0.0) + float(n) * ln
        seed = dict(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
        )
    pieces = set(seed) | chars
    total = sum(max(v, 1e-9) for p, v in seed.items() if p in pieces) or 1.0
    logp = {
        p: math.log(max(seed.get(p, 1e-9), 1e-9) / total) for p in pieces
    }

    while True:
        for _ in range(em_iters):
            agg: dict[str, float] = {}
            for w, n in counts.items():
                fb = _forward_backward(w, logp, max_piece_len)
                if fb is None:
                    continue
                for piece, c in fb[1].items():
                    agg[piece] = agg.get(piece, 0.0) + c * n
            z = sum(agg.values()) or 1.0
            logp = {
                p: math.log(max(agg.get(p, 0.0), 1e-12) / z) for p in logp
            }
        if len(logp) <= vocab_size:
            break
        # prune: keep single chars + the top expected-probability pieces
        multi = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-logp[p], p),
        )
        target = max(vocab_size, int(len(logp) * prune_keep))
        keep_multi = multi[: max(0, target - len(chars))]
        pieces = chars | set(keep_multi)
        if len(pieces) == len(logp):
            # char floor reached (alphabet alone exceeds vocab_size):
            # nothing left to prune — without this, the loop never
            # terminates on large-alphabet (e.g. CJK) corpora
            logp = {p: logp[p] for p in pieces}
            break
        logp = {p: logp[p] for p in pieces}
    # renormalize after the final prune
    z = sum(math.exp(v) for v in logp.values()) or 1.0
    return {p: v - math.log(z) for p, v in logp.items()}


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 4
) -> list[str]:
    """Highest-log-probability segmentation; ties prefer FEWER pieces,
    then the lexicographically smallest piece sequence (deterministic
    across runs/hosts). Raises ValueError when a character is outside
    the vocabulary — the caller decides quarantine semantics."""
    n = len(word)
    best: list[tuple[float, int, list[str]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, [])
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            prev = best[j]
            if prev is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            c = (prev[0] + lp, prev[1] + 1, prev[2] + [piece])
            if (
                cand is None
                or c[0] > cand[0] + 1e-12
                or (abs(c[0] - cand[0]) <= 1e-12
                    and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[i] = cand
    if best[n] is None:
        raise ValueError(f"unsegmentable word {word!r} (OOV character)")
    return best[n][2]


def sample_segment(
    word: str,
    logp: dict[str, float],
    max_piece_len: int = 4,
    alpha: float = 0.5,
    seed: int = 0,
) -> list[str]:
    """Subword regularization (Kudo 2018 §3): draw a segmentation from
    P(seg|word)^alpha via forward-filtering / backward-sampling on the
    piece lattice. alpha→∞ degenerates to Viterbi; alpha→0 approaches
    uniform over segmentations. The RNG is derived from (word, seed),
    so the draw is a pure function — Spark task retries and re-runs
    reproduce the same augmentation."""
    import hashlib as _hashlib
    import random as _random

    n = len(word)
    NEG = -math.inf
    # tempered forward scores
    alpha_f = [NEG] * (n + 1)
    alpha_f[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or alpha_f[j] == NEG:
                continue
            x = alpha_f[j] + alpha * lp
            acc = x if acc == NEG else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x))))
        alpha_f[i] = acc
    if alpha_f[n] == NEG:
        raise ValueError(f"unsegmentable word {word!r} (OOV character)")
    rng = _random.Random(
        int.from_bytes(
            _hashlib.sha256(f"{seed}\x00{word}".encode()).digest()[:8], "big"
        )
    )
    pieces: list[str] = []
    i = n
    while i > 0:
        cands: list[tuple[int, float]] = []
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or alpha_f[j] == NEG:
                continue
            cands.append((j, alpha_f[j] + alpha * lp))
        mx = max(w for _, w in cands)
        weights = [math.exp(w - mx) for _, w in cands]
        j = rng.choices([c[0] for c in cands], weights=weights)[0]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def unigram_sample_encode_col(
    logp: dict[str, float],
    text_col: str | Column,
    max_piece_len: int = 4,
    alpha: float = 0.5,
    seed: int = 0,
) -> Column:
    """Arrow-batched sampled encode for training-time augmentation:
    per-word lattice sampling with the occurrence index folded into
    the seed, so repeated words inside one text draw independent
    segmentations while the whole column stays a pure function of
    (text, seed) — retry-stable. OOV falls back like the exact
    encoder."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringizes
    # them, which pandas_udf's signature inference rejects
    @pandas_udf("array<string>")
    def enc(texts):
        out = []
        for t in texts:
            pieces: list[str] = []
            for k, w in enumerate((t or "").lower().split()):
                try:
                    pieces.extend(
                        sample_segment(
                            w, logp, max_piece_len, alpha, seed ^ (k + 1)
                        )
                    )
                except ValueError:
                    pieces.extend(c if c in logp else "<unk>" for c in w)
            out.append(pieces)
        return pd.Series(out)

    return enc(F.col(text_col) if isinstance(text_col, str) else text_col)


# ------------------------------------------------------------ Spark halves

def train_unigram(
    docs: DataFrame,
    vocab_size: int = 300,
    text_col: str = "text",
    max_words: int = 1_000_000,
    max_piece_len: int = 4,
    seed_size: int = 2000,
) -> dict[str, float]:
    """End-to-end: distributed word counting + distributed candidate
    seeding + driver-local EM/prune. Both collects are bounded by
    construction (top-K tables)."""
    wc = word_counts(docs, text_col, max_words)
    wc = wc.cache()
    counts = {r.word: r.n for r in wc.collect()}
    seed = {
        r.piece: float(r.score)
        for r in seed_candidates(wc, max_piece_len, seed_size).collect()
    }
    wc.unpersist()
    return train_unigram_from_counts(
        counts, vocab_size, seed=seed,
        max_piece_len=max_piece_len, seed_size=seed_size,
    )


def unigram_encode_col(
    logp: dict[str, float],
    text_col: str | Column,
    max_piece_len: int = 4,
) -> Column:
    """Arrow-batched encode: whitespace pre-tokenize (the same rule as
    ``word_counts``), per-word Viterbi with the trained pieces in the
    task closure, OOV words fall back to single characters (OOV
    CHARACTERS become the '<unk>' piece rather than failing the
    batch). Returns array<string> of pieces."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # distinct-word memo: corpora are Zipfian, so most Viterbi calls
    # repeat — lives in the UDF closure, so each python worker keeps it
    # across batches; bounded
    memo: dict[str, list[str]] = {}

    # no type hints: `from __future__ import annotations` stringizes
    # them, which pandas_udf's signature inference rejects
    @pandas_udf("array<string>")
    def enc(texts):
        def seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                try:
                    got = viterbi_segment(w, logp, max_piece_len)
                except ValueError:
                    got = [c if c in logp else "<unk>" for c in w]
                if len(memo) < 200_000:
                    memo[w] = got
            return got

        out = []
        for t in texts:
            pieces: list[str] = []
            for w in (t or "").lower().split():
                pieces.extend(seg(w))
            out.append(pieces)
        return pd.Series(out)

    return enc(F.col(text_col) if isinstance(text_col, str) else text_col)
