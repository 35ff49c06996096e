"""Fingerprint functions (SURVEY §2.4, H1-H3).

Product and chunk fingerprints are the engine's change-detection keys: the
delta-sync MERGE (operators/delta_sync.py) compares them to decide what to
re-embed. They are computed with Spark's built-in ``sha2`` so they stay
JVM-side and deterministic across partitions/runs.

Reference: class-fingerprint.php:23-53. Cross-system byte-parity with the
PHP implementation is a non-goal (different JSON/natural-sort rules);
*self*-determinism and order-insensitive canonicalization are the contract
(dev-plan acceptance :867-870).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import EngineConfig


def sha_product(text_col: Column | str, config: EngineConfig) -> Column:
    """SHA-256 over canonical JSON {config..., text} (H1,
    class-fingerprint.php:23-44).

    The config part is canonicalized driver-side (sorted keys, sorted
    lists — config.Selection.canonical) into one constant JSON string;
    per-row we hash canonical_config_json + '\\n' + text. Reordering the
    selection yields the same sha; changing chunk size / model / dimension
    changes it.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    payload = config.fingerprint_payload_json()
    return F.sha2(F.concat_ws("\n", F.lit(payload), t), 256)


def config_sha(config: EngineConfig) -> str:
    """SHA-256 of the canonical config payload (selection, chunking,
    model, dimension, version) — the text-free fingerprint base."""
    import hashlib

    return hashlib.sha256(config.fingerprint_payload_json().encode("utf-8")).hexdigest()


def sha_chunk_bound(
    config: EngineConfig, chunk_index: Column | str, chunk_text: Column | str
) -> Column:
    """Chunk fingerprint: sha256(config_sha \\n chunk_index \\n chunk_text).

    DELIBERATE divergence from the reference, which chains the chunk sha
    to the *product* sha (class-fingerprint.php:50-53,
    ``$product_sha . "\\n" . $chunk_index . "\\n" . $chunk_text``). Since
    the product sha includes the full normalized text, any one-character
    edit changes EVERY chunk sha and forces a full re-embed — defeating
    the minimal-re-embedding delta its own dev-plan specifies (case C,
    dev-plan:1524-1531). Binding to the config sha instead keeps chunk
    identity stable under unrelated edits: only chunks whose own text
    (or index) changed re-embed. At 100 TB this is the difference between
    re-embedding a corpus and re-embedding an edit.
    """
    i = F.col(chunk_index) if isinstance(chunk_index, str) else chunk_index
    t = F.col(chunk_text) if isinstance(chunk_text, str) else chunk_text
    return F.sha2(F.concat_ws("\n", F.lit(config_sha(config)), i.cast("string"), t), 256)


def sha_chunk(
    product_sha: Column | str, chunk_index: Column | str, chunk_text: Column | str
) -> Column:
    """sha256(product_sha \\n chunk_index \\n chunk_text) — the
    reference's exact H3 chain (class-fingerprint.php:49-53), kept for
    parity demonstration; the delta-sync path uses sha_chunk_bound."""
    p = F.col(product_sha) if isinstance(product_sha, str) else product_sha
    i = F.col(chunk_index) if isinstance(chunk_index, str) else chunk_index
    t = F.col(chunk_text) if isinstance(chunk_text, str) else chunk_text
    return F.sha2(F.concat_ws("\n", p, i.cast("string"), t), 256)


def sha_text(col: Column | str) -> Column:
    """Plain sha256 hex of a text column — exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)
