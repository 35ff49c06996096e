"""Engine configuration: field-selection map, embedding model matrix,
chunking parameters, and canonicalization.

Mirrors the reference's Options layer (class-options.php:63-72 defaults,
:368-421 sanitizer) and the fingerprint canonicalizer
(class-fingerprint.php:59-116): the selection map is part of the product
fingerprint, so two configs that select the same fields in a different
*order* must canonicalize to the same bytes (SURVEY H2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

ENGINE_VERSION = 1

# Locked model -> dimension matrix (class-embeddings.php:17-24,
# class-options.php:179-198). Dimension mismatch anywhere is a hard error.
MODEL_DIMENSIONS: dict[str, int] = {
    "text-embedding-3-large": 1536,
    "text-embedding-3-small": 3072,
    "text-embedding-ada-002": 1536,
    # engine-native deterministic fake (network-free tests / CI)
    "fake-deterministic-64": 64,
    "fake-deterministic-256": 256,
}
DEFAULT_MODEL = "text-embedding-3-small"

VALID_TARGETS = ("pinecone", "openai", "local")  # class-options.php:436-451
VALID_STATUSES = ("synced", "pending", "error", "deleted")  # dev-plan:1342
VARIATION_STRATEGIES = ("separate", "collapse", "parent_only")  # options:596-601

# Chunking defaults: 800-token chunks, 100-token overlap, 4.0 chars/token
# (class-options.php:71, class-indexer.php:60, README.md:18)
DEFAULT_CHUNK_SIZE = 800
DEFAULT_CHUNK_OVERLAP = 100
CHARS_PER_TOKEN = 4.0

# Scheduler / batching envelope (class-options.php:454-644)
DEFAULT_SCAN_BATCH_LIMIT = 200  # clamp 20-2000
DEFAULT_EMBED_BATCH = 100  # class-embeddings.php:84-85
DEFAULT_UPSERT_BATCH = 100  # clamp 10-500
DEFAULT_ROLLUP_MAX_VARIATIONS = 500  # clamp 20-5000
DEFAULT_ROLLUP_VALUES_CAP = 20  # clamp 5-200
FIRST_SCAN_LOOKBACK_HOURS = 48  # class-scheduler.php:135


def _clamp(v: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, int(v)))


@dataclass
class ChunkingConfig:
    size: int = DEFAULT_CHUNK_SIZE
    overlap: int = DEFAULT_CHUNK_OVERLAP

    def sanitized(self) -> "ChunkingConfig":
        size = _clamp(self.size, 100, 4000)
        return ChunkingConfig(size=size, overlap=_clamp(self.overlap, 0, size // 2))


@dataclass
class Selection:
    """Field-selection map — the 'query config' (class-options.php:63-72).

    core/tax/attributes/seo are field-name lists; meta maps key -> render
    mode ('text'|'json'); acf rows describe typed custom fields; flags hold
    booleans (e.g. show_private_meta).
    """

    core: list[str] = field(default_factory=lambda: ["title", "description", "sku"])
    tax: list[str] = field(default_factory=list)
    attributes: list[str] = field(default_factory=list)
    seo: list[str] = field(default_factory=list)
    meta: dict[str, str] = field(default_factory=dict)
    acf: list[dict[str, str]] = field(default_factory=list)
    flags: dict[str, bool] = field(default_factory=dict)

    def canonical(self) -> dict[str, Any]:
        """Order-insensitive canonical form (class-fingerprint.php:59-116).

        Every list sorted + deduped case-insensitively, the meta map
        key-sorted with modes normalized to {'text','json'}, ACF rows
        stable-sorted by (field_key, name, group_key). Selection *order*
        never changes the fingerprint (dev-plan acceptance :867-870).
        """

        def natural_key(s: str) -> str:
            # python twin of functions/text.natural_sort_key (K6,
            # SORT_NATURAL | SORT_FLAG_CASE): pad digit runs so numeric
            # runs order numerically
            import re

            return "".join(
                r.zfill(12) if r.isdigit() and len(r) < 12 else r
                for r in re.findall(r"[0-9]+|[^0-9]+", s)
            )

        def sort_dedupe(xs: list[str]) -> list[str]:
            seen: dict[str, str] = {}
            for x in xs:
                seen.setdefault(str(x).strip().lower(), str(x).strip())
            return [seen[k] for k in sorted(seen, key=natural_key)]

        meta = {
            str(k).strip(): ("json" if str(v).lower() == "json" else "text")
            for k, v in self.meta.items()
            if str(k).strip()
        }
        acf_rows = [
            {
                "group_key": str(r.get("group_key", "")),
                "field_key": str(r.get("field_key", "")),
                "name": str(r.get("name", "")),
                "label": str(r.get("label", "")),
                "type": str(r.get("type", "text")),
                "mode": "json" if str(r.get("mode", "text")).lower() == "json" else "text",
            }
            for r in self.acf
        ]
        acf_rows.sort(key=lambda r: (r["field_key"], r["name"], r["group_key"]))
        return {
            "acf": acf_rows,
            "attributes": sort_dedupe(self.attributes),
            "core": sort_dedupe(self.core),
            "flags": {k: bool(v) for k, v in sorted(self.flags.items())},
            "meta": {k: meta[k] for k in sorted(meta)},
            "seo": sort_dedupe(self.seo),
            "tax": sort_dedupe(self.tax),
        }


@dataclass
class EngineConfig:
    model: str = DEFAULT_MODEL
    selection: Selection = field(default_factory=Selection)
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    site_id: int = 1
    targets: tuple[str, ...] = ("local",)
    variation_strategy: str = "collapse"
    scan_batch_limit: int = DEFAULT_SCAN_BATCH_LIMIT
    embed_batch: int = DEFAULT_EMBED_BATCH
    upsert_batch: int = DEFAULT_UPSERT_BATCH
    rollup_max_variations: int = DEFAULT_ROLLUP_MAX_VARIATIONS
    rollup_values_cap: int = DEFAULT_ROLLUP_VALUES_CAP

    def __post_init__(self) -> None:
        if self.model not in MODEL_DIMENSIONS:
            raise ValueError(f"unknown embedding model: {self.model!r}")
        if self.variation_strategy not in VARIATION_STRATEGIES:
            raise ValueError(f"invalid variation_strategy: {self.variation_strategy!r}")
        for t in self.targets:
            if t not in VALID_TARGETS:
                raise ValueError(f"invalid target: {t!r}")
        self.scan_batch_limit = _clamp(self.scan_batch_limit, 20, 2000)
        self.embed_batch = _clamp(self.embed_batch, 1, 2048)
        self.upsert_batch = _clamp(self.upsert_batch, 10, 500)
        self.rollup_max_variations = _clamp(self.rollup_max_variations, 20, 5000)
        self.rollup_values_cap = _clamp(self.rollup_values_cap, 5, 200)
        self.chunking = self.chunking.sanitized()

    @property
    def dimension(self) -> int:
        return MODEL_DIMENSIONS[self.model]

    def fingerprint_payload_json(self) -> str:
        """Canonical JSON of everything except per-row text — the constant
        part of the product fingerprint (class-fingerprint.php:23-44)."""
        payload = {
            "chunking": {"overlap": self.chunking.overlap, "size": self.chunking.size},
            "dimension": self.dimension,
            "model": self.model,
            "selection": self.selection.canonical(),
            "version": ENGINE_VERSION,
        }
        return json.dumps(payload, sort_keys=True, ensure_ascii=False, separators=(",", ":"))


def vector_id(site_id: int, product_id: int, chunk_index: int) -> str:
    """Stable idempotent vector id (class-indexer.php:147-150)."""
    return f"site-{site_id}:product-{product_id}:chunk-{chunk_index}"
