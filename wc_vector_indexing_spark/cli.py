"""CLI (SURVEY §2.11 U6-U7) — the engine's inspection/debug surface,
mirroring `wp wcvec chunk|embed|sync|status` (includes/cli/class-cli.php).

    python -m wc_vector_indexing_spark.cli chunk --text "..." [--size N --overlap N]
    python -m wc_vector_indexing_spark.cli chunk --doc-id 7 [--sf-dir DIR]
    python -m wc_vector_indexing_spark.cli embed --text "..." [--model M]
    python -m wc_vector_indexing_spark.cli sync  --sf-dir DIR --state DIR --index DIR
    python -m wc_vector_indexing_spark.cli status --state DIR

`chunk` prints the golden-output transcript the reference uses as its
network-free EXPLAIN (class-cli.php:70-90): model/dim, product sha, char
count, then per-chunk {index, chars, approx_tokens, sha8}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

from wc_vector_indexing_spark.config import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    MODEL_DIMENSIONS,
    ChunkingConfig,
    EngineConfig,
)


def _sha8(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:8]


def cmd_chunk(args: argparse.Namespace) -> int:
    from wc_vector_indexing_spark.functions.hashing import config_sha
    from wc_vector_indexing_spark.operators.chunker import chunk_text

    if args.text is not None:
        text = args.text
    else:
        from wc_vector_indexing_spark.session import get_spark
        from wc_vector_indexing_spark.sources.readers import load

        spark = get_spark("wcvec-cli", cpus=4)
        spark.sparkContext.setLogLevel("ERROR")
        row = (
            load(spark, "documents", args.sf_dir)
            .filter(f"doc_id = {int(args.doc_id)}")
            .head()
        )
        if row is None:
            print(f"error: doc_id {args.doc_id} not found", file=sys.stderr)
            return 1
        text = row.text

    config = EngineConfig(
        model=args.model, chunking=ChunkingConfig(size=args.size, overlap=args.overlap)
    )
    product_sha = hashlib.sha256(
        (config.fingerprint_payload_json() + "\n" + text).encode("utf-8")
    ).hexdigest()
    chunks = chunk_text(text, size=args.size, overlap=args.overlap)
    print(f"model: {config.model}  dimension: {config.dimension}")
    print(f"product sha: {product_sha}")
    print(f"config sha:  {config_sha(config)}")
    print(f"chars: {len(text)}  chunks: {len(chunks)}")
    print(f"{'index':>5}  {'chars':>6}  {'~tokens':>7}  sha8")
    for c in chunks:
        print(f"{c.index:>5}  {c.chars:>6}  {c.approx_tokens:>7}  {_sha8(c.text)}")
    if args.show_chunks:
        for c in chunks:
            print(f"\n--- chunk {c.index} ---\n{c.text}")
    return 0


def cmd_embed(args: argparse.Namespace) -> int:
    from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder

    text = args.text if args.text is not None else sys.stdin.read()
    backend = DeterministicEmbedder(args.model, MODEL_DIMENSIONS.get(args.model))
    vec = backend.embed_batch([text])[0]
    print(f"model: {backend.model}  dimension: {backend.dimension}")
    print(f"sha8: {_sha8(text)}")
    head = ", ".join(f"{x:.6f}" for x in vec[:8])
    print(f"vector[0:8]: [{head}, ...]")
    return 0


def cmd_sync(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.delta_sync import sync_products
    from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load
    from wc_vector_indexing_spark.state.store import sync_state_store, vector_index_store

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    config = EngineConfig(
        model=args.model, chunking=ChunkingConfig(size=args.size, overlap=args.overlap)
    )
    docs = load(spark, "documents", args.sf_dir).select(
        F.col("doc_id").alias("product_id"), "text"
    )
    state = sync_state_store(spark, args.state)
    index = vector_index_store(spark, args.index)
    t0 = time.time()
    res = sync_products(docs, state, index, config, DeterministicEmbedder(config.model),
                        text_col="text", force=args.force)
    for target, s in res.items():
        print(
            json.dumps(
                {
                    "target": target,
                    "upserted": s.upserted,
                    "deleted": s.deleted,
                    "skipped_products": s.skipped_products,
                    "duration_s": round(time.time() - t0, 2),
                }
            )
        )
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    from wc_vector_indexing_spark import __version__
    from wc_vector_indexing_spark.logs import queue_metrics
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.state.store import sync_state_store

    spark = get_spark("wcvec-cli", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    state = sync_state_store(spark, args.state)
    out = {"engine_version": __version__, "spark_version": spark.version}
    if not state.is_empty():
        out.update(queue_metrics(state.read()))
    else:
        out["state_rows"] = 0
    print(json.dumps(out, default=str))
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Run the batch curation pipeline over a documents table and write
    the curated corpus + audit; prints the per-reason report as JSON."""
    from wc_vector_indexing_spark.operators.curation import (
        CurationConfig,
        curate,
        curation_report,
    )
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, "documents", args.sf_dir)
    config = CurationConfig(
        min_quality=args.min_quality,
        languages=tuple(args.languages.split(",")) if args.languages else None,
        near_dup_threshold=args.near_dup_threshold,
        repetition_thresholds={} if args.repetition else None,
        heuristics=tuple(args.heuristics.split(",")) if getattr(args, "heuristics", "") else None,
        compress_band=(
            tuple(float(x) for x in args.compress_band.split(","))
            if getattr(args, "compress_band", "")
            else None
        ),
        unicode_fix=bool(getattr(args, "unicode_fix", False)),
        blocklist=(
            tuple(args.blocklist.split(","))
            if getattr(args, "blocklist", "")
            else None
        ),
        lang_percentile=(
            args.lang_percentile
            if getattr(args, "lang_percentile", None) is not None
            else None
        ),
    )
    result = curate(docs, config)
    result.curated.write.mode("overwrite").parquet(args.out + "/curated")
    result.audit.write.mode("overwrite").parquet(args.out + "/audit")
    report = curation_report(docs, result.audit)
    for r in report.collect():
        print(json.dumps({"reject_reason": r.reject_reason, "n": r.n}))
    result.unpersist()
    return 0


def cmd_select(args: argparse.Namespace) -> int:
    """DSIR data selection: score every document by hashed-unigram
    importance weight against a target slice, write the top fraction;
    prints kept/total and the selection threshold as JSON."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.importance import importance_weights
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, "documents", args.sf_dir)
    target = F.col("source").isin(*args.target_sources.split(","))
    weights = importance_weights(docs, target, n_buckets=args.buckets)
    # keep the top `fraction` by log_weight: corpus-quantile threshold,
    # same global-statistic broadcast pattern as quality_quantile_filter
    thr = weights.agg(
        F.percentile_approx("log_weight", 1.0 - args.fraction).alias("t")
    ).head()[0]
    selected = docs.join(
        weights.filter(F.col("log_weight") >= thr).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    selected.write.mode("overwrite").parquet(args.out)
    n_total = docs.count()
    # count the written output — recounting `selected` would re-run the
    # whole importance pipeline a second time
    n_kept = spark.read.parquet(args.out).count()
    print(json.dumps({"kept": n_kept, "total": n_total, "threshold": thr}))
    return 0


def cmd_prep(args: argparse.Namespace) -> int:
    """Backfill run of the ingest-prep composition: fit the DSIR model
    and vocabulary on the corpus, then gate + score + encode every doc
    (the same code path the stream runs) and write the prepped corpus."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.importance import fit_importance_model
    from wc_vector_indexing_spark.operators.vocab import vocab_with_ids
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load
    from wc_vector_indexing_spark.streaming.incremental import prep_document_stream

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, "documents", args.sf_dir)
    model = fit_importance_model(
        docs, F.col("source").isin(*args.target_sources.split(",")),
        n_buckets=args.buckets,
    )
    vocab_ids = {
        r.token: r.token_id for r in vocab_with_ids(docs, k=args.vocab).collect()
    }
    thresholds = None
    if getattr(args, "lang_percentile", None) is not None:
        from wc_vector_indexing_spark.operators.textstats import (
            fit_quality_thresholds,
            predicted_lang_col,
        )

        # fit per PREDICTED language — the stream only sees text, not a
        # trusted lang column
        thresholds = fit_quality_thresholds(
            docs.withColumn("_plang", predicted_lang_col("text")),
            keep_frac=args.lang_percentile,
            group_col="_plang",
        )
    # static frames lack the stream's event_ts; dedup needs one — derive
    # a stable stand-in so the backfill uses the identical code path.
    # Only relative ordering inside the watermark matters, so large hash
    # doc_ids are folded into a safe epoch range instead of overflowing
    # the timestamp domain
    staged = docs.withColumn(
        "event_ts", F.timestamp_seconds(F.pmod(F.col("doc_id"), F.lit(2_000_000_000)))
    )
    prepped = prep_document_stream(
        staged, model=model, vocab_ids=vocab_ids, quality_thresholds=thresholds
    )
    prepped.write.mode("overwrite").parquet(args.out)
    n_in, n_out = docs.count(), spark.read.parquet(args.out).count()
    print(json.dumps({"input": n_in, "prepped": n_out, "vocab": len(vocab_ids)}))
    return 0


def cmd_drift(args: argparse.Namespace) -> int:
    """Distribution-drift report: fit the unigram reference on one
    corpus slice and score another (the batch-backfill form of
    streaming.incremental.drift_monitor_stream); prints per-(window,
    slice) cross-entropy as JSON lines, highest first."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.lm_score import fit_unigram_ref
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load
    from wc_vector_indexing_spark.streaming.incremental import drift_monitor_stream

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, "documents", args.sf_dir)
    ref_docs = (
        docs.filter(F.col("source").isin(*args.ref_sources.split(",")))
        if args.ref_sources
        else docs
    )
    ref = fit_unigram_ref(ref_docs, top_v=args.vocab)
    # same event_ts stand-in as cmd_prep: backfill frames lack the
    # stream's timestamp; only windowing needs one
    staged = docs.withColumn(
        "event_ts", F.timestamp_seconds(F.pmod(F.col("doc_id"), F.lit(2_000_000_000)))
    )
    out = drift_monitor_stream(staged, ref, window=args.window)
    rows = sorted(
        out.collect(), key=lambda r: -(r.cross_entropy_nats or 0.0)
    )
    for r in rows:
        print(
            json.dumps(
                {
                    "window_start": str(r.window.start),
                    "source": r.source,
                    "n_docs": r.n_docs,
                    "n_tokens": r.n_tokens,
                    "cross_entropy_nats": r.cross_entropy_nats,
                }
            )
        )
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Print the formatted physical plan of a catalog query — the same
    plan the audit tool records in PLANS.md, for one query on demand."""
    from wc_vector_indexing_spark.plans.queries import REGISTRY
    from wc_vector_indexing_spark.session import get_spark

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; known: {', '.join(REGISTRY)}")
        return 2
    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY[args.query].fn(spark, args.sf_dir).explain("formatted")
    return 0


def cmd_diff(args: argparse.Namespace) -> int:
    """Diff two corpus snapshots (parquet dirs with doc_id + text):
    prints per-status counts and optionally writes the per-doc status
    table for incremental re-processing."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.export import corpus_diff
    from wc_vector_indexing_spark.session import get_spark

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    diff = corpus_diff(
        spark.read.parquet(args.old), spark.read.parquet(args.new)
    )
    if args.out:
        diff.write.mode("overwrite").parquet(args.out)
        diff = spark.read.parquet(args.out)  # count what was written
    counts = {
        r.status: r.n
        for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps(counts, sort_keys=True))
    return 0


def cmd_mix(args: argparse.Namespace) -> int:
    """Reweight a documents table to a target source mixture; writes the
    mixed corpus and prints the before/after report as JSON."""
    from wc_vector_indexing_spark.operators.mixing import mix_report, source_mix
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    weights = {}
    for part in args.weights.split(","):
        source, w = part.split("=")
        weights[source.strip()] = float(w)
    docs = load(spark, "documents", args.sf_dir)
    mixed = source_mix(docs, weights)
    mixed.write.mode("overwrite").parquet(args.out)
    for r in mix_report(docs, mixed).collect():
        print(
            json.dumps(
                {
                    "source": r.source,
                    "n_before": r.n_before,
                    "n_after": r.n_after,
                    "achieved_weight": r.achieved_weight,
                }
            )
        )
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Export a table as size-bounded training shards (JSONL/CSV/
    parquet), optionally hive-partitioned; prints the shard manifest."""
    import glob as _glob

    from wc_vector_indexing_spark.operators.export import write_shards
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = load(spark, args.table, args.sf_dir)
    if args.format == "safetensors":
        from wc_vector_indexing_spark.sources.safetensors import (
            write_safetensors_vectors,
        )

        for knob, default in (("epoch_seed", ""), ("partition_by", None),
                              ("compression", None),
                              ("max_records", 100_000)):
            if getattr(args, knob, default) not in (default, ""):
                raise SystemExit(
                    f"--{knob.replace('_', '-')} is not supported with "
                    "safetensors")
        id_col = getattr(args, "key_col", "") or df.columns[0]
        if id_col not in df.columns:
            raise SystemExit(
                f"--key-col {id_col!r} not in table {args.table!r} "
                f"(columns: {df.columns})")
        vec_col = "embedding"
        if vec_col not in df.columns:
            raise SystemExit(
                f"safetensors export needs an 'embedding' column; table "
                f"{args.table!r} has {df.columns}")
        manifest = write_safetensors_vectors(
            df, args.out, id_col=id_col, vec_col=vec_col)
        shards = manifest.collect()
        print(json.dumps({
            "table": args.table, "format": "safetensors",
            "n_shards": len(shards),
            "n_records": int(sum(r.n_rows for r in shards)),
        }))
        return 0
    if args.format == "gguf":
        from wc_vector_indexing_spark.sources.gguf import (
            write_gguf_vectors,
        )

        for knob, default in (("epoch_seed", ""), ("partition_by", None),
                              ("max_records", 100_000)):
            if getattr(args, knob, default) not in (default, ""):
                raise SystemExit(
                    f"--{knob.replace('_', '-')} is not supported with "
                    "gguf")
        # --compression doubles as the ggml quantization type (the
        # format's own size knob): none => F32, else Q8_0 / Q4_0
        comp = (getattr(args, "compression", None) or "f32").lower()
        ggml_type = {"f32": "F32", "q8_0": "Q8_0", "q4_0": "Q4_0"}.get(comp)
        if ggml_type is None:
            raise SystemExit(
                "--compression for gguf must be one of f32/q8_0/q4_0")
        id_col = getattr(args, "key_col", "") or df.columns[0]
        if id_col not in df.columns:
            raise SystemExit(
                f"--key-col {id_col!r} not in table {args.table!r} "
                f"(columns: {df.columns})")
        if "embedding" not in df.columns:
            raise SystemExit(
                f"gguf export needs an 'embedding' column; table "
                f"{args.table!r} has {df.columns}")
        shards = write_gguf_vectors(
            df, args.out, id_col=id_col, vec_col="embedding",
            ggml_type=ggml_type)
        print(json.dumps({
            "table": args.table, "format": "gguf",
            "ggml_type": ggml_type,
            "n_shards": len(shards),
            "n_records": int(sum(r.n_rows for r in shards)),
        }))
        return 0
    if args.format in ("tfrecord", "arrow"):
        if getattr(args, "epoch_seed", ""):
            raise SystemExit(
                f"--epoch-seed is not supported with {args.format} yet")
        # these writers shard one-file-per-partition; reject the
        # write_shards knobs they don't honor rather than silently
        # dropping them (--partition-by IS honored: hive layout)
        if getattr(args, "max_records", 100_000) != 100_000:
            raise SystemExit(
                f"--max-records is not supported with {args.format} yet")
        part = (args.partition_by.split(",")
                if getattr(args, "partition_by", None) else None)
        if args.format == "tfrecord":
            from wc_vector_indexing_spark.sources.tfrecord import (
                write_tfrecords,
            )

            if getattr(args, "compression", None):
                raise SystemExit(
                    "--compression is not supported with tfrecord")
            manifest = write_tfrecords(df, args.out, partition_by=part)
        else:
            from wc_vector_indexing_spark.sources.arrow_ipc import (
                write_arrow_ipc,
            )

            comp = getattr(args, "compression", None) or "zstd"
            manifest = write_arrow_ipc(
                df, args.out,
                compression=None if comp == "none" else comp,
                partition_by=part,
            )
        shards = manifest.collect()
        print(json.dumps({
            "table": args.table, "format": args.format,
            "n_shards": len(shards),
            "n_records": int(sum(r.n_records for r in shards)),
        }))
        return 0
    if getattr(args, "epoch_seed", ""):
        # deterministic training order: join the (shard, order_key)
        # assignment back, write partitioned by shard with rows sorted
        # by order_key inside each shard file — readers stream shards
        # sequentially and the batch order is a pure function of the
        # seed (sampling.epoch_order)
        from wc_vector_indexing_spark.operators.sampling import epoch_order

        # the shuffle key is table-specific: first column of the table
        # unless the user names one (--key-col). doc_id was previously
        # hardcoded, which broke --table embeddings (keyed by vec_id).
        key_col = getattr(args, "key_col", "") or df.columns[0]
        if key_col not in df.columns:
            raise SystemExit(
                f"--key-col {key_col!r} not in table {args.table!r} "
                f"(columns: {df.columns})"
            )
        order = epoch_order(
            df,
            seed=args.epoch_seed,
            n_shards=args.epoch_shards,
            key_col=key_col,
            layout=False,
        )
        df = (
            df.join(order, key_col)
            .repartition(args.epoch_shards, "shard")
            .sortWithinPartitions("shard", "order_key")
        )
        if args.partition_by and args.partition_by != "shard":
            print(
                f"warning: --epoch-seed overrides --partition-by "
                f"{args.partition_by!r} with 'shard'",
                file=sys.stderr,
            )
        args.partition_by = "shard"
    write_shards(
        df,
        args.out,
        fmt=args.format,
        max_records_per_file=args.max_records,
        partition_by=args.partition_by.split(",") if args.partition_by else None,
        compression=args.compression,
    )
    ext = {"json": "json", "csv": "csv", "parquet": "parquet",
           "orc": "orc"}[args.format]
    pattern = f"{args.out}/**/*.{ext}*" if args.partition_by else f"{args.out}/*.{ext}*"
    files = sorted(_glob.glob(pattern, recursive=True))
    print(json.dumps({"table": args.table, "format": args.format, "n_shards": len(files)}))
    return 0


def cmd_tokenizer(args: argparse.Namespace) -> int:
    """Train a subword tokenizer (BPE or unigram-LM) on a corpus
    table, save the artifact as JSON, and optionally show a sample
    segmentation — the reference CLI's chunk-inspection shape
    (class-cli.php) applied to the tokenizer family."""
    if getattr(args, "load_gguf", ""):
        # segment with a model file's EMBEDDED vocabulary — no Spark,
        # no retrain, header-prefix read only
        from wc_vector_indexing_spark.operators.unigram_lm import (
            viterbi_segment,
        )
        from wc_vector_indexing_spark.sources.gguf import (
            read_gguf_tokenizer,
        )

        logp = read_gguf_tokenizer(args.load_gguf)
        mpl = max((len(p) for p in logp), default=4)
        pieces = []
        for w in args.sample.lower().split():
            try:
                pieces.extend(viterbi_segment(w, logp, mpl))
            except ValueError:
                pieces.extend(
                    c if c in logp else "<unk>" for c in w)
        print("sample:", " ".join(pieces))
        return 0
    if args.load:
        # segment with a saved artifact — no Spark, no retrain
        with open(args.load) as fh:
            artifact = json.load(fh)
        if artifact["algo"] == "unigram":
            from wc_vector_indexing_spark.operators.unigram_lm import (
                viterbi_segment,
            )

            logp = artifact["pieces"]
            mpl = int(artifact.get("max_piece_len", 4))
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in viterbi_segment(w, logp, mpl)
            ]
        elif artifact["algo"] == "wordpiece":
            from wc_vector_indexing_spark.operators.wordpiece import (
                wordpiece_tokenize,
            )

            vset = set(artifact["vocab"])
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in wordpiece_tokenize(w, vset)
            ]
        else:
            from wc_vector_indexing_spark.operators.bpe import segment_word

            ranks = {tuple(m): i for i, m in enumerate(artifact["merges"])}
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in segment_word(w, ranks)
            ]
        print("sample:", " ".join(pieces))
        return 0

    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.readers import load

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, args.table, args.sf_dir).select(args.text_col)

    if args.algo == "bpe":
        from wc_vector_indexing_spark.operators.bpe import (
            segment_word,
            train_bpe,
        )

        merges = train_bpe(
            docs, num_merges=args.vocab_size, text_col=args.text_col
        )
        artifact = {"algo": "bpe", "merges": [list(m) for m in merges]}
        n_units = len(merges)
        if args.sample:
            ranks = {tuple(m): i for i, m in enumerate(merges)}
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in segment_word(w, ranks)
            ]
    elif args.algo == "wordpiece":
        from wc_vector_indexing_spark.operators.wordpiece import (
            train_wordpiece,
            wordpiece_tokenize,
        )

        vocab = train_wordpiece(
            docs, vocab_size=args.vocab_size, text_col=args.text_col
        )
        artifact = {"algo": "wordpiece", "vocab": vocab}
        n_units = len(vocab)
        if args.sample:
            vset = set(vocab)
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in wordpiece_tokenize(w, vset)
            ]
    else:
        from wc_vector_indexing_spark.operators.unigram_lm import (
            train_unigram,
            viterbi_segment,
        )

        logp = train_unigram(
            docs,
            vocab_size=args.vocab_size,
            text_col=args.text_col,
            max_piece_len=args.max_piece_len,
        )
        artifact = {
            "algo": "unigram",
            "max_piece_len": args.max_piece_len,
            "pieces": {p: round(v, 9) for p, v in sorted(logp.items())},
        }
        n_units = len(logp)
        if args.sample:
            pieces = [
                p
                for w in args.sample.lower().split()
                for p in viterbi_segment(w, logp, args.max_piece_len)
            ]
    if args.save:
        with open(args.save, "w") as fh:
            json.dump(artifact, fh, indent=1, ensure_ascii=False)
    print(json.dumps({"algo": args.algo, "units": n_units,
                      "saved": args.save or None}))
    if args.sample:
        print("sample:", " ".join(pieces))
    return 0


def cmd_crawl(args: argparse.Namespace) -> int:
    """Raw-crawl front door as one command: WARC file(s) → HTTP/HTML
    response records → boilerplate-removed main text → parquet corpus
    ready for every downstream text stage (dedup, quality, select).
    Prints a JSON summary (pages read, docs written, boilerplate
    blocks dropped)."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.html_extract import extract_documents
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.warc import read_warc

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_warc(spark, args.warc)
    docs = extract_documents(pages).filter(
        F.length(F.trim("text")) >= args.min_chars
    )
    docs.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    stats = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_boilerplate").alias("boilerplate_blocks"),
        F.sum("n_good").alias("kept_blocks"),
    ).head()
    print(json.dumps({
        "docs_written": stats["docs"],
        "kept_blocks": int(stats["kept_blocks"] or 0),
        "boilerplate_blocks_dropped": int(stats["boilerplate_blocks"] or 0),
        "out": args.out,
    }))
    return 0


def cmd_wat(args: argparse.Namespace) -> int:
    """WARC file(s) → the WAT metadata sidecar (one row per page with
    the JSON envelope) plus the exploded link-edge list — the
    materialize-once pass every link-graph/anchor-text consumer reads
    instead of re-parsing HTML. Prints a JSON summary."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.warc import read_warc
    from wc_vector_indexing_spark.sources.wat import build_wat, link_edges

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    records = read_warc(spark, args.warc)
    build_wat(records).write.mode("overwrite").parquet(args.out + "/wat")
    link_edges(records).write.mode("overwrite").parquet(args.out + "/edges")
    wat = spark.read.parquet(args.out + "/wat")
    edges = spark.read.parquet(args.out + "/edges")
    print(json.dumps({
        "pages": wat.count(),
        "pages_with_title": wat.filter(F.col("title").isNotNull()).count(),
        "edges": edges.count(),
        "out": args.out,
    }))
    return 0


def cmd_wiki(args: argparse.Namespace) -> int:
    """MediaWiki pages-articles-multistream dump + index → extracted
    plain-text parquet corpus (slice-parallel bz2 walk; wikitext
    structure stripped). Prints a JSON summary."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.wikixml import read_wiki_pages

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_wiki_pages(spark, args.dump, args.index,
                            on_error="skip")
    if args.main_ns_only:
        pages = pages.filter((F.col("ns") == 0) & ~F.col("is_redirect"))
    pages.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    stats = out.agg(
        F.count("*").alias("pages"),
        F.sum(F.col("is_redirect").cast("int")).alias("redirects"),
        F.sum(F.length("text")).alias("chars"),
    ).head()
    print(json.dumps({
        "pages_written": stats["pages"],
        "redirects": int(stats["redirects"] or 0),
        "text_chars": int(stats["chars"] or 0),
        "out": args.out,
    }))
    return 0


def cmd_zst(args: argparse.Namespace) -> int:
    """.zst JSONL shards → parquet corpus through the pure-Python
    RFC 8878 decoder (this deployment's Spark has no native zstd
    codec). --field NAME:TYPE picks the JSONL columns; omit --field
    for raw (path, line_no, line) rows. Prints a JSON summary."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.zstd_text import (
        read_zstd_jsonl,
        read_zstd_lines,
    )

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.field:
        fields = {}
        for spec in args.field:
            name, _, typ = spec.partition(":")
            fields[name] = typ or "string"
        df = read_zstd_jsonl(spark, args.src, fields, on_error="skip",
                             dict_path=args.dict or None,
                             dict_store=args.dict_store or None)
    else:
        df = read_zstd_lines(spark, args.src, on_error="skip",
                             dict_path=args.dict or None,
                             dict_store=args.dict_store or None)
    df.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    print(json.dumps({
        "rows_written": out.count(),
        "shards_read": out.select("path").distinct().count(),
        "out": args.out,
    }))
    return 0


def cmd_convert(args: argparse.Namespace) -> int:
    """Checkpoint format conversion: read an embedding-matrix
    checkpoint directory in one interchange format (safetensors or
    gguf) and rewrite it in the other — optionally quantized (gguf
    Q8_0/Q4_0) — fully distributed, one shard per task at both ends.
    The (vec_id, embedding) contract is format-blind, the same one
    checkpoint_drift diffs across."""
    from wc_vector_indexing_spark.session import get_spark

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.in_format == "safetensors":
        from wc_vector_indexing_spark.sources.safetensors import (
            read_safetensors_vectors,
        )

        df = read_safetensors_vectors(
            spark, args.in_dir.rstrip("/") + "/*.safetensors")
    elif args.in_format == "gguf":
        from wc_vector_indexing_spark.sources.gguf import read_gguf_vectors

        df = read_gguf_vectors(spark, args.in_dir.rstrip("/") + "/*.gguf")
    else:
        raise SystemExit("--in-format must be safetensors or gguf")
    n_in = df.count()
    if args.out_format == "safetensors":
        if args.quantize:
            raise SystemExit(
                "--quantize applies to gguf output only (safetensors "
                "stores F32/BF16 via --vec-dtype in the export path)")
        from wc_vector_indexing_spark.sources.safetensors import (
            write_safetensors_vectors,
        )

        shards = write_safetensors_vectors(
            df.select("vec_id", "embedding"), args.out_dir).collect()
        n_out = int(sum(r.n_rows for r in shards))
    elif args.out_format == "gguf":
        from wc_vector_indexing_spark.sources.gguf import write_gguf_vectors

        q = (args.quantize or "f32").lower()
        ggml_type = {"f32": "F32", "q8_0": "Q8_0", "q4_0": "Q4_0"}.get(q)
        if ggml_type is None:
            raise SystemExit("--quantize must be one of f32/q8_0/q4_0")
        shards = write_gguf_vectors(
            df.select("vec_id", "embedding"), args.out_dir,
            ggml_type=ggml_type)
        n_out = int(sum(r.n_rows for r in shards))
    else:
        raise SystemExit("--out-format must be safetensors or gguf")
    if n_out != n_in:
        raise SystemExit(
            f"conversion dropped rows: {n_in} in, {n_out} out")
    print(json.dumps({
        "in_format": args.in_format, "out_format": args.out_format,
        "quantize": args.quantize or None,
        "n_vectors": n_out, "n_shards": len(shards),
    }))
    return 0


def cmd_cdx(args: argparse.Namespace) -> int:
    """ZipNum CDX(J) index: --build turns a capture parquet (urlkey,
    ts14, fields_json) into sorted gzip-member shards + cluster.idx;
    --prefix queries an existing cluster through the block-pruned
    lookup (only the gzip members whose key span intersects the
    prefix are fetched and decoded). Prints a JSON summary, or the
    matching CDXJ rows as JSON lines with --print-rows."""
    from wc_vector_indexing_spark.session import get_spark
    from wc_vector_indexing_spark.sources.cdx import (
        write_zipnum,
        zipnum_lookup,
    )

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.build:
        df = spark.read.parquet(args.build)
        missing = {"urlkey", "ts14", "fields_json"} - set(df.columns)
        if missing:
            raise SystemExit(
                f"--build parquet must have urlkey/ts14/fields_json "
                f"columns; missing {sorted(missing)}")
        write_zipnum(df, args.index_dir,
                     lines_per_block=args.lines_per_block,
                     n_shards=args.shards)
        import os as _os
        n_blocks = sum(
            1 for _ in open(_os.path.join(args.index_dir, "cluster.idx")))
        print(json.dumps({
            "index_dir": args.index_dir, "rows": df.count(),
            "blocks": n_blocks,
        }))
        return 0
    if getattr(args, "merge", ""):
        from wc_vector_indexing_spark.sources.cdx import zipnum_merge

        ins = [d for d in args.merge.split(",") if d]
        zipnum_merge(spark, ins, args.index_dir,
                     lines_per_block=args.lines_per_block,
                     n_shards=args.shards)
        import os as _os
        n_blocks = sum(
            1 for _ in open(_os.path.join(args.index_dir, "cluster.idx")))
        print(json.dumps({
            "index_dir": args.index_dir, "merged_from": len(ins),
            "blocks": n_blocks,
        }))
        return 0
    if not args.prefix:
        raise SystemExit("need --build (write), --merge (compact), or "
                         "--prefix (lookup)")
    hits = zipnum_lookup(
        spark, args.index_dir, args.prefix,
        ts_from=args.ts_from or None, ts_to=args.ts_to or None)
    if args.print_rows:
        for r in hits.orderBy("urlkey", "ts14").collect():
            print(json.dumps(
                {k: r[k] for k in ("urlkey", "ts14", "url", "status",
                                   "digest", "warc_filename",
                                   "warc_offset", "warc_length")}))
    else:
        print(json.dumps({
            "prefix": args.prefix, "n_captures": hits.count(),
            "n_urls": hits.select("urlkey").distinct().count(),
        }))
    return 0


def cmd_frontier(args: argparse.Namespace) -> int:
    """Polite crawl-frontier schedule: a URL parquet (url, host[,
    priority]) → per-host priority slots spaced by robots Crawl-delay,
    host-affine fetcher assignment. --robots supplies a (domain,
    robots_txt) parquet for the politeness table; --captures a (url,
    ts, digest) capture-history parquet + --now to derive priority as
    expected missed changes (recrawl_priority), overriding any
    priority column. Prints a JSON summary."""
    from wc_vector_indexing_spark.operators.frontier import (
        recrawl_priority,
        schedule_frontier,
    )
    from wc_vector_indexing_spark.session import get_spark

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    frontier = spark.read.parquet(args.urls)
    if args.captures:
        if not args.now:
            raise SystemExit("--captures requires --now (epoch seconds; "
                             "schedules must replay deterministically)")
        pri = recrawl_priority(
            spark.read.parquet(args.captures), now_ts=float(args.now))
        frontier = frontier.drop("priority").join(
            pri.select("url", "priority"), "url", "left")
    politeness = None
    if args.robots:
        from wc_vector_indexing_spark.operators.robots import parse_delays

        politeness = parse_delays(spark.read.parquet(args.robots))
    sched = schedule_frontier(
        frontier, politeness, n_fetchers=args.fetchers,
        default_delay_s=args.default_delay)
    sched.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    print(json.dumps({
        "urls": out.count(),
        "hosts": out.select("host").distinct().count(),
        "fetchers": args.fetchers,
        "out": args.out,
    }))
    return 0


def cmd_mirrors(args: argparse.Namespace) -> int:
    """Mirror-site clusters over a corpus parquet: host-pair Jaccard on
    content-digest sets (boilerplate-capped evidence) + connected
    components. Prints cluster count + mirror hosts."""
    from wc_vector_indexing_spark.operators.mirrors import (
        mirror_host_clusters,
    )
    from wc_vector_indexing_spark.session import get_spark

    spark = get_spark("wcvec-cli", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.src)
    clusters = mirror_host_clusters(
        docs, host_col=args.host_col, text_col=args.text_col,
        min_jaccard=args.min_jaccard,
        max_hosts_per_digest=args.cap)
    clusters.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    n_hosts = out.count()
    n_clusters = out.select("cluster_host").distinct().count()
    print(json.dumps({
        "mirror_hosts": n_hosts,
        "clusters": n_clusters,
        "out": args.out,
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="wcvec", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("chunk", help="deterministic chunk transcript")
    g = c.add_mutually_exclusive_group(required=True)
    g.add_argument("--text")
    g.add_argument("--doc-id", type=int)
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--size", type=int, default=DEFAULT_CHUNK_SIZE)
    c.add_argument("--overlap", type=int, default=DEFAULT_CHUNK_OVERLAP)
    c.add_argument("--model", default="fake-deterministic-64")
    c.add_argument("--show-chunks", action="store_true")
    c.set_defaults(fn=cmd_chunk)

    e = sub.add_parser("embed", help="embed one text (deterministic backend)")
    e.add_argument("--text")
    e.add_argument("--model", default="fake-deterministic-64")
    e.set_defaults(fn=cmd_embed)

    s = sub.add_parser("sync", help="incremental sync of the documents table")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--state", required=True)
    s.add_argument("--index", required=True)
    s.add_argument("--size", type=int, default=100)
    s.add_argument("--overlap", type=int, default=10)
    s.add_argument("--model", default="fake-deterministic-64")
    s.add_argument("--force", action="store_true")
    s.set_defaults(fn=cmd_sync)

    st = sub.add_parser("status", help="engine + ledger status")
    st.add_argument("--state", required=True)
    st.set_defaults(fn=cmd_status)

    cu = sub.add_parser("curate", help="batch curation: quality/lang/repetition/dedup")
    cu.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--languages", default="en", help="comma list; empty = keep all")
    cu.add_argument("--near-dup-threshold", type=float, default=0.5)
    cu.add_argument("--repetition", action="store_true", help="enable Gopher repetition gate")
    cu.add_argument(
        "--heuristics",
        default="",
        help="comma list of heuristic gates to enable: c4,gopher (default off)",
    )
    cu.add_argument(
        "--compress-band",
        default="",
        help="min,max zlib deflate-ratio band, e.g. 0.25,1.1 (default off)",
    )
    cu.add_argument(
        "--unicode-fix",
        action="store_true",
        help="repair text in place first: mojibake -> NFC -> zero-width/control strip",
    )
    cu.add_argument(
        "--blocklist",
        default="",
        help="comma list of blocked words: C4 page-level drop (default off)",
    )
    cu.add_argument(
        "--lang-percentile",
        type=float,
        default=None,
        help="keep this top fraction per predicted language by quality score (default off)",
    )
    cu.set_defaults(fn=cmd_curate)

    ex = sub.add_parser("explain", help="print a catalog query's physical plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.set_defaults(fn=cmd_explain)

    df_ = sub.add_parser("diff", help="diff two corpus snapshots (parquet dirs)")
    df_.add_argument("--old", required=True)
    df_.add_argument("--new", required=True)
    df_.add_argument("--out", default="", help="optional per-doc status parquet output")
    df_.set_defaults(fn=cmd_diff)

    dr = sub.add_parser("drift", help="per-slice cross-entropy drift report")
    dr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    dr.add_argument(
        "--ref-sources", default="",
        help="comma list of sources to fit the reference on (default: whole corpus)",
    )
    dr.add_argument("--vocab", type=int, default=2048, help="reference top-V size")
    dr.add_argument("--window", default="1 hour")
    dr.set_defaults(fn=cmd_drift)

    m = sub.add_parser("mix", help="reweight corpus to a target source mixture")
    m.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    m.add_argument("--out", required=True)
    m.add_argument("--weights", required=True, help="e.g. src0=0.5,src1=0.5")
    m.set_defaults(fn=cmd_mix)

    pr = sub.add_parser("prep", help="gate + DSIR score + vocab-encode a corpus")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pr.add_argument(
        "--lang-percentile",
        type=float,
        default=None,
        help="fit per-language quality percentile offline; gate the stream with it",
    )
    pr.add_argument("--out", required=True)
    pr.add_argument("--target-sources", required=True, help="e.g. src1,src2")
    pr.add_argument("--buckets", type=int, default=4096)
    pr.add_argument("--vocab", type=int, default=1000)
    pr.set_defaults(fn=cmd_prep)

    se = sub.add_parser("select", help="DSIR importance-weighted data selection")
    se.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    se.add_argument("--out", required=True)
    se.add_argument("--target-sources", required=True, help="e.g. src1,src2")
    se.add_argument("--fraction", type=float, default=0.5)
    se.add_argument("--buckets", type=int, default=4096)
    se.set_defaults(fn=cmd_select)

    ex = sub.add_parser("export", help="export a table as training shards")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument("--table", default="documents")
    ex.add_argument("--out", required=True)
    ex.add_argument(
        "--format",
        choices=["json", "csv", "parquet", "orc", "tfrecord", "arrow",
                 "safetensors", "gguf"],
        default="json"
    )
    ex.add_argument("--max-records", type=int, default=100_000)
    ex.add_argument("--partition-by", default=None, help="comma-separated columns")
    ex.add_argument("--compression", default=None)
    ex.add_argument(
        "--epoch-seed",
        default="",
        help="deterministic training order: shard + sort by hash(seed, key-col)",
    )
    ex.add_argument("--epoch-shards", type=int, default=8)
    ex.add_argument(
        "--key-col",
        default="",
        help="shuffle key for --epoch-seed (default: first column of the table)",
    )
    ex.set_defaults(fn=cmd_export)

    tk = sub.add_parser(
        "tokenizer", help="train a BPE, unigram-LM, or WordPiece tokenizer")
    tk.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    tk.add_argument("--table", default="documents")
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--algo", choices=["bpe", "unigram", "wordpiece"],
                    default="unigram")
    tk.add_argument("--vocab-size", type=int, default=300,
                    help="target pieces (unigram) / merges (bpe)")
    tk.add_argument("--max-piece-len", type=int, default=4)
    tk.add_argument("--save", default="", help="write the artifact JSON here")
    tk.add_argument("--load", default="",
                    help="segment --sample with a saved artifact (no retrain)")
    tk.add_argument("--load-gguf", default="",
                    help="segment --sample with the unigram vocabulary "
                         "embedded in a GGUF model file's metadata")
    tk.add_argument("--sample", default="", help="segment this text and print")
    tk.set_defaults(fn=cmd_tokenizer)

    cr = sub.add_parser("crawl", help="WARC → extracted-text parquet corpus")
    cr.add_argument("--warc", required=True, help="WARC file/glob/dir")
    cr.add_argument("--out", required=True)
    cr.add_argument("--min-chars", type=int, default=25,
                    help="drop pages whose extracted text is shorter")
    cr.set_defaults(fn=cmd_crawl)

    wa = sub.add_parser("wat", help="WARC → WAT metadata + link-edge parquet")
    wa.add_argument("--warc", required=True, help="WARC file/glob/dir")
    wa.add_argument("--out", required=True,
                    help="writes <out>/wat and <out>/edges")
    wa.set_defaults(fn=cmd_wat)

    wk = sub.add_parser("wiki",
                        help="MediaWiki multistream dump → text parquet")
    wk.add_argument("--dump", required=True, help="multistream .xml.bz2 path")
    wk.add_argument("--index", required=True, help="multistream index path")
    wk.add_argument("--out", required=True)
    wk.add_argument("--main-ns-only", action="store_true",
                    help="keep ns=0 pages and drop redirects")
    wk.set_defaults(fn=cmd_wiki)

    zs = sub.add_parser("zst", help=".zst JSONL/text shards → parquet "
                                    "(pure-Python zstd decode)")
    zs.add_argument("--src", required=True, help=".zst file/glob/dir")
    zs.add_argument("--out", required=True)
    zs.add_argument("--field", action="append", default=[],
                    help="JSONL field as NAME:TYPE (repeatable); omit "
                         "for raw lines")
    zs.add_argument("--dict", default="",
                    help="zstd dictionary file applied to every frame")
    zs.add_argument("--dict-store", dest="dict_store", default="",
                    help="directory of trained dictionaries, keyed by "
                         "the ID each declares (per-frame resolution)")
    zs.set_defaults(fn=cmd_zst)

    cv = sub.add_parser("convert", help="checkpoint format conversion "
                                        "(safetensors <-> gguf, optional "
                                        "quantization)")
    cv.add_argument("--in-dir", required=True)
    cv.add_argument("--in-format", choices=["safetensors", "gguf"],
                    required=True)
    cv.add_argument("--out-dir", required=True)
    cv.add_argument("--out-format", choices=["safetensors", "gguf"],
                    required=True)
    cv.add_argument("--quantize", default="",
                    help="gguf output quant type: f32 (default) / "
                         "q8_0 / q4_0")
    cv.set_defaults(fn=cmd_convert)

    cx = sub.add_parser("cdx", help="ZipNum CDX(J) index: build sorted "
                                    "shards + cluster.idx, or block-"
                                    "pruned prefix lookup")
    cx.add_argument("--index-dir", required=True)
    cx.add_argument("--build", default="",
                    help="capture parquet (urlkey, ts14, fields_json) "
                         "to index")
    cx.add_argument("--merge", default="",
                    help="comma-separated ZipNum cluster dirs to "
                         "compact into --index-dir (exact-duplicate "
                         "captures collapse)")
    cx.add_argument("--lines-per-block", type=int, default=3000)
    cx.add_argument("--shards", type=int, default=4)
    cx.add_argument("--prefix", default="", help="SURT urlkey prefix")
    cx.add_argument("--ts-from", default="")
    cx.add_argument("--ts-to", default="")
    cx.add_argument("--print-rows", action="store_true")
    cx.set_defaults(fn=cmd_cdx)

    fr = sub.add_parser("frontier", help="polite crawl-frontier schedule "
                                         "(priority slots × crawl-delay)")
    fr.add_argument("--urls", required=True,
                    help="parquet of (url, host[, priority])")
    fr.add_argument("--robots", default="",
                    help="parquet of (domain, robots_txt) for Crawl-delay")
    fr.add_argument("--captures", default="",
                    help="parquet of (url, ts, digest) capture history — "
                         "derives priority as expected missed changes")
    fr.add_argument("--now", default="",
                    help="epoch seconds for staleness (required with "
                         "--captures)")
    fr.add_argument("--fetchers", type=int, default=32)
    fr.add_argument("--default-delay", type=float, default=1.0)
    fr.add_argument("--out", required=True)
    fr.set_defaults(fn=cmd_frontier)

    mi = sub.add_parser("mirrors", help="mirror-site clusters "
                                        "(host digest-set Jaccard)")
    mi.add_argument("--src", required=True, help="corpus parquet")
    mi.add_argument("--host-col", default="source")
    mi.add_argument("--text-col", default="text")
    mi.add_argument("--min-jaccard", type=float, default=0.6)
    mi.add_argument("--cap", type=int, default=64,
                    help="max hosts per digest counted as evidence")
    mi.add_argument("--out", required=True)
    mi.set_defaults(fn=cmd_mirrors)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
