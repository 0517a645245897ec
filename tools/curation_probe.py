"""End-to-end curation capstone at replica scale: the composed cost of
the full ingest pipeline (near-dup screen + DSIR gate + PSI drift, three
sinks — streaming/curation.py) over an N×-replicated sf0.1 ``documents``
corpus.

tools/scale_probe.py characterizes the individual operators; this probe
answers the question the capstone's users actually ask — what does one
ingest batch COST against a corpus N× bigger? Stages are timed
separately because they amortize differently:

- ``index_build`` / ``model_build``: one-off corpus-build cost (the
  artifacts are frozen; a real deployment pays this once per corpus
  refresh, not per batch);
- ``stream_drain``: the recurring per-ingest cost — sketch the batch,
  probe the fixed-width index, broadcast the 256-row model, write the
  three sinks.

Usage: python tools/curation_probe.py [replicas ...]   (default: 10 50)

bench.py imports :func:`run` for its per-round ``curation50x`` row.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
_OFFSET = 10_000_000  # doc_id step per replica (multiple of 16, so the
# batch slice doc_id % 16 == 7 replicates into itself, never the corpus)


def _docs_dir(replicas: int) -> str:
    return f"/tmp/spark_graft_curation_{replicas}x"


def build_docs(spark: SparkSession, replicas: int) -> str:
    """Replicate sf0.1 ``documents`` ``replicas``× with doc_id offsets.
    Manifest carries the SOURCE fingerprint (r7 tools review: the old
    replica-count check was dead — the dir path already encodes the
    count — so a regenerated sf0.1 silently served stale replicas),
    and completeness rides Spark's _SUCCESS marker."""
    from map_reduce_framework_using_python_spark.sources.io import (
        read_json_guarded,
        source_fingerprint,
        write_json_atomic,
    )

    dst = _docs_dir(replicas)
    out = os.path.join(dst, "documents.parquet")
    manifest = os.path.join(dst, "_manifest.json")
    want = {
        "replicas": replicas,
        "src": source_fingerprint(os.path.join(SRC, "documents.parquet")),
    }
    if read_json_guarded(manifest) == want and os.path.exists(
        os.path.join(out, "_SUCCESS")
    ):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    d = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    parts = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
        for i in range(replicas)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)
    write_json_atomic(manifest, want)
    return dst


def _inject_boilerplate(
    spark: SparkSession, corpus, dst: str, n_inject: int, base_id: int
) -> None:
    """Write ``n_inject`` synthetic template-heavy batch docs: each is a
    concatenation of the 10-word prefixes (= one PARA_WORDS paragraph
    each) of 8 DISTINCT corpus docs — paragraph dup_frac 1.0 against
    the indexed corpus, but doc-level 3-gram MinHash similarity to any
    SINGLE corpus doc far below the 0.6 near-dup threshold. That's the
    RefinedWeb 'mostly template' page the document-level screen cannot
    see and the paragraph leg exists for. Ids ≡ 7 (mod 16) starting at
    ``base_id`` — the CALLER must put that above the replica span (r9:
    the old fixed 900M base collided with replicas 90–99 at 100×,
    leaking 3130 replica clones into the batch and flagging the whole
    row boilerplate — the exact within-batch artifact the slice filter
    exists to exclude)."""
    from pyspark.sql import functions as F

    assert base_id % 16 == 0, "base_id must be ≡ 0 (mod 16) so +7 rides the slice"
    base = [
        r["text"].split()[:10]
        for r in corpus.filter(F.length("text") > 120)
        .orderBy("doc_id")
        .limit(64)
        .select("text")
        .collect()
    ]
    rows = []
    for i in range(n_inject):
        paras = [" ".join(base[(i + j) % len(base)]) for j in range(8)]
        text = " ".join(paras)
        rows.append((base_id + 7 + 16 * i, text, "en", "inject", len(text)))
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(dst)


def run(
    spark: SparkSession,
    replicas: int,
    prune_cap: int | None = None,
    paragraph: bool = False,
    n_inject: int = 200,
    decon: bool = False,
    n_decon: int = 100,
    span: bool = False,
    n_span: int = 50,
) -> dict:
    """Build artifacts over the corpus slice, drain the batch slice
    through curate_stream, return stage timings + verdict counts.

    ``prune_cap`` materializes the witness-capped PRUNED index layout
    (operators/dedup_index.prune_index_witnesses) after the build and
    drains against it — the steady-state 100 TB configuration, where
    the per-ingest hot-bucket bound is paid once in maintenance instead
    of per micro-batch. Timed as its own stage (``prune``): it
    amortizes like the build, not like the drain.

    ``paragraph`` (r8: VERDICT item 4 — the standing bench rows showed
    n_boilerplate=0 because the leg defaults off) builds the corpus
    paragraph-digest index (own stage, ``paragraph_index_build`` —
    corpus-build cost like the MinHash index), injects ``n_inject``
    template-heavy docs into the batch (:func:`_inject_boilerplate`),
    and drains with ``paragraph_index_path`` set, so the row measures
    the drain WITH the sub-document leg active and a nonzero
    n_boilerplate proves it fired."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_minhash_index,
        prune_index_witnesses,
    )
    from map_reduce_framework_using_python_spark.operators.dsir import (
        build_dsir_model,
    )
    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
    )
    from map_reduce_framework_using_python_spark.streaming.curation import (
        curate_stream,
        read_metrics,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        _DOCS_SCHEMA,
    )

    dst = build_docs(spark, replicas)
    docs_path = os.path.join(dst, "documents.parquet")
    d = spark.read.parquet(docs_path)
    corpus = d.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM)
    run_root = os.path.join(dst, "run")
    shutil.rmtree(run_root, ignore_errors=True)
    index_path = os.path.join(run_root, "idx")
    model_path = os.path.join(run_root, "model")

    out: dict = {"replicas": replicas, "docs": d.count()}
    t0 = time.perf_counter()
    build_minhash_index(corpus, index_path, n=3, num_hashes=32, bands=16)
    out["index_build"] = round(time.perf_counter() - t0, 3)
    if prune_cap is not None:
        pruned_path = os.path.join(run_root, "idx_pruned")
        t0 = time.perf_counter()
        prune_index_witnesses(spark, index_path, pruned_path, cap=prune_cap)
        out["prune"] = round(time.perf_counter() - t0, 3)
        index_path = pruned_path  # drain probes the capped layout
    t0 = time.perf_counter()
    build_dsir_model(spark, corpus, F.col("lang") == "en", model_path)
    out["model_build"] = round(time.perf_counter() - t0, 3)

    para_path = None
    stream = spark.readStream.schema(_DOCS_SCHEMA).parquet(docs_path)
    if paragraph:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            build_paragraph_index,
        )

        para_path = os.path.join(run_root, "pidx")
        t0 = time.perf_counter()
        build_paragraph_index(corpus, para_path)
        out["paragraph_index_build"] = round(time.perf_counter() - t0, 3)
        inject_dir = os.path.join(run_root, "inject")
        # Inject base: one _OFFSET stride past the last replica, so the
        # range stays clear of ANY replica count (the old fixed 900M
        # base was inside replicas 90–99's span at 100×).
        inject_base = _OFFSET * (replicas + 1)
        _inject_boilerplate(spark, corpus, inject_dir, n_inject, inject_base)
        stream = stream.unionByName(
            spark.readStream.schema(_DOCS_SCHEMA).parquet(inject_dir)
        )
        # Replica clones of a batch doc land at doc_id + i·OFFSET ≡ 7
        # (mod 16) — in the BATCH, not the corpus — and the paragraph
        # verdict counts within-batch occurrences, so an unrestricted
        # batch would flag EVERY doc boilerplate (measured: 3040/3330
        # at 10×), a replica artifact. The paragraph row therefore
        # drains the ORIGINAL batch slice (+ the injected docs); corpus
        # scale still lives where the row measures it — in the indexes.
        stream = stream.filter(
            (F.col("doc_id") < _OFFSET) | (F.col("doc_id") >= inject_base)
        )
    bench_path = None
    if decon:
        # Contamination leg (r9): a 16-item synthetic benchmark suite
        # (texts in NEITHER corpus nor batch — the dedup legs cannot
        # mask the verdict), hash-embedded once at build time; plants =
        # n_decon batch docs carrying those texts verbatim (cosine 1.0).
        # Plant ids one further _OFFSET stride out than the paragraph
        # inject range, ≡ 7 (mod 16) so they ride the batch slice.
        from map_reduce_framework_using_python_spark.operators.similarity import (
            build_semdecon_bench,
        )

        bench_texts = [
            f"benchmark riddle {i} " + f"quizzical holdout item {i} " * 12
            for i in range(16)
        ]
        bench_path = os.path.join(run_root, "bench_emb")
        t0 = time.perf_counter()
        build_semdecon_bench(
            spark.createDataFrame(
                list(enumerate(bench_texts)), "doc_id BIGINT, text STRING"
            ),
            bench_path,
        )
        out["decon_bench_build"] = round(time.perf_counter() - t0, 3)
        # τ=0.90: the query-level default (0.30) is calibrated for the
        # 64-dim embeddings table; in the 16-dim hash-embed space random
        # bag-of-words vectors collide far more (measured at τ=0.30:
        # 207 ORGANIC docs flagged at 2× alongside the 100 plants).
        # Near-verbatim is the verdict this row plants and measures.
        decon_base = _OFFSET * (replicas + 2)
        # Each plant paragraph carries one unique salt token: without
        # it the repeated riddle text is GENUINE sub-document
        # boilerplate, so with the paragraph leg also on the plants
        # flag 'boilerplate' first (measured: n_contaminated=0 in the
        # all-legs smoke) and precedence masks the contamination
        # verdict. ~12 unit votes against ~84 concentrated base votes
        # keeps the hash-embed cosine ≈ 0.99 ≫ τ.
        plants = []
        for i in range(n_decon):
            k = i % 16
            text = f"benchmark riddle {k} " + " ".join(
                f"quizzical holdout item {k} plant{i}p{j}" for j in range(12)
            )
            plants.append((decon_base + 7 + 16 * i, text, "en", "plant", len(text)))
        plant_dir = os.path.join(run_root, "decon_plants")
        spark.createDataFrame(
            plants,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        ).coalesce(1).write.mode("overwrite").parquet(plant_dir)
        stream = stream.unionByName(
            spark.readStream.schema(_DOCS_SCHEMA).parquet(plant_dir)
        )
        if not paragraph:
            # Same replica-artifact exclusion as the paragraph row: the
            # batch is the ORIGINAL slice plus this row's plants.
            stream = stream.filter(
                (F.col("doc_id") < _OFFSET) | (F.col("doc_id") >= decon_base)
            )
    span_path = None
    if span:
        # ExactSubstr leg (r11): the corpus shingle index is one-off
        # build cost (own stage, like the other indexes); plants copy
        # 60 consecutive corpus tokens AT OFFSET 5 — the offset breaks
        # the paragraph leg's fixed 10-token chunk alignment and the
        # 40 unique salt tokens keep doc-level 3-gram Jaccard ≈ 0.4
        # below the MinHash threshold, so ONLY the span leg can see
        # these (the verdict this row plants: dup_frac ≈ 0.55 > 0.5).
        # 64 distinct source docs, n_span ≤ 64 recommended: two plants
        # sharing a source would be within-batch paragraph duplicates
        # of each other and precedence would mask the span verdict.
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            build_shingle_index,
        )

        span_path = os.path.join(run_root, "sidx")
        t0 = time.perf_counter()
        build_shingle_index(
            corpus, span_path, min_len=12, buckets=16, digest="xxhash64"
        )
        out["span_index_build"] = round(time.perf_counter() - t0, 3)
        base = [
            r["text"].split()[5:65]
            for r in corpus.filter(
                F.size(F.split(F.col("text"), " ")) >= 80
            )
            .orderBy("doc_id")
            .limit(64)
            .select("text")
            .collect()
        ]
        if not base:
            raise RuntimeError("span probe: no corpus doc has >= 80 tokens")
        span_base = _OFFSET * (replicas + 3)
        plants = []
        for i in range(n_span):
            toks = base[i % len(base)] + [
                f"spansalt{i}s{j}" for j in range(40)
            ]
            text = " ".join(toks)
            plants.append(
                (span_base + 7 + 16 * i, text, "en", "spanplant", len(text))
            )
        span_dir = os.path.join(run_root, "span_plants")
        spark.createDataFrame(
            plants,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        ).coalesce(1).write.mode("overwrite").parquet(span_dir)
        if not paragraph and not decon:
            # Same replica-artifact exclusion as the other plant rows.
            stream = stream.filter(
                (F.col("doc_id") < _OFFSET) | (F.col("doc_id") >= span_base)
            )
        stream = stream.unionByName(
            spark.readStream.schema(_DOCS_SCHEMA).parquet(span_dir)
        )
    stream = stream.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
    t0 = time.perf_counter()
    curate_stream(
        stream,
        corpus,
        index_path,
        model_path,
        out_root=os.path.join(run_root, "out"),
        checkpoint_dir=os.path.join(run_root, "ckpt"),
        paragraph_index_path=para_path,
        decon_bench_path=bench_path,
        decon_tau6=900_000,
        span_index_path=span_path,
    )
    out["stream_drain"] = round(time.perf_counter() - t0, 3)
    m = (
        read_metrics(spark, os.path.join(run_root, "out"))
        .agg(
            F.sum("n_in").alias("n_in"),
            F.sum("n_duplicate").alias("n_duplicate"),
            F.sum("n_boilerplate").alias("n_boilerplate"),
            F.sum("n_span_duplicate").alias("n_span_duplicate"),
            F.sum("n_contaminated").alias("n_contaminated"),
            F.sum("n_low_quality").alias("n_low_quality"),
            F.sum("n_curated").alias("n_curated"),
        )
        .collect()[0]
    )
    out.update({
        k: int(m[k])
        for k in (
            "n_in", "n_duplicate", "n_boilerplate", "n_span_duplicate",
            "n_contaminated", "n_low_quality", "n_curated",
        )
    })
    return out


def main() -> None:
    from map_reduce_framework_using_python_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--paragraph"]
    paragraph = "--paragraph" in sys.argv[1:]
    replica_list = [int(x) for x in args] or [10, 50]
    spark = get_spark(app_name="curation_probe")
    for replicas in replica_list:
        print(json.dumps(run(spark, replicas, paragraph=paragraph)))


if __name__ == "__main__":
    main()
