"""Pins for the one-pass ingest curation capstone
(streaming/curation.py): the drained stream must equal the one-shot
composition of its three legs (dedup screen, DSIR gate, PSI), the
rejection ledger must partition the batch with the curated set, and
reasons must carry the documented precedence (duplicate > low_quality).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    build_minhash_index,
)
from map_reduce_framework_using_python_spark.operators.dsir import build_dsir_model
from map_reduce_framework_using_python_spark.plans.northstar import (
    _BATCH_MOD,
    _BATCH_REM,
)
from map_reduce_framework_using_python_spark.streaming.curation import (
    curate_batch,
    curate_stream,
    read_maintenance,
    read_metrics,
    read_rejected,
)
from map_reduce_framework_using_python_spark.streaming.ingest import (
    read_documents_stream,
)
from tests.conftest import SF_SMOKE


def _split(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return (
        d.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM),
        d.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM),
    )


def _artifacts(spark, root):
    corpus, batch = _split(spark)
    index_path = os.path.join(root, "idx")
    model_path = os.path.join(root, "model")
    build_minhash_index(corpus, index_path, n=3, num_hashes=32, bands=16)
    build_dsir_model(spark, corpus, F.col("lang") == "en", model_path)
    return corpus, batch, index_path, model_path


def test_curation_stream_equals_one_shot_composition(spark):
    with tempfile.TemporaryDirectory() as d:
        corpus, batch, index_path, model_path = _artifacts(spark, d)
        out_root = os.path.join(d, "out")
        streamed = curate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            corpus,
            index_path,
            model_path,
            out_root=out_root,
            checkpoint_dir=os.path.join(d, "ckpt"),
        )
        curated, rejected, metrics = curate_batch(
            spark, batch, corpus, index_path, model_path
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, curated.collect())
        )
        assert sorted(map(tuple, read_rejected(spark, out_root).collect())) == sorted(
            map(tuple, rejected.collect())
        )
        m_stream = read_metrics(spark, out_root).drop("batch_id").collect()
        assert list(map(tuple, m_stream)) == list(map(tuple, metrics.collect()))


def test_curation_partitions_the_batch(spark):
    """curated ∪ rejected == batch, disjointly; metrics counts agree."""
    with tempfile.TemporaryDirectory() as d:
        corpus, batch, index_path, model_path = _artifacts(spark, d)
        curated, rejected, metrics = curate_batch(
            spark, batch, corpus, index_path, model_path
        )
        cur_ids = {r["doc_id"] for r in curated.collect()}
        rej = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        batch_ids = {r["doc_id"] for r in batch.collect()}
        assert cur_ids | set(rej) == batch_ids
        assert not (cur_ids & set(rej))
        # The calibrated tau gate keeps roughly the better-than-median
        # half of non-duplicate docs — the pipeline must actually pass
        # a meaningful fraction, not reject the world.
        assert len(cur_ids) > 0.2 * len(batch_ids)
        m = metrics.collect()[0]
        assert m["n_in"] == len(batch_ids)
        assert m["n_curated"] == len(cur_ids)
        assert m["n_duplicate"] == sum(1 for v in rej.values() if v == "duplicate")
        assert m["n_low_quality"] == sum(
            1 for v in rej.values() if v == "low_quality"
        )
        assert m["psi"] is not None


def test_duplicate_takes_precedence_over_low_quality(spark):
    """A doc that is BOTH a near-dup and low quality must be ledgered
    as duplicate — plant one: copy a corpus doc (dup for sure) whose
    gate verdict we force negative by checking it's ledgered as
    duplicate regardless of its quality verdict."""
    with tempfile.TemporaryDirectory() as d:
        corpus, batch, index_path, model_path = _artifacts(spark, d)
        src = corpus.limit(1).collect()[0]
        clone = spark.createDataFrame(
            [(999_999, src["text"], src["lang"], src["source"], src["n_chars"])],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        _, rejected, _ = curate_batch(
            spark, clone, corpus, index_path, model_path
        )
        ledger = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        assert ledger.get(999_999) == "duplicate"


def test_paragraph_leg_rejects_boilerplate_with_precedence(spark):
    """With a paragraph-digest index supplied, docs whose dup_frac
    against the corpus exceeds max_dup_frac reject as 'boilerplate';
    document-level duplicates keep precedence over it; metrics
    partition n_in across the four verdicts; the streaming path drains
    to the identical composition."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_paragraph_index,
        incremental_paragraph_stats,
    )

    with tempfile.TemporaryDirectory() as root:
        corpus, batch, index_path, model_path = _artifacts(spark, root)
        para_path = os.path.join(root, "pidx")
        build_paragraph_index(corpus, para_path)
        # threshold=0.99 keeps the near-dup screen to exact copies: the
        # synthetic corpus's partially-boilerplate docs are ALSO ~0.96
        # doc-level near-dups (measured), so at the default threshold
        # 'duplicate' precedence absorbs them all and the paragraph leg
        # would be untested
        curated, rejected, metrics = curate_batch(
            spark, batch, corpus, index_path, model_path, threshold=0.99,
            paragraph_index_path=para_path, max_dup_frac=0.3,
        )
        rej = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        cur_ids = {r["doc_id"] for r in curated.collect()}
        m = metrics.collect()[0]
        assert m["n_in"] == (
            m["n_duplicate"] + m["n_boilerplate"] + m["n_low_quality"]
            + m["n_curated"]
        )
        assert m["n_curated"] == len(cur_ids)
        assert m["n_boilerplate"] == sum(
            1 for v in rej.values() if v == "boilerplate"
        )
        # ground truth for the boilerplate verdict + precedence
        pstats = {
            r["doc_id"]: r["dup_frac"]
            for r in incremental_paragraph_stats(spark, batch, para_path).collect()
        }
        dup_ids = {d for d, v in rej.items() if v == "duplicate"}
        for doc_id, frac in pstats.items():
            if frac > 0.3 and doc_id not in dup_ids:
                assert rej.get(doc_id) == "boilerplate", (doc_id, frac)
            elif doc_id in cur_ids or rej.get(doc_id) == "low_quality":
                assert frac <= 0.3
        assert m["n_boilerplate"] > 0  # the leg actually fires on this corpus

        # streaming drain equals the one-shot composition
        out_root = os.path.join(root, "out")
        streamed = curate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            corpus,
            index_path,
            model_path,
            out_root=out_root,
            checkpoint_dir=os.path.join(root, "ckpt"),
            threshold=0.99,
            paragraph_index_path=para_path,
            max_dup_frac=0.3,
        )
        assert {tuple(r) for r in streamed.collect()} == {
            tuple(r) for r in curated.collect()
        }
        rej_stream = {
            r["doc_id"]: r["reason"]
            for r in read_rejected(spark, out_root).collect()
        }
        assert rej_stream == rej


def test_unscorable_and_empty_batches_stay_accounted(spark):
    """r7 streaming review: a doc the DSIR gate cannot score (empty
    text → no token rows) must land in rejected/low_quality instead of
    vanishing, keeping curated ∪ rejected == batch; and an EMPTY batch
    still emits its metrics row (psi NULL) instead of being annihilated
    by the old crossJoin against the zero-row PSI frame."""
    with tempfile.TemporaryDirectory() as root:
        corpus, batch, index_path, model_path = _artifacts(spark, root)
        ghost = spark.createDataFrame(
            [(990001, "", "en", "srcA", 0),
             (990002, "   ", "en", "srcA", 3)],
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        )
        batch2 = batch.unionByName(ghost)
        curated, rejected, metrics = curate_batch(
            spark, batch2, corpus, index_path, model_path
        )
        cur_ids = {r["doc_id"] for r in curated.collect()}
        rej = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        all_ids = {r["doc_id"] for r in batch2.select("doc_id").collect()}
        assert cur_ids | set(rej) == all_ids
        assert not (cur_ids & set(rej))
        assert rej[990001] == "low_quality"
        assert rej[990002] == "low_quality"
        m = metrics.collect()[0]
        assert m["n_in"] == len(all_ids)

        empty = batch2.filter(F.lit(False))
        _c, _r, m_empty = curate_batch(
            spark, empty, corpus, index_path, model_path
        )
        rows = m_empty.collect()
        assert len(rows) == 1
        assert rows[0]["n_in"] == 0
        assert rows[0]["psi"] is None


def test_semdecon_leg_rejects_contaminated_with_precedence(spark):
    """With a persisted benchmark embedding table supplied, a batch doc
    whose hash-embed cosine against the benchmark clears tau rejects as
    'contaminated'; document-level duplicates keep precedence; metrics
    partition n_in across the five verdicts; the streaming drain equals
    the one-shot composition. The planted benchmark text exists in
    NEITHER corpus nor batch, so the dedup legs cannot mask the leg."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        build_semdecon_bench,
    )

    bench_text = "zq quizzical benchmark riddle " * 8
    with tempfile.TemporaryDirectory() as root:
        corpus, batch, index_path, model_path = _artifacts(spark, root)
        bench_docs = spark.createDataFrame(
            [(1, bench_text)], "doc_id long, text string"
        )
        bench_path = os.path.join(root, "bench_emb")
        build_semdecon_bench(bench_docs, bench_path)
        # Planted contaminated doc: same text as the benchmark item
        # (cosine 1.0), absent from the corpus (not a duplicate).
        plant = spark.createDataFrame(
            [(888_888, bench_text, "en", "plant", len(bench_text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        batch2 = batch.unionByName(plant)
        curated, rejected, metrics = curate_batch(
            spark, batch2, corpus, index_path, model_path,
            decon_bench_path=bench_path,
        )
        rej = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        cur_ids = {r["doc_id"] for r in curated.collect()}
        assert rej.get(888_888) == "contaminated"
        m = metrics.collect()[0]
        assert m["n_in"] == (
            m["n_duplicate"] + m["n_boilerplate"] + m["n_contaminated"]
            + m["n_low_quality"] + m["n_curated"]
        )
        assert m["n_contaminated"] >= 1
        assert m["n_curated"] == len(cur_ids)

        # Precedence: a doc that is BOTH a corpus duplicate and
        # benchmark-contaminated ledgers as duplicate.
        src = corpus.limit(1).collect()[0]
        bench2_path = os.path.join(root, "bench_emb2")
        build_semdecon_bench(
            spark.createDataFrame([(2, src["text"])], "doc_id long, text string"),
            bench2_path,
        )
        clone = spark.createDataFrame(
            [(999_999, src["text"], src["lang"], src["source"], src["n_chars"])],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        _, rej2, _ = curate_batch(
            spark, clone, corpus, index_path, model_path,
            decon_bench_path=bench2_path,
        )
        assert {r["doc_id"]: r["reason"] for r in rej2.collect()}.get(
            999_999
        ) == "duplicate"

        # Streaming drain equals the one-shot composition (plant rides
        # an extra parquet dir unioned into the stream).
        plant_dir = os.path.join(root, "plant")
        plant.coalesce(1).write.parquet(plant_dir)
        out_root = os.path.join(root, "out")
        from map_reduce_framework_using_python_spark.streaming.ingest import (
            _DOCS_SCHEMA,
        )

        stream = (
            read_documents_stream(spark, SF_SMOKE)
            .filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
            .unionByName(
                spark.readStream.schema(_DOCS_SCHEMA).parquet(plant_dir)
            )
        )
        streamed = curate_stream(
            stream,
            corpus,
            index_path,
            model_path,
            out_root=out_root,
            checkpoint_dir=os.path.join(root, "ckpt"),
            decon_bench_path=bench_path,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, curated.collect())
        )
        assert sorted(
            map(tuple, read_rejected(spark, out_root).collect())
        ) == sorted(map(tuple, rejected.collect()))


def test_span_leg_rejects_mostly_copied_docs_with_precedence(spark):
    """With a shingle index supplied, a batch doc most of whose stride-1
    token-shingle positions are duplicated against the corpus rejects
    as 'span_duplicate'; a full clone (doc-level near-dup AND span-dup)
    keeps 'duplicate' precedence; metrics partition n_in across the six
    verdicts; the streaming drain equals the one-shot composition. The
    plant copies 60 consecutive corpus tokens AT OFFSET 5 plus 40
    unique salts — offset breaks the paragraph leg's chunk alignment,
    salts keep doc-level 3-gram Jaccard below the MinHash threshold, so
    only the span leg can see it."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_shingle_index,
        incremental_span_stats,
    )

    with tempfile.TemporaryDirectory() as root:
        corpus, batch, index_path, model_path = _artifacts(spark, root)
        span_path = os.path.join(root, "sidx")
        build_shingle_index(
            corpus, span_path, min_len=12, buckets=16, digest="xxhash64"
        )
        src = (
            corpus.filter(F.size(F.split(F.col("text"), " ")) >= 80)
            .orderBy("doc_id")
            .limit(1)
            .collect()[0]
        )
        toks = src["text"].split()[5:65] + [f"salt{j}" for j in range(40)]
        plant_text = " ".join(toks)
        plant = spark.createDataFrame(
            [(777_777, plant_text, "en", "plant", len(plant_text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        batch2 = batch.unionByName(plant)
        curated, rejected, metrics = curate_batch(
            spark, batch2, corpus, index_path, model_path,
            span_index_path=span_path,
        )
        rej = {r["doc_id"]: r["reason"] for r in rejected.collect()}
        cur_ids = {r["doc_id"] for r in curated.collect()}
        assert rej.get(777_777) == "span_duplicate"
        m = metrics.collect()[0]
        assert m["n_in"] == (
            m["n_duplicate"] + m["n_boilerplate"] + m["n_span_duplicate"]
            + m["n_contaminated"] + m["n_low_quality"] + m["n_curated"]
        )
        assert m["n_span_duplicate"] >= 1
        assert m["n_curated"] == len(cur_ids)
        # ground truth: every non-duplicate batch doc over the 0.5 span
        # dup_frac must be ledgered span_duplicate, and no doc at or
        # under it may be
        stats = {
            r["doc_id"]: r["dup_frac"]
            for r in incremental_span_stats(spark, batch2, span_path).collect()
        }
        dup_ids = {d for d, v in rej.items() if v == "duplicate"}
        for doc_id, frac in stats.items():
            if frac > 0.5 and doc_id not in dup_ids:
                assert rej.get(doc_id) == "span_duplicate", (doc_id, frac)
            elif doc_id in cur_ids or rej.get(doc_id) == "low_quality":
                assert frac <= 0.5, (doc_id, frac)

        # precedence: a verbatim corpus clone is duplicate, never span
        src0 = corpus.limit(1).collect()[0]
        clone = spark.createDataFrame(
            [(999_999, src0["text"], src0["lang"], src0["source"],
              src0["n_chars"])],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        _, rej2, _ = curate_batch(
            spark, clone, corpus, index_path, model_path,
            span_index_path=span_path,
        )
        assert {r["doc_id"]: r["reason"] for r in rej2.collect()}.get(
            999_999
        ) == "duplicate"

        # streaming drain equals the one-shot composition
        from map_reduce_framework_using_python_spark.streaming.ingest import (
            _DOCS_SCHEMA,
        )

        plant_dir = os.path.join(root, "plant")
        plant.coalesce(1).write.parquet(plant_dir)
        out_root = os.path.join(root, "out")
        stream = (
            read_documents_stream(spark, SF_SMOKE)
            .filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
            .unionByName(
                spark.readStream.schema(_DOCS_SCHEMA).parquet(plant_dir)
            )
        )
        streamed = curate_stream(
            stream,
            corpus,
            index_path,
            model_path,
            out_root=out_root,
            checkpoint_dir=os.path.join(root, "ckpt"),
            span_index_path=span_path,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, curated.collect())
        )
        assert sorted(
            map(tuple, read_rejected(spark, out_root).collect())
        ) == sorted(map(tuple, rejected.collect()))
        m_stream = (
            read_metrics(spark, out_root)
            .agg(F.sum("n_span_duplicate").alias("s"))
            .collect()[0]
        )
        assert int(m_stream["s"]) == m["n_span_duplicate"]


def test_takedown_unblocks_duplicate_on_reingest(spark):
    """Composition with the retraction verb (r11): a batch doc rejected
    as 'duplicate' is re-curated after its corpus dup-sources are
    RETRACTED from the minhash index
    (operators/dedup_index.retract_docs_from_index — the takedown a
    deletion request triggers between micro-batches). With the sources
    tombstoned the doc must clear the dedup leg: its verdict either
    becomes accepted or falls through to a later reason in the
    precedence chain, never 'duplicate' again."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_dedup_pairs,
        retract_docs_from_index,
    )

    with tempfile.TemporaryDirectory() as d:
        corpus, batch, index_path, model_path = _artifacts(spark, d)
        _c, rejected, _m = curate_batch(
            spark, batch, corpus, index_path, model_path
        )
        dup_ids = [
            r["doc_id"]
            for r in rejected.filter(F.col("reason") == "duplicate").collect()
        ]
        assert dup_ids  # non-vacuous: planted near-dups straddle the split
        victim = dup_ids[0]
        pairs = incremental_dedup_pairs(spark, batch, corpus, index_path)
        partners = [
            r["corpus_doc"]
            for r in pairs.filter(F.col("batch_doc") == victim).collect()
        ]
        assert partners
        retract_docs_from_index(partners, index_path, spark=spark)
        _c2, rejected2, _m2 = curate_batch(
            spark, batch, corpus, index_path, model_path
        )
        reasons2 = {r["doc_id"]: r["reason"] for r in rejected2.collect()}
        assert reasons2.get(victim) != "duplicate"


def _doc_stream(spark, land):
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        _DOCS_SCHEMA,
    )

    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(land)
    )


def _clone_of(spark, src_row, doc_id):
    return spark.createDataFrame(
        [(doc_id, src_row["text"], src_row["lang"], src_row["source"],
          src_row["n_chars"])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_takedown_queue_flips_duplicate_between_drains(spark):
    """The r12 takedown leg: a clone of a corpus doc is ledgered
    `duplicate` in drain 1; its entire dup-partner set lands in the
    takedown queue; drain 2's clone of the SAME text screens clean of
    the duplicate verdict — maintenance between drains changed the
    later verdict without touching the sinks' schemas."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_dedup_pairs,
    )

    with tempfile.TemporaryDirectory() as d:
        corpus, batch, src_idx, model_path = _artifacts(spark, d)
        index_path = os.path.join(d, "idx_copy")
        shutil.copytree(src_idx, index_path)
        src = corpus.limit(1).collect()[0]
        land = os.path.join(d, "land")
        os.makedirs(land)
        queue = os.path.join(d, "queue")
        os.makedirs(queue)
        out_root = os.path.join(d, "out")
        ckpt = os.path.join(d, "ckpt")

        def drain():
            return curate_stream(
                _doc_stream(spark, land), corpus, index_path, model_path,
                out_root=out_root, checkpoint_dir=ckpt,
                takedown_queue_dir=queue,
            )

        _clone_of(spark, src, 999_001).coalesce(1).write.parquet(
            os.path.join(land, "b1.parquet")
        )
        drain()
        rej = {
            r["doc_id"]: r["reason"]
            for r in read_rejected(spark, out_root).collect()
        }
        assert rej.get(999_001) == "duplicate"

        # takedown: every corpus partner the clone collides with. The
        # queue contract is FIRST COLUMN = doc id, positionally (r13
        # ADVICE) — use a non-doc_id name to pin that the drain never
        # depends on the literal column name.
        partners = (
            incremental_dedup_pairs(
                spark, _clone_of(spark, src, 999_002), corpus, index_path
            )
            .select(F.col("corpus_doc").alias("takedown_id"))
            .distinct()
        )
        assert partners.count() > 0
        partners.coalesce(1).write.parquet(
            os.path.join(queue, "takedown.parquet")
        )
        _clone_of(spark, src, 999_002).coalesce(1).write.parquet(
            os.path.join(land, "b2.parquet")
        )
        drain()
        rej2 = {
            r["doc_id"]: r["reason"]
            for r in read_rejected(spark, out_root).collect()
        }
        cur2 = {r["doc_id"] for r in
                spark.read.parquet(os.path.join(out_root, "curated")).collect()}
        # same text, later drain: no longer a duplicate (partition
        # invariant still holds — it lands curated or rejected for a
        # NON-duplicate reason)
        assert 999_002 in cur2 or (
            999_002 in rej2 and rej2[999_002] != "duplicate"
        )
        assert rej.get(999_001) == "duplicate"  # drain-1 ledger intact
        # metrics schema unchanged by the takedown leg
        m = read_metrics(spark, out_root)
        assert m.columns == [
            "batch_id", "n_in", "n_duplicate", "n_boilerplate",
            "n_span_duplicate", "n_contaminated", "n_low_quality",
            "n_curated", "psi",
        ]


def test_takedown_queue_drained_equals_one_shot_bulk_retraction(spark):
    """Pre-seeded queue == bulk retract-then-curate: the streamed drain
    with the queue serviced before the batch equals curate_batch
    against an index with one bulk retraction of the same ids
    (drained == one-shot), and the retraction silences the duplicate
    leg entirely (n_duplicate == 0) without schema drift. Replay: a
    second drain over a fresh checkpoint (redelivered batch + already-
    consumed queue re-read) yields the same curated set."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_dedup_pairs,
        retract_docs_from_index,
    )

    with tempfile.TemporaryDirectory() as d:
        corpus, batch, src_idx, model_path = _artifacts(spark, d)
        partners = (
            incremental_dedup_pairs(spark, batch, corpus, src_idx)
            .select(F.col("corpus_doc").alias("doc_id"))
            .distinct()
        )
        assert partners.count() > 0

        streamed_idx = os.path.join(d, "idx_stream")
        shutil.copytree(src_idx, streamed_idx)
        queue = os.path.join(d, "queue")
        partners.coalesce(1).write.parquet(
            os.path.join(queue, "takedown.parquet")
        )
        out_root = os.path.join(d, "out")
        streamed = curate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            corpus, streamed_idx, model_path,
            out_root=out_root, checkpoint_dir=os.path.join(d, "ckpt"),
            takedown_queue_dir=queue,
        )
        got = sorted(map(tuple, streamed.collect()))

        bulk_idx = os.path.join(d, "idx_bulk")
        shutil.copytree(src_idx, bulk_idx)
        retract_docs_from_index(partners, bulk_idx)
        curated, _rejected, metrics = curate_batch(
            spark, batch, corpus, bulk_idx, model_path
        )
        assert got == sorted(map(tuple, curated.collect()))
        m = read_metrics(spark, out_root).collect()[0]
        assert m["n_duplicate"] == 0
        assert metrics.collect()[0]["n_duplicate"] == 0

        # replay (fresh checkpoint): idempotent takedown + idempotent
        # sinks → same curated set
        replayed = curate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            corpus, streamed_idx, model_path,
            out_root=out_root, checkpoint_dir=os.path.join(d, "ckpt2"),
            takedown_queue_dir=queue,
        )
        assert sorted(map(tuple, replayed.collect())) == got


def test_curate_stream_self_maintenance_interleaved(spark):
    """The r13 maintenance tick (curate_stream maintain_every=N — the
    ann_ingest self-maintenance pattern inside the capstone): a
    queue-driven mass retraction leaves tombstones; the maintained
    stream compacts its own index between micro-batches, the drained
    curated set is IDENTICAL to the unmaintained run (maintenance is
    layout-only), the ledger carries decision / action /
    decision_after rows with every post-action re-plan noop, and the
    tombstone log is physically retired by the in-stream compact."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        TOMBSTONE_DIR,
    )
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_dedup_pairs,
    )

    with tempfile.TemporaryDirectory() as d:
        corpus, batch, src_idx, model_path = _artifacts(spark, d)
        partners = (
            incremental_dedup_pairs(spark, batch, corpus, src_idx)
            .select(F.col("corpus_doc").alias("takedown_id"))
            .distinct()
        )
        assert partners.count() > 0
        queue = os.path.join(d, "queue")
        partners.coalesce(1).write.parquet(
            os.path.join(queue, "takedown.parquet")
        )

        plain_idx = os.path.join(d, "idx_plain")
        shutil.copytree(src_idx, plain_idx)
        maint_idx = os.path.join(d, "idx_maint")
        shutil.copytree(src_idx, maint_idx)

        def stream():
            return read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            )

        plain = curate_stream(
            stream(), corpus, plain_idx, model_path,
            out_root=os.path.join(d, "out_plain"),
            checkpoint_dir=os.path.join(d, "ck1"),
            takedown_queue_dir=queue,
        )
        maint_out = os.path.join(d, "out_maint")
        maintained = curate_stream(
            stream(), corpus, maint_idx, model_path,
            out_root=maint_out,
            checkpoint_dir=os.path.join(d, "ck2"),
            takedown_queue_dir=queue,
            maintain_every=1,
            # any tombstone triggers the compact decision: the pin is
            # about the tick's mechanics, not the default thresholds
            maintain_thresholds={"compact_tombstone_frac": 1e-6},
        )
        # drained == drained-with-maintenance (layout-only, byte-equal)
        assert sorted(map(tuple, maintained.collect())) == sorted(
            map(tuple, plain.collect())
        )
        led = read_maintenance(spark, maint_out).collect()
        assert led
        assert all(r["decision_after"] == "noop" for r in led)
        acted = [r for r in led if r["action"] != "noop"]
        assert acted
        assert all(r["kind"] == "minhash" for r in acted)
        assert all("compact" in r["action"] for r in acted)
        # the in-stream compact physically retired the tombstone log
        assert not os.path.isdir(
            os.path.join(maint_idx, "buckets", TOMBSTONE_DIR)
        )


def test_takedown_id_column_name_beats_position():
    """r13 ADVICE: a queue file that carries a NAMED doc_id column uses
    it even when another column was prepended (a positional read would
    silently retract the wrong values); without the name, the first
    column stays the documented contract."""
    from map_reduce_framework_using_python_spark.streaming.curation import (
        _takedown_id_col,
    )

    assert _takedown_id_col(["ts", "doc_id"]) == "doc_id"
    assert _takedown_id_col(["doc_id", "note"]) == "doc_id"
    assert _takedown_id_col(["takedown_id", "why"]) == "takedown_id"
