"""Pins for the shingle-index (ExactSubstr-on-ingest) lane
(operators/dedup_index.build_shingle_index / incremental_span_stats /
incremental_span_apply): replay-safe own-id exclusion, cross-batch
dedup via append, arrival-first == one-shot lexicographic under
monotonic ids, and digest-variant equivalence. The one-shot restriction
equivalences themselves are DuckDB-oracle-gated (ns_span_screen /
ns_span_screen_apply at both SFs)."""

from __future__ import annotations

import os
import tempfile

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    append_shingles_to_index,
    build_shingle_index,
    compact_shingle_index,
    incremental_span_apply,
    incremental_span_stats,
)
from map_reduce_framework_using_python_spark.plans.pipeline5 import (
    exact_substring_apply,
)

K = 12


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i:03d}" for i in range(n)]


def _fixture(spark):
    rep = _uniq("rep", 20)
    corpus = _docs(
        spark,
        [
            (1, " ".join(_uniq("a", 5) + rep + _uniq("b", 7))),
            (2, " ".join(_uniq("c", 15))),
        ],
    )
    # batch doc 10 carries the corpus passage (trims), 11 is clean,
    # 12/13 share a batch-only phrase (13 trims, 12 keeps it).
    phrase = _uniq("ph", 14)
    batch = _docs(
        spark,
        [
            (10, " ".join(_uniq("d", 4) + rep + _uniq("e", 3))),
            (11, " ".join(_uniq("f", 18))),
            (12, " ".join(phrase + _uniq("g", 6))),
            (13, " ".join(_uniq("h", 2) + phrase)),
        ],
    )
    return corpus, batch, rep, phrase


def test_screen_and_apply_against_corpus_and_within_batch(spark):
    corpus, batch, rep, phrase = _fixture(spark)
    with tempfile.TemporaryDirectory(prefix="spanidx") as root:
        path = os.path.join(root, "idx")
        build_shingle_index(corpus, path, min_len=K)

        stats = {
            r["doc_id"]: (r["n_positions"], r["n_dup"])
            for r in incremental_span_stats(spark, batch, path).collect()
        }
        assert stats[10] == (27 - K + 1, 20 - K + 1)  # the rep run's shingles
        assert stats[11][1] == 0
        assert stats[12][1] == 14 - K + 1 and stats[13][1] == 14 - K + 1

        out = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in incremental_span_apply(spark, batch, path).collect()
        }
        assert out[10] == (" ".join(_uniq("d", 4) + _uniq("e", 3)), 20)
        assert out[11][1] == 0
        # batch-only repeat: doc 12 (first site) keeps, doc 13 trims
        assert out[12] == (" ".join(phrase + _uniq("g", 6)), 0)
        assert out[13] == (" ".join(_uniq("h", 2)), 14)

        # Arrival-first == one-shot lexicographic keep-one when batch
        # ids follow corpus ids (they do here: 10-13 > 1-2).
        one_shot = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in exact_substring_apply(
                corpus.unionByName(batch), K
            ).collect()
            if r["doc_id"] >= 10
        }
        assert out == one_shot


def test_append_extends_dedup_and_replay_is_safe(spark):
    corpus, batch, rep, phrase = _fixture(spark)
    with tempfile.TemporaryDirectory(prefix="spanidx") as root:
        path = os.path.join(root, "idx")
        build_shingle_index(corpus, path, min_len=K)
        before = sorted(
            map(tuple, incremental_span_stats(spark, batch, path).collect())
        )
        # Replay safety: appending the batch itself must not change its
        # own verdicts (exclude_own anti-joins the index on batch ids).
        append_shingles_to_index(batch, path)
        after = sorted(
            map(tuple, incremental_span_stats(spark, batch, path).collect())
        )
        assert before == after

        # Cross-batch: a LATER batch repeating batch-only content (the
        # phrase from docs 12/13) now screens dirty against the index.
        batch2 = _docs(spark, [(20, " ".join(phrase + _uniq("z", 4)))])
        s2 = incremental_span_stats(spark, batch2, path).collect()[0]
        assert s2["n_dup"] == 14 - K + 1
        a2 = incremental_span_apply(spark, batch2, path).collect()[0]
        assert (a2["clean_text"], a2["n_removed"]) == (" ".join(_uniq("z", 4)), 14)

        # Compaction sheds the replayed duplicates without changing
        # verdicts.
        append_shingles_to_index(batch2, path)
        compact_shingle_index(spark, path)
        assert sorted(
            map(tuple, incremental_span_stats(spark, batch, path).collect())
        ) == before


def test_xxhash64_index_is_equivalent(spark):
    corpus, batch, _, _ = _fixture(spark)
    with tempfile.TemporaryDirectory(prefix="spanidx") as root:
        p_md5 = os.path.join(root, "md5")
        p_xx = os.path.join(root, "xx")
        build_shingle_index(corpus, p_md5, min_len=K)
        build_shingle_index(corpus, p_xx, min_len=K, digest="xxhash64")
        for fn in (incremental_span_stats, incremental_span_apply):
            a = sorted(map(tuple, fn(spark, batch, p_md5).collect()))
            b = sorted(map(tuple, fn(spark, batch, p_xx).collect()))
            assert a == b, fn.__name__


def test_span_screen_stream_drained_equals_one_shot(spark):
    """The drained streaming screen (single-file source → one batch)
    equals the one-shot incremental probe, and the registry twin
    st_span_dedup equals ns_span_screen on the same sf_dir."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY
    from tests.conftest import SF_SMOKE

    st = sorted(map(tuple, REGISTRY["st_span_dedup"].fn(spark, SF_SMOKE).collect()))
    ns = sorted(map(tuple, REGISTRY["ns_span_screen"].fn(spark, SF_SMOKE).collect()))
    assert st == ns and len(st) > 0
