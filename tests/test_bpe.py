"""Merge-table BPE (functions/bpe.py): the greedy lowest-rank loop,
its sequential replace-chain twin (what the SQL oracle runs), and the
DuckDB expression itself must agree exactly — the three-way equality
that makes ns_token_count_bpe oracle-exact rather than approximate."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_framework_using_python_spark.functions.bpe import (
    MERGES,
    bpe_encode,
    encode_sequential,
    oracle_encode_sql,
)


def test_known_encodings():
    # Full-word merges learned from the corpus vocabulary.
    assert bpe_encode("window") == ["window"]
    assert bpe_encode("column") == ["column"]
    assert bpe_encode("scan") == ["scan"]
    # Partial coverage: only some pairs merge.
    assert bpe_encode("aggregate") == ["agg", "r", "e", "g", "at", "e"]
    # No applicable merge → characters.
    assert bpe_encode("xyz") == ["x", "y", "z"]
    assert bpe_encode("a") == ["a"]


def test_merge_table_is_well_formed():
    # Every merged symbol referenced by a rule must be producible by an
    # EARLIER rule (or be a single char) — the property that makes
    # sequential rank-order application equal to greedy min-rank.
    producible = {a + b for a, b in MERGES}
    seen: set[str] = set()
    for a, b in MERGES:
        for sym in (a, b):
            assert len(sym) == 1 or sym in seen, (a, b, sym)
        seen.add(a + b)
    assert len(set(MERGES)) == len(MERGES)
    assert producible  # non-empty table


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwy", min_size=1, max_size=20))
def test_greedy_equals_sequential(word):
    """The separator-sharing hazard: with single-space separators a
    replace-all pass skips every second merge in a run (e.g. 'anan');
    the two-space encoding must make the chain exactly equal to the
    greedy loop on ARBITRARY words."""
    assert bpe_encode(word) == encode_sequential(word)


def test_duckdb_chain_matches_python():
    con = duckdb.connect()
    expr = oracle_encode_sql("w")
    words = [
        "window", "column", "scan", "sort", "aggregate", "xyz", "a",
        "anananan", "lktqpjtyananq", "orderr", "partpart", "keykey",
    ]
    values = ", ".join(f"('{w}')" for w in words)
    rows = con.sql(
        f"SELECT w, {expr} AS n FROM (VALUES {values}) AS t(w)"
    ).fetchall()
    for w, n in rows:
        assert n == len(bpe_encode(w)), (w, n, bpe_encode(w))


def test_oracle_sql_empty_word_is_zero():
    """r7 functions review: DuckDB string_split_regex('', ' +') is ['']
    (length 1) while bpe_encode('') is [] — the oracle SQL must guard
    the empty word so the parity holds on every input, not just
    PRETOKEN_RE outputs."""
    import duckdb

    from map_reduce_framework_using_python_spark.functions.bpe import (
        bpe_encode,
        oracle_encode_sql,
    )

    con = duckdb.connect()
    for w in ["", "a", "the", "zzz"]:
        got = con.execute(
            f"SELECT {oracle_encode_sql('w')} FROM (SELECT ? AS w)", [w]
        ).fetchone()[0]
        assert got == len(bpe_encode(w)), w


def test_oracle_tokens_sql_matches_kernel(duck):
    """The token-STREAM oracle twin (oracle_tokens_sql) must spell the
    greedy loop's exact token sequence, not just its length — on the
    training vocab, on words with repeated mergeable runs, and on the
    guarded empty input."""
    from map_reduce_framework_using_python_spark.functions.bpe import (
        bpe_encode,
        oracle_tokens_sql,
    )

    words = ["window", "order", "sort", "partition", "aggregate", "value",
             "join", "merge", "keyline", "ererer", "ststst", "q", ""]
    for w in words:
        got = duck.sql(
            f"SELECT {oracle_tokens_sql('w')} FROM (SELECT '{w}' AS w)"
        ).fetchone()[0]
        assert got == " ".join(bpe_encode(w)), (w, got)
