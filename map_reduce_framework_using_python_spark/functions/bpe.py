"""Real merge-table BPE (byte-pair encoding) token counting.

Replaces the round-4 regex approximation: this is the actual BPE
algorithm — a fixed, learned merge table applied by the canonical
greedy lowest-rank merge loop (Sennrich et al. 2016), the mechanism
GPT-2-family tokenizers use. The merge table is a FIXED ARTIFACT
(tokenizers ship as frozen ``merges.txt`` files): :data:`MERGES` was
learned offline from the sf0.001 documents corpus with deterministic
tie-breaks (highest pair count, then lexicographically smallest pair),
40 merges.

Oracle equivalence: applying the rules SEQUENTIALLY in learned rank
order equals the greedy min-rank loop — a merge can only create pairs
involving its new symbol, and any rule mentioning that symbol was
necessarily learned later (higher rank), so no earlier rule ever
becomes applicable again. Sequential application is expressible in
ANSI SQL as a nested ``replace()`` chain over a space-separated symbol
string, which is exactly what :func:`oracle_encode_sql` emits for the
DuckDB twin; the equivalence is property-tested in
``tests/test_bpe.py`` and enforced end-to-end by the driver's oracle
parity gate.

Scale shape (100 TB): the Python merge loop runs per DISTINCT word
(vocabulary-bounded, Heaps' law), never per occurrence — documents
explode to (doc, word, count), the vocab table encodes under an
Arrow-batched pandas UDF, and a vocabulary-keyed shuffle join carries
``n_tok`` back onto the counts. Raw text never shuffles.
"""

from __future__ import annotations

#: GPT-2-style pre-tokenizer: letter runs | digit runs | single
#: non-alphanumeric.  Shared verbatim with the oracle SQL.
PRETOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"

#: Frozen merge table: 40 merges learned from the sf0.001 documents
#: corpus (deterministic learner: max pair count, ties to the
#: lexicographically smallest pair).  Rank = list position.
MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"),
]

_RANK: dict[tuple[str, str], int] = {p: i for i, p in enumerate(MERGES)}


def bpe_encode(word: str) -> list[str]:
    """Canonical greedy BPE: start from characters, repeatedly merge
    the lowest-rank adjacent pair until no mergeable pair remains."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = MERGES[best_rank]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_sequential(word: str) -> list[str]:
    """Rank-ordered sequential rule application — the replace-chain
    form the SQL oracle runs.  Equal to :func:`bpe_encode` (see module
    docstring for the cross-rule argument); the pytest property test
    checks it on arbitrary words, not just the training vocab.

    Symbols are separated by TWO spaces and each rule's pattern
    ``' a  b '`` consumes one space on each side, its replacement
    ``' ab '`` putting one back: adjacent same-rule occurrences then
    never compete for a shared boundary space, so one replace-all pass
    merges occurrences left-to-right exactly like the greedy loop's
    merge-all step.  (With single-space separators the first match
    consumes the boundary its right neighbor needs and every second
    merge in a run is skipped — caught by the property test.)"""
    s = "  " + "  ".join(word) + "  "
    for a, b in MERGES:
        s = s.replace(f" {a}  {b} ", f" {a}{b} ")
    return s.split()


def oracle_encode_sql(col: str = "w") -> str:
    """SQL expression computing ``len(bpe_encode(col))`` in DuckDB: a
    nested replace() chain in merge-rank order over the two-space-
    separated symbol string (see :func:`encode_sequential` for why two
    spaces)."""
    expr = f"'  ' || regexp_replace({col}, '(.)', '\\1  ', 'g')"
    for a, b in MERGES:
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    # Guard the empty word: string_split_regex('', ' +') is [''] in
    # DuckDB (length 1) while len(bpe_encode('')) = 0. Unreachable from
    # PRETOKEN_RE today, but the oracle must match the kernel on every
    # input a future pre-tokenizer could feed it (r7 functions review).
    return (
        f"CASE WHEN {col} = '' THEN 0 "
        f"ELSE array_length(string_split_regex(trim({expr}), ' +')) END"
    )


def oracle_tokens_sql(col: str = "w") -> str:
    """SQL expression computing ``' '.join(bpe_encode(col))`` in DuckDB
    — the TOKEN-STREAM twin of :func:`oracle_encode_sql`, sharing the
    same replace chain; consumers split on single spaces (BPE symbols
    never contain spaces). Empty input yields '' (unreachable from
    PRETOKEN_RE, guarded for parity with the kernel anyway)."""
    expr = f"'  ' || regexp_replace({col}, '(.)', '\\1  ', 'g')"
    for a, b in MERGES:
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return (
        f"CASE WHEN {col} = '' THEN '' "
        f"ELSE regexp_replace(trim({expr}), ' +', ' ', 'g') END"
    )
