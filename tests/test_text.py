"""Text-analysis operator tests on crafted frames."""

from __future__ import annotations

from map_reduce_framework_using_python_spark.operators.text import (
    language_id,
    quality_scores,
    token_stats,
)


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "a b b c"), (2, "x")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_unique_tokens"] == 3
    assert out[1]["n_chars_measured"] == 7
    assert out[2]["n_tokens"] == 1


def test_quality_scores(spark):
    df = spark.createDataFrame([(1, "the cat and the hat")], ["doc_id", "text"])
    r = quality_scores(df).collect()[0]
    assert r["n_tokens"] == 5
    assert r["stopword_ratio"] == 0.6  # the, and, the
    assert r["distinct_ratio"] == 0.8  # the cat and hat / 5
    assert abs(r["avg_token_len"] - 3.0) < 1e-9


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "the value of the table and the row"), (2, "el perro y la casa de madrid")],
        ["doc_id", "text"],
    )
    out1 = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    out2 = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert out1 == out2
    assert out1[1] == "en"
    assert out1[2] == "es"


def test_language_id_recovers_each_profile(spark):
    """A document that IS a language's stopword profile must be
    identified as that language, for every profile (15 languages)."""
    from map_reduce_framework_using_python_spark.operators.text import LANG_PROFILES

    rows = [(i, " ".join(words)) for i, (lang, words) in enumerate(sorted(LANG_PROFILES.items()))]
    langs = [lang for lang, _ in sorted(LANG_PROFILES.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    # Some profiles share words (es/fr 'de la', nl/de 'de') — require
    # that at least 12 of 15 unambiguous profiles self-identify and the
    # rest still score > 0.
    hits = sum(1 for i, lang in enumerate(langs) if got[i] == lang)
    assert hits >= 12, {langs[i]: got[i] for i in range(len(langs)) if got[i] != langs[i]}


# ---------------------------------------------------------------- PII


def test_redact_pii_crafted(spark):
    from map_reduce_framework_using_python_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.b+c@sub.example.co and d@e.io thanks"),
        (2, "ssn 123-45-6789 tel +1 202-555-0142"),
        (3, "server 192.168.0.1 and 10.0.0.255"),
        (4, "nothing sensitive here"),
        (5, "call 44 555-123-4567 now"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in redact_pii(df).collect()}
    assert got[1].n_email == 2
    assert got[1].redacted == "mail <EMAIL> and <EMAIL> thanks"
    assert (got[2].n_ssn, got[2].n_phone) == (1, 1)
    assert got[2].redacted == "ssn <SSN> tel <PHONE>"
    assert got[3].n_ipv4 == 2
    assert got[3].redacted == "server <IP> and <IP>"
    assert got[4].redacted == rows[3][1]
    assert all(
        getattr(got[4], c) == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4")
    )
    # An SSN is consumed by the SSN rule even though the phone pattern
    # could also reach it — sequential order is the contract.
    assert got[5].n_phone == 1 and got[5].n_ssn == 0


def test_redact_pii_no_shuffle(spark):
    from map_reduce_framework_using_python_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_bare_nanp_phone(spark):
    """r7 review: a bare NANP 3-3-4 phone with no country code must be
    redacted too (the old pattern required a prefix group); SSN and
    IPv4 shapes stay with their own rules."""
    from map_reduce_framework_using_python_spark.operators.text import redact_pii

    rows = [
        (1, "call 555-123-4567 today"),
        (2, "intl +44 555-123-4567 and bare 555-123-4567"),
        (3, "ssn 123-45-6789 stays ssn; ip 10.0.0.1 stays ip"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in redact_pii(df).collect()}
    assert got[1].n_phone == 1
    assert got[1].redacted == "call <PHONE> today"
    assert got[2].n_phone == 2
    assert got[2].redacted == "intl <PHONE> and bare <PHONE>"
    assert (got[3].n_ssn, got[3].n_phone, got[3].n_ipv4) == (1, 0, 1)


def test_word_bigrams_empty_array_and_phone_boundaries(spark):
    """r7 operators review: (a) an EMPTY token array passed slice a
    length of -1 (crash) — now yields zero bigrams; (b) the phone rule
    no longer consumes the suffix of a longer digit run while still
    redacting bare and country-coded numbers whole."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.text import (
        redact_pii,
        word_bigrams,
    )

    df = spark.createDataFrame([([],), (["a"],), (["a", "b"],)], "ws array<string>")
    got = [r["bg"] for r in df.select(word_bigrams(F.col("ws"), " ").alias("bg")).collect()]
    assert got == [[], [], ["a b"]]

    texts = spark.createDataFrame(
        [
            (1, "call 555-123-4567 now"),
            (2, "tel +1 202-555-0042 ok"),
            (3, "card 5555-123-4567 ok"),      # digit-run suffix: NOT a phone
            (4, "num 555-123-45678 ok"),       # digit-run trailing: NOT a phone
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(texts).collect()}
    assert out[1]["n_phone"] == 1 and "<PHONE>" in out[1]["redacted"]
    assert out[2]["n_phone"] == 1 and "+<PHONE>" not in out[2]["redacted"]
    assert "<PHONE>" in out[2]["redacted"]
    assert out[3]["n_phone"] == 0 and out[3]["redacted"] == "card 5555-123-4567 ok"
    assert out[4]["n_phone"] == 0
