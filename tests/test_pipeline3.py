

def test_bigram_rarity_single_token_docs_do_not_crash(spark, tmp_path):
    """r7 review (reproduced crash): a single-token or empty document
    used to abort ns_bigram_rarity with an ANSI element_at error
    (sequence(1, 0) descends); the shared zip_with/slice bigram helper
    yields no bigrams for it, matching the oracle's empty
    generate_series."""
    import os

    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    df = spark.createDataFrame(
        [(1, "solo", "en", "s", 4),
         (2, "", "en", "s", 0),
         (3, "two words here", "en", "s", 14)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = {r["doc_id"]: r for r in REGISTRY["ns_bigram_rarity"].fn(spark, sf_dir).collect()}
    assert set(rows) == {3}  # token-poor docs emit no bigrams, no crash
    assert rows[3]["n_bigrams"] == 2
