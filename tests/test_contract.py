"""Driver-contract tests: __spark_entry__ exposes entry/queries/oracle_sql
with consistent keys and runnable plans."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = [k for k in osql if k not in qs]
    assert not missing, f"oracle keys without queries: {missing}"


def test_registry_names_unique_and_tagged():
    from map_reduce_framework_using_python_spark.plans import REGISTRY

    assert len(REGISTRY) == len(set(REGISTRY))
    untagged = [n for n, q in REGISTRY.items() if not q.tags]
    assert not untagged, f"untagged queries: {untagged}"


def test_oracle_tier_quadratic_baselines_are_marked():
    """The exact quadratic ground-truth twins carry the ``oracle_tier``
    tag (registry-level warning: correct but not the plan to run at
    scale), and each has an untagged scale-path sibling registered."""
    from map_reduce_framework_using_python_spark.plans import REGISTRY

    tiered = {n for n, q in REGISTRY.items() if "oracle_tier" in q.tags}
    assert tiered == {"ns_embedding_near_pairs", "ns_ngram_jaccard_pairs"}
    # The scale paths must exist and must NOT be oracle-tier.
    for scale_path in ("ns_minhash_lsh_pairs", "ns_lsh_cosine_topk",
                      "ns_lsh_topk_indexed", "ns_ivf_topk_indexed"):
        assert scale_path in REGISTRY, scale_path
        assert "oracle_tier" not in REGISTRY[scale_path].tags


def test_tooling_query_lists_resolve_in_registry():
    """Every query name referenced by the bench, the scale probe, and
    the plan-audit tool must exist in the registry — a rename or typo
    in the tooling dies here instead of at driver-bench time."""
    import importlib.util as ilu

    from map_reduce_framework_using_python_spark.plans import REGISTRY

    def load(path, name):
        spec = ilu.spec_from_file_location(name, path)
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    bench = load("/root/repo/bench.py", "_bench_mod")
    probe = load("/root/repo/tools/scale_probe.py", "_probe_mod")
    audit = load("/root/repo/tools/explain_audit.py", "_audit_mod")
    for src, names in (
        ("bench.HEADLINE", bench.HEADLINE),
        ("bench.R3_FLOOR", bench.R3_FLOOR),
        ("bench.R4_FLOOR", bench.R4_FLOOR),
        ("bench.R5_FLOOR", bench.R5_FLOOR),
        ("scale_probe.PROBE", probe.PROBE),
        ("explain_audit.AUDIT", audit.AUDIT),
    ):
        unknown = [n for n in names if n not in REGISTRY]
        assert not unknown, f"{src} references unknown queries: {unknown}"
    # R5_SCALE_FLOOR mixes registry queries with bench-local operator
    # rows (semdedup scaled twins) — only the registry-named keys must
    # resolve.
    unknown = [
        n for n in bench.R5_SCALE_FLOOR
        if not n.startswith("ns_semdedup_scaled") and n not in REGISTRY
    ]
    assert not unknown, f"bench.R5_SCALE_FLOOR unknown queries: {unknown}"
