"""Training-pipeline operators, part 8: paragraph-level exact dedup,
the CCNet stratified-sampling realization, and the epoch-plan
realization.

Curation ops from published pipeline practice (the reference's
users would chain mapper/reducer jobs over ``documents`` for each,
`Readme.md:6`; here each is one declarative plan):

- **Paragraph dedup stats** (``ns_paragraph_dedup``): RefinedWeb /
  MassiveText-style exact dedup at sub-document granularity. Documents
  are windowed into non-overlapping 10-word "paragraphs" (the synthetic
  corpus has no punctuation, so fixed word windows are the honest
  paragraph analogue — the real-text form swaps the splitter, nothing
  else), each paragraph is fingerprinted, and every document reports
  how much of it is boilerplate: paragraph instances whose text occurs
  ≥2 times anywhere in the corpus. The per-doc duplicate fraction is
  the standard removal / down-weighting signal between document-level
  exact dedup (ns_dedup_exact — misses partial copies) and span dedup
  (ns_span_dedup — finds them at token granularity but costs more).
- **CCNet sample** (``ns_ccnet_sample``): the step AFTER
  ns_ccnet_buckets_scaled stratifies — realize the cut ("keep head,
  sample middle at 1/2, tail at 1/10") with hash-derived randomness so
  the sample reproduces on any engine / retry / partitioning (the same
  no-``rand()`` rule as ns_weighted_sample and the DSIR resample).

Determinism rules (plans/core.py): fractions land half-up on the 1e-6
grid; sampling uses md5-derived integers compared against exact integer
thresholds, so no float boundary can disagree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    _paragraph_instances,
    _PINST_KEY,
    PARA_WORDS,
    paragraph_clean_expr,
)
from map_reduce_framework_using_python_spark.plans.core import persist_lane, query, t
from map_reduce_framework_using_python_spark.plans.pipeline7 import (
    _CCNET_ASSIGN_ORACLE,
    _ccnet_scaled_assign,
)

#: Paragraph window: non-overlapping 10-word chunks — the ONE canonical
#: constant lives with the shared digesting helper in
#: operators/dedup_index (r7 review: four hand-synchronized sites
#: collapsed to one).
_PARA_WORDS = PARA_WORDS


@query(
    "ns_paragraph_dedup",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
                   FROM documents),
             p AS (SELECT doc_id,
                          md5(array_to_string(
                              list_slice(ws, g * {_PARA_WORDS} + 1,
                                         g * {_PARA_WORDS} + {_PARA_WORDS}),
                              ' ')) AS h
                   FROM w,
                        LATERAL unnest(generate_series(
                            0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                        )) t(g)),
             c AS (SELECT h, count(*) AS cnt FROM p GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_paras,
               CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               floor(CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        FROM p JOIN c USING (h)
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "dedup", "paragraph"),
)
def ns_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document paragraph-duplication stats: window each document
    into non-overlapping 10-word paragraphs, fingerprint them, and
    report (n_paras, n_dup, dup_frac) where a paragraph instance is a
    duplicate iff its exact text occurs ≥2 times corpus-wide — the
    RefinedWeb-style boilerplate signal a curation pass thresholds on
    ("drop docs that are mostly template") or feeds into span removal.

    Scale shape: paragraphs leave the scan stage as 128-bit digests
    only (never text); each instance learns its global frequency from
    an unordered window over the ONE digest exchange — sort-based and
    spillable, and a single derivation of the scan+split+md5 pipeline,
    where a groupBy-frequency + join-back would plan that pipeline
    twice because the two exchange payloads differ and ReuseExchange
    cannot fire (the exact trap operators/dedup.py documents and
    measured). The only other exchange is the per-doc final agg of
    (bigint, bigint). No driver state."""
    return paragraph_dedup_stats(t(spark, sf_dir, "documents"))


def paragraph_dedup_stats(d: DataFrame) -> DataFrame:
    """Operator body over an arbitrary (doc_id, text, …) frame — the
    registry query binds it to the ``documents`` table; unit tests
    drive it with planted frames (tests/test_pipeline8.py)."""
    p = _paragraph_instances(d).select("doc_id", "h")
    from pyspark.sql import Window

    cnt = F.count("*").over(Window.partitionBy("h"))
    dup = (cnt >= 2).cast("long")
    return (
        p.select("doc_id", dup.alias("dup"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum("dup").alias("n_dup"),
            (
                F.floor(
                    F.sum("dup").cast("double") / F.count("*") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("dup_frac"),
        )
    )


#: Composite instance key for the keep-first rule: doc_id·10⁹ + g is an
#: exact BIGINT on both engines (g < 10⁹ always — documents are far
#: smaller; at real scale with >9·10⁹ doc ids this becomes a struct
#: min, same semantics). min over it = lexicographic first occurrence.
_INST_KEY = _PINST_KEY


@query(
    "ns_paragraph_trim",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
                   FROM documents),
             p AS (SELECT doc_id, g,
                          md5(array_to_string(
                              list_slice(ws, g * {_PARA_WORDS} + 1,
                                         g * {_PARA_WORDS} + {_PARA_WORDS}),
                              ' ')) AS h
                   FROM w,
                        LATERAL unnest(generate_series(
                            0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                        )) t(g)),
             k AS (SELECT doc_id, h, min(g) AS g FROM p GROUP BY 1, 2)
        SELECT w.doc_id,
               CAST((len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} AS BIGINT)
                   AS n_paras,
               count(*) AS n_kept,
               string_agg(array_to_string(
                   list_slice(ws, g * {_PARA_WORDS} + 1,
                              g * {_PARA_WORDS} + {_PARA_WORDS}), ' '),
                   ' ' ORDER BY g) AS clean_text
        FROM k JOIN w USING (doc_id)
        GROUP BY 1, len(ws)
    """,
    tags=("northstar", "pipeline", "dedup", "paragraph"),
)
def ns_paragraph_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document paragraph trim: rewrite every document keeping
    each paragraph's first occurrence WITHIN THAT DOCUMENT — the
    within-page form of repeated-boilerplate removal (the C4/RefinedWeb
    line-dedup move applied per page: navigation blocks and repeated
    footers collapse without consulting any other document), the
    complement of the corpus-wide ns_paragraph_dedup_apply.

    Scale shape: strictly easier than the corpus-wide apply — the
    keep-first rule needs only a (doc_id, digest) hash agg, so
    paragraphs leave the scan as digests, the agg is map-side-combined,
    and the ONLY text movement is the one doc_id join-back that every
    apply form pays (the rewrite itself is the shared
    operators/dedup_index.paragraph_clean_expr, so this trim, the
    one-shot apply, and the incremental apply can never drift). No
    window at all: within a doc the digest group is tiny, min(g) in the
    agg replaces the global-frequency window the corpus form needs."""
    d = t(spark, sf_dir, "documents")
    first = (
        _paragraph_instances(d)
        .groupBy("doc_id", "h")
        .agg(F.min("g").alias("g"))
    )
    ks = first.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("g")).alias("ks"),
        F.count("*").alias("n_kept"),
    )
    return (
        d.join(ks, "doc_id")
        .select(
            "doc_id",
            F.expr(
                f"CAST((size(split(trim(text), ' +')) + {_PARA_WORDS - 1}) "
                f"DIV {_PARA_WORDS} AS BIGINT)"
            ).alias("n_paras"),
            "n_kept",
            "ks",
            "text",
        )
        .select(
            "doc_id",
            "n_paras",
            "n_kept",
            paragraph_clean_expr("text", _PARA_WORDS).alias("clean_text"),
        )
    )


#: The paragraph-apply CTE chain as a reusable oracle fragment ending
#: in ``cleaned(doc_id, n_kept, clean_text)`` — consumed by
#: ns_paragraph_dedup_apply (directly) and the training capstone
#: (as its screening stage). Text is byte-identical to the r7 oracle.
_PARA_APPLY_CTES = f"""
        w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
              FROM documents),
        p AS (SELECT doc_id, g,
                     md5(array_to_string(
                         list_slice(ws, g * {_PARA_WORDS} + 1,
                                    g * {_PARA_WORDS} + {_PARA_WORDS}),
                         ' ')) AS h
              FROM w,
                   LATERAL unnest(generate_series(
                       0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                   )) t(g)),
        k AS (SELECT h, min(doc_id * {_INST_KEY} + g) AS kk
              FROM p GROUP BY 1),
        kept AS (SELECT p.doc_id, p.g
                 FROM p JOIN k USING (h)
                 WHERE p.doc_id * {_INST_KEY} + p.g = kk),
        cleaned AS (SELECT w.doc_id,
                           count(*) AS n_kept,
                           string_agg(array_to_string(
                               list_slice(ws, g * {_PARA_WORDS} + 1,
                                          g * {_PARA_WORDS} + {_PARA_WORDS}),
                               ' '), ' ' ORDER BY g) AS clean_text
                    FROM kept JOIN w ON kept.doc_id = w.doc_id
                    GROUP BY 1)
"""


@query(
    "ns_paragraph_dedup_apply",
    oracle=f"""
        WITH {_PARA_APPLY_CTES}
        SELECT doc_id, n_kept, clean_text FROM cleaned
    """,
    tags=("northstar", "pipeline", "dedup", "paragraph"),
)
def ns_paragraph_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of paragraph dedup (Lee et al. / RefinedWeb
    convention): every duplicated paragraph keeps exactly its corpus-
    wide FIRST occurrence (min (doc_id, position) instance) and every
    later instance is removed; each document comes back as
    (doc_id, n_kept, clean_text) — the rewritten corpus. Documents
    whose every paragraph first occurred elsewhere vanish entirely
    (fully-boilerplate docs), which is the intended removal semantics.

    Scale shape: the keep/remove DECISION flows digests-only — instance
    rows are (doc_id, position, digest), and the first-occurrence key
    comes from an unordered min window over the single digest exchange
    (one derivation of the scan pipeline — see paragraph_dedup_stats
    for why a keeper-table join-back would plan it twice). Document
    TEXT is touched exactly once
    more: the per-doc kept-position arrays (ints, document-bounded)
    join back to ``documents`` on doc_id and the clean text is rebuilt
    MAP-SIDE from the source row by slicing — the corpus text crosses
    one doc_id exchange, which is the floor for an op whose output IS a
    rewritten corpus. First-occurrence choice uses the exact composite
    BIGINT key, so both engines keep identical instances."""
    return _paragraph_apply_frame(t(spark, sf_dir, "documents"))


def _paragraph_apply_frame(
    d: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Operator body of ns_paragraph_dedup_apply over an arbitrary
    (doc_id, text, …) frame — factored (r8) so the training capstone
    can run the screening stage over the same base scan its later
    stages derive from. ``passthrough`` carries extra source columns
    (e.g. ``source``) onto the cleaned output unchanged."""
    inst = _paragraph_instances(d)
    from pyspark.sql import Window

    # First-occurrence key via an unordered window over the ONE digest
    # exchange — single derivation of the scan+split+md5 pipeline (a
    # groupBy-min + join-back would plan it twice; see
    # paragraph_dedup_stats / operators/dedup.py for the measurement).
    ikey = F.col("doc_id") * _INST_KEY + F.col("g")
    kk = F.min(ikey).over(Window.partitionBy("h"))
    keptg = (
        inst.withColumn("_kk", kk)
        .filter(ikey == F.col("_kk"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("g")).alias("ks"),
            F.count("*").alias("n_kept"),
        )
    )
    clean = paragraph_clean_expr("text", _PARA_WORDS)
    return d.join(keptg, "doc_id").select(
        "doc_id", *passthrough, "n_kept", clean.alias("clean_text")
    )


#: Keep thresholds on the 32-bit md5-prefix grid (h ∈ [0, 2^32)):
#: head keeps everything, middle keeps h < 2^31 (rate 1/2), tail keeps
#: h < floor(2^32/10) (rate 1/10). Exact integer comparisons — no float
#: boundary to disagree across engines.
_CCNET_KEEP = {"head": 1 << 32, "middle": 1 << 31, "tail": (1 << 32) // 10}


@query(
    "ns_ccnet_sample",
    oracle=f"""
        WITH b AS ({_CCNET_ASSIGN_ORACLE}),
             k AS (SELECT lang, bucket,
                          CAST(concat('0x', substr(md5(concat('ccn',
                               CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS h
                   FROM b)
        SELECT lang, bucket, count(*) AS n_docs,
               CAST(sum(CASE
                   WHEN bucket = 'head' AND h < {_CCNET_KEEP['head']} THEN 1
                   WHEN bucket = 'middle' AND h < {_CCNET_KEEP['middle']} THEN 1
                   WHEN bucket = 'tail' AND h < {_CCNET_KEEP['tail']} THEN 1
                   ELSE 0 END) AS BIGINT) AS n_kept
        FROM k GROUP BY 1, 2
    """,
    tags=("northstar", "pipeline", "quality", "lm", "sampling"),
)
def ns_ccnet_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realize the CCNet cut over the production stratification: keep
    all of head, sample middle at 1/2 and tail at 1/10, reporting per
    (lang, bucket) volume and kept count. The keep decision is
    md5-derived per doc_id against exact integer thresholds on the
    32-bit prefix grid — reproducible across engines, retries, and
    partitionings (no ``rand()``), which is what lets the driver
    hash-gate a SAMPLING operator at all.

    Scale shape: ns_ccnet_buckets_scaled's assignment plan (histogram
    thresholds, no corpus-sized window) plus one map-side keep flag and
    a (lang, bucket) hash agg — the cut itself adds zero exchanges
    beyond the final 15-row aggregate. The doc-level kept SET is the
    same frame pre-aggregation (drop the groupBy to materialize it)."""
    b = _ccnet_scaled_assign(spark, sf_dir)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ccn"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
    )
    keep = (
        F.when((F.col("bucket") == "head") & (h < _CCNET_KEEP["head"]), 1)
        .when((F.col("bucket") == "middle") & (h < _CCNET_KEEP["middle"]), 1)
        .when((F.col("bucket") == "tail") & (h < _CCNET_KEEP["tail"]), 1)
        .otherwise(0)
        .cast("long")
    )
    return b.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"), F.sum(keep).alias("n_kept")
    )


#: Token budget for the epoch plan, in corpus-epochs: a training run of
#: B = 2× the corpus's total tokens (the knob a real run sets from its
#: compute budget; fixed here so the oracle is static SQL).
_EPOCH_BUDGET = 2.0


@query(
    "ns_epoch_plan",
    oracle=f"""
        WITH tokc AS (SELECT source,
                             len(string_split_regex(trim(text), ' +')) AS nt
                      FROM documents),
             s AS (SELECT source, count(*) AS n_docs,
                          CAST(sum(nt) AS BIGINT) AS a
                   FROM tokc GROUP BY 1),
             sh AS (SELECT source, n_docs, a,
                           CAST(a AS DOUBLE)
                               / CAST(sum(a) OVER () AS BIGINT) AS share,
                           CAST(sum(a) OVER () AS BIGINT) AS t
                    FROM s),
             w AS (SELECT source, n_docs, a, share, t,
                          CAST(floor(sqrt(share) * 1000000000.0 + 0.5)
                               AS BIGINT) AS w9
                   FROM sh),
             p AS (SELECT source, n_docs, a, share, t,
                          CAST(w9 AS DOUBLE)
                              / CAST(sum(w9) OVER () AS BIGINT) AS pt
                   FROM w)
        SELECT source, n_docs, a AS tokens,
               floor(share * 1000000.0 + 0.5) / 1000000.0 AS share,
               floor(pt * 1000000.0 + 0.5) / 1000000.0 AS p_target,
               floor(pt * {_EPOCH_BUDGET} * t / a * 1000000.0 + 0.5)
                   / 1000000.0 AS epochs
        FROM p
    """,
    tags=("northstar", "pipeline", "mixture", "sampling"),
)
def ns_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data recipe a training run actually consumes: per-source
    TOKEN-weighted epoch counts under a temperature-flattened mixture
    (τ = 0.5, Conneau & Lample 2019) and a fixed token budget
    (B = 2 corpus-epochs). ``epochs_s = p_s · B / available_s`` — a
    minority source comes out > B (repeat it), a dominant one < B
    (subsample it); ns_mixture_upsample / ns_stratified_sample realize
    the plan downstream. Closes the mixture loop: where
    ns_temperature_mixture reports relative sampling RATES over
    character mass, this emits absolute epoch counts over TOKENS — the
    unit budgets are set in.

    Determinism (the ns_temperature_mixture discipline): token counts
    cross rows as BIGINTs; τ = 0.5 uses IEEE-correctly-rounded sqrt;
    the weight normalization crosses rows as 1e-9-grid BIGINTs; the
    epoch expression evaluates left-associated on identical bits on
    both engines and lands half-up on the 1e-6 grid. All windows run
    over the ≤|sources|-row aggregate — the only corpus-sized work is
    one map-side token count feeding a hash agg."""
    from map_reduce_framework_using_python_spark.plans.core import half_up

    p = _epoch_plan_frame(spark, sf_dir)
    epochs = F.col("pt") * F.lit(_EPOCH_BUDGET) * F.col("t") / F.col("a")
    return p.select(
        "source",
        "n_docs",
        F.col("a").alias("tokens"),
        half_up(F.col("share"), 6).alias("share"),
        half_up(F.col("pt"), 6).alias("p_target"),
        half_up(epochs, 6).alias("epochs"),
    )


def _epoch_plan_frame(spark: SparkSession, sf_dir: str):
    """The τ=0.5 epoch plan over the full ``documents`` corpus — binds
    :func:`_epoch_plan_from_tok` to the registry tables."""
    d = t(spark, sf_dir, "documents")
    return _epoch_plan_from_tok(
        d.select("source", F.size(F.split(F.trim(F.col("text")), " +")).alias("nt"))
    )


def _epoch_plan_from_tok(tok: DataFrame):
    """The shared τ=0.5 epoch-plan expression chain — ONE copy (r7
    review: ns_epoch_realize used to duplicate it while claiming
    bit-for-bit equality; r8 lifted it to frame level for the training
    capstone, which plans over its CURATED token table):
    (source, n_docs, a, share, t, w9, pt), each column built exactly as
    documented in ns_epoch_plan. ``tok`` is one (source, nt, …) row per
    document."""
    from pyspark.sql import Window

    s = tok.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("nt").alias("a")
    )
    wall = Window.partitionBy()
    sh = s.select(
        "source",
        "n_docs",
        "a",
        (F.col("a").cast("double") / F.sum("a").over(wall)).alias("share"),
        F.sum("a").over(wall).alias("t"),
    )
    w = sh.withColumn(
        "w9", F.floor(F.sqrt(F.col("share")) * 1e9 + F.lit(0.5)).cast("bigint")
    )
    return w.withColumn("pt", F.col("w9").cast("double") / F.sum("w9").over(wall))


#: The epoch-plan CTE chain shared by the realize oracle: per-source
#: gridded epoch counts e6 = floor(epochs · 1e6 + 0.5) as BIGINT —
#: exactly the ns_epoch_plan 'epochs' column before the /1e6. Split
#: (r8) into the documents-bound tokc head and the tokc-generic TAIL so
#: the training capstone can run the same chain over its CURATED token
#: table.
_EPOCH_E6_TAIL = f"""
        s AS (SELECT source, CAST(sum(nt) AS BIGINT) AS a
              FROM tokc GROUP BY 1),
        sh AS (SELECT source, a,
                      CAST(a AS DOUBLE)
                          / CAST(sum(a) OVER () AS BIGINT) AS share,
                      CAST(sum(a) OVER () AS BIGINT) AS t
               FROM s),
        ew AS (SELECT source, a, share, t,
                     CAST(floor(sqrt(share) * 1000000000.0 + 0.5)
                          AS BIGINT) AS w9
              FROM sh),
        ep AS (SELECT source, a, t,
                     CAST(w9 AS DOUBLE)
                         / CAST(sum(w9) OVER () AS BIGINT) AS pt
              FROM ew),
        e AS (SELECT source,
                     CAST(floor(pt * {_EPOCH_BUDGET} * t / a
                                * 1000000.0 + 0.5) AS BIGINT) AS e6
              FROM ep)
"""

_EPOCH_E6_ORACLE = f"""
        tokc AS (SELECT doc_id, source,
                        len(string_split_regex(trim(text), ' +')) AS nt
                 FROM documents),
        {_EPOCH_E6_TAIL}
"""

#: 2^32 — the md5-prefix grid the remainder-selection hash lives on.
_H32 = 1 << 32


@query(
    "ns_epoch_realize",
    oracle=f"""
        WITH {_EPOCH_E6_ORACLE},
             docs AS (SELECT tokc.doc_id, tokc.source, tokc.nt,
                             CAST(concat('0x', substr(md5(concat('epo',
                                  CAST(tokc.doc_id AS VARCHAR))), 1, 8))
                                  AS BIGINT) AS h
                      FROM tokc),
             rep AS (SELECT d.doc_id, d.source, d.nt,
                            (e6 // 1000000)
                            + CASE WHEN d.h * 1000000
                                        < (e6 % 1000000) * {_H32}
                                   THEN 1 ELSE 0 END AS n_rep
                     FROM docs d JOIN e USING (source))
        SELECT doc_id, source,
               CAST(g AS BIGINT) AS replica,
               CAST(nt AS BIGINT) AS n_tokens
        FROM rep, LATERAL unnest(generate_series(0, n_rep - 1)) u(g)
        WHERE n_rep > 0
    """,
    tags=("northstar", "pipeline", "mixture", "sampling"),
)
def ns_epoch_realize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the ns_epoch_plan recipe as a training stream: each
    document of source s appears floor(e_s) times in full (replica
    0..floor-1) plus one md5-hash-selected extra copy realizing the
    fractional remainder (P[extra] = frac(e_s), no ``rand()`` — the
    ns_ccnet_sample reproducibility discipline), so per-source expected
    token mass equals the plan's e_s · available_s and the 2-corpus-
    epoch budget is spent where the τ=0.5 mixture says. This is the gap
    ns_mixture_upsample (integer weights only) left open: a plan that
    says "1.73 epochs of source A" now has an operator that emits
    exactly that stream — (doc_id, source, replica, n_tokens) rows a
    trainer shuffles and consumes.

    Determinism: the fractional remainder lives on the 1e-6 grid the
    plan already rounds to (e6 = floor(epochs·1e6 + 0.5) as BIGINT);
    the keep test ``h·10⁶ < (e6 mod 10⁶)·2³²`` is exact 64-bit integer
    arithmetic on both engines (h < 2³² ⇒ products < 2⁶³). Epoch floats
    match ns_epoch_plan's column bit-for-bit (same left-associated
    expression).

    Scale shape: the plan side is the ≤|sources|-row aggregate
    (broadcast); the realize pass is one map-side join + explode of a
    bounded sequence (⌈e_s⌉ ≤ budget/min-share — single digits in
    practice) — no shuffle beyond the plan aggregate, output streams
    straight to the sink. Replication happens at the PLAN level; rows
    are never driver-materialized."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source",
        F.size(F.split(F.trim(F.col("text")), " +")).alias("nt"),
    )
    plan = _epoch_plan_frame(spark, sf_dir)
    return _realize_stream(tok, _plan_e6(plan))


def _plan_e6(plan: DataFrame) -> DataFrame:
    """(source, e6) from an epoch-plan frame: the gridded BIGINT epoch
    count e6 = floor(epochs·1e6 + 0.5) the realize pass consumes —
    exactly the ns_epoch_plan 'epochs' column before the /1e6."""
    e6 = F.floor(
        F.col("pt") * F.lit(_EPOCH_BUDGET) * F.col("t") / F.col("a") * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return plan.select("source", e6.alias("e6"))


def _realize_stream(tok: DataFrame, plan_e6: DataFrame) -> DataFrame:
    """The realize pass of ns_epoch_realize over an arbitrary
    (doc_id, source, nt) token table and a (source, e6) plan — factored
    (r8) so the training capstone realizes its CURATED corpus with the
    identical hash-remainder selection and broadcast-plan shape."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("epo"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    n_rep = F.expr("e6 DIV 1000000") + F.when(
        h * F.lit(1_000_000) < (F.col("e6") % 1_000_000) * F.lit(_H32), 1
    ).otherwise(0)
    return (
        tok.join(F.broadcast(plan_e6), "source")
        .withColumn("n_rep", n_rep)
        .filter(F.col("n_rep") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_rep") - 1)).alias(
                "replica"
            ),
            F.col("nt").cast("bigint").alias("n_tokens"),
        )
    )


#: Batch/corpus split for the paragraph ingest screen (the
#: ns_incremental_dedup convention): every 16th doc arrives as the
#: ingest batch, the rest are the already-indexed corpus.
_PBATCH_MOD, _PBATCH_REM = 16, 7


def _ensure_paragraph_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the corpus paragraph-digest index under /tmp,
    guarded by a source fingerprint of documents.parquet — via the
    SHARED build-or-reuse machinery (sources.io.ensure_fingerprinted_layout:
    corrupt meta = stale rebuild, atomic fingerprint write, full-path
    cache tag), mirroring northstar._ensure_dedup_index; the r7 advice
    pass found this copy still hand-rolled all three rules (colliding
    basename tag, unguarded json.load, non-atomic meta rewrite)."""
    import os

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_paragraph_index,
    )
    from map_reduce_framework_using_python_spark.sources.io import (
        ensure_fingerprinted_layout,
        layout_cache_tag,
        source_fingerprint,
    )

    root = os.environ.get("SPARK_GRAFT_DEDUP_INDEX_ROOT", "/tmp/spark_graft_dedup")
    path = os.path.join(root, layout_cache_tag(sf_dir), f"para{_PARA_WORDS}")

    def build(p: str) -> None:
        corpus = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % _PBATCH_MOD != _PBATCH_REM
        )
        build_paragraph_index(corpus, p, para_words=_PARA_WORDS)

    return ensure_fingerprinted_layout(
        path,
        "_dedup_meta.json",
        source_fingerprint(os.path.join(sf_dir, "documents.parquet")),
        build,
    )


@query(
    "ns_paragraph_screen",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
                   FROM documents),
             p AS (SELECT doc_id,
                          md5(array_to_string(
                              list_slice(ws, g * {_PARA_WORDS} + 1,
                                         g * {_PARA_WORDS} + {_PARA_WORDS}),
                              ' ')) AS h
                   FROM w,
                        LATERAL unnest(generate_series(
                            0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                        )) t(g)),
             c AS (SELECT h, count(*) AS cnt FROM p GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_paras,
               CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               floor(CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        FROM p JOIN c USING (h)
        WHERE doc_id % {_PBATCH_MOD} = {_PBATCH_REM}
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "dedup", "paragraph", "index"),
)
def ns_paragraph_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-dedup stats for an ARRIVING batch (doc_id ≡ 7 mod 16)
    against the PERSISTED paragraph-digest index of the rest of the
    corpus — the ingest path for paragraph-level exact dedup: the
    corpus text is never re-digested; the probe scans only the
    fixed-width instance table, semi-pruned map-side by the broadcast
    batch digest set, plus one batch-sized window for within-batch
    counts. The verdict is EXACTLY the one-shot
    ns_paragraph_dedup(corpus ∪ batch) restricted to batch docs —
    (count_index ≥ 1) OR (count_batch ≥ 2) ⇔ total ≥ 2 — which is what
    the oracle states directly (same CTEs as ns_paragraph_dedup, batch
    filter before the per-doc GROUP BY)."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_stats,
    )

    d = t(spark, sf_dir, "documents")
    path = _ensure_paragraph_index(spark, sf_dir)
    return incremental_paragraph_stats(
        spark, d.filter(F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM), path
    )


#: Shared oracle for the batch and streaming retraction screens: the
#: ns_paragraph_screen verdict over ((corpus minus retracted) ∪ batch)
#: where the retracted set is the EVEN-id corpus dup-partners of the
#: batch — content-derived, and measured to flip SOME verdicts while
#: keeping others at both test SFs (a vacuous retraction set would
#: gate nothing).
_PRETRACT_ORACLE = f"""
        WITH w0 AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
                    FROM documents),
             p0 AS (SELECT doc_id,
                           md5(array_to_string(
                               list_slice(ws, g * {_PARA_WORDS} + 1,
                                          g * {_PARA_WORDS} + {_PARA_WORDS}),
                               ' ')) AS h
                    FROM w0,
                         LATERAL unnest(generate_series(
                             0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                         )) t(g)),
             bh AS (SELECT DISTINCT h FROM p0
                    WHERE doc_id % {_PBATCH_MOD} = {_PBATCH_REM}),
             rx AS (SELECT DISTINCT p0.doc_id FROM p0 JOIN bh USING (h)
                    WHERE p0.doc_id % {_PBATCH_MOD} <> {_PBATCH_REM}
                      AND p0.doc_id % 2 = 0),
             p AS (SELECT * FROM p0
                   WHERE doc_id % {_PBATCH_MOD} = {_PBATCH_REM}
                      OR doc_id NOT IN (SELECT doc_id FROM rx)),
             c AS (SELECT h, count(*) AS cnt FROM p GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_paras,
               CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               floor(CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        FROM p JOIN c USING (h)
        WHERE doc_id % {_PBATCH_MOD} = {_PBATCH_REM}
        GROUP BY 1
    """


@query(
    "ns_paragraph_retract_screen",
    oracle=_PRETRACT_ORACLE,
    tags=("northstar", "pipeline", "dedup", "paragraph", "index"),
)
def ns_paragraph_retract_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ns_paragraph_screen verdict AFTER a takedown: the cached
    paragraph index is copied to a scratch dir (the cache stays
    pristine), every EVEN-id corpus doc that shares a paragraph digest
    with the batch — i.e. actual dup-partners of arriving docs, the
    content-derived takedown set — is RETRACTED
    (operators/dedup_index.retract_docs_from_index: an O(|retracted|)
    tombstone log, no data rewrite), and the usual batch (≡ 7 mod 16)
    screens against the survivors. Retracting only the even-id half
    leaves a MIX of flipped and surviving duplicate verdicts (both
    measured non-empty at sf0.001 and sf0.01), so the hash gate
    exercises partial-takedown re-settling, not just all-zeros. The
    probe's tombstone anti-join must make the verdict EXACTLY the
    one-shot stats over ((corpus minus retracted) ∪ batch) restricted
    to batch docs — which is what the oracle states. Physical purge at
    compaction and retract==never-indexed equality are pinned in
    tests/test_dedup_retract.py."""
    import os
    import shutil

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_stats,
        retract_docs_from_index,
    )
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )

    d = t(spark, sf_dir, "documents")
    src = _ensure_paragraph_index(spark, sf_dir)
    work = os.path.join(_scratch_dir("ns_para_retract_"), "para")
    shutil.copytree(src, work)
    retract_docs_from_index(_retract_partner_ids(d), work)
    return incremental_paragraph_stats(
        spark, d.filter(F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM), work
    )


def _retract_partner_ids(d: DataFrame) -> DataFrame:
    """The takedown set of the retraction screens: every EVEN-id corpus
    doc sharing a paragraph digest with the batch (≡ 7 mod 16) — the
    ``rx`` CTE of :data:`_PRETRACT_ORACLE` in DataFrame form."""
    inst = _paragraph_instances(d)
    bh = (
        inst.filter(F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM)
        .select("h")
        .distinct()
    )
    return (
        inst.join(bh, "h")
        .filter(
            (F.col("doc_id") % _PBATCH_MOD != _PBATCH_REM)
            & (F.col("doc_id") % 2 == 0)
        )
        .select("doc_id")
        .distinct()
    )


@query(
    "st_paragraph_retract",
    oracle=_PRETRACT_ORACLE,
    tags=("streaming", "pipeline", "dedup", "paragraph", "index"),
)
def st_paragraph_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ns_paragraph_retract_screen — the takedown
    QUEUE: deletion requests arrive as a stream (the document stream
    stream-static-joined to the content-derived partner set), each
    micro-batch is retracted from the scratch-copied paragraph index
    via foreachBatch (streaming/ingest.retract_stream — an
    O(|batch ids|) tombstone append per batch, idempotent under
    at-least-once replay), and the post-drain screen of the usual
    batch must equal the one-shot bulk retraction — SAME full DuckDB
    oracle as the batch form, because the union of per-batch tombstone
    logs is exactly the one-shot tombstone set. Multi-batch drains and
    replay idempotence are pinned in tests/test_dedup_retract.py."""
    import os
    import shutil

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_stats,
    )
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
        retract_stream,
    )

    d = t(spark, sf_dir, "documents")
    base = _scratch_dir("st_para_retract_")
    work = os.path.join(base, "para")
    shutil.copytree(_ensure_paragraph_index(spark, sf_dir), work)
    ids_stream = (
        read_documents_stream(spark, sf_dir)
        .select("doc_id")
        .join(F.broadcast(_retract_partner_ids(d)), "doc_id")
    )
    retract_stream(ids_stream, work, os.path.join(base, "ckpt"))
    return incremental_paragraph_stats(
        spark, d.filter(F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM), work
    )


@query(
    "st_paragraph_dedup",
    oracle=None,
    tags=("streaming", "pipeline", "dedup", "paragraph", "index", "rows_only"),
)
def st_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ns_paragraph_screen: the batch docs arrive as
    a file-source stream and each micro-batch is screened against the
    paragraph-digest index via foreachBatch, then appended to it
    (extend_index), so later batches dedup against earlier ones as
    well as the corpus. Rows-only for the driver (the drained single-
    batch result equals ns_paragraph_screen, and the multi-batch
    first-occurrence semantics are pinned in
    tests/test_paragraph_ingest.py). The index is rebuilt in a scratch
    dir per run — extend_index appends must not poison the shared
    fingerprint-cached layout."""
    import os
    import tempfile

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_paragraph_index,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        paragraph_screen_stream,
        read_documents_stream,
    )

    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="st_para_dedup_")
    path = os.path.join(work, "idx")
    build_paragraph_index(
        d.filter(F.col("doc_id") % _PBATCH_MOD != _PBATCH_REM), path,
        para_words=_PARA_WORDS,
    )
    out = paragraph_screen_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM
        ),
        path,
        out_dir=os.path.join(work, "stats"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        extend_index=True,
    )
    return out


@query(
    "ns_paragraph_screen_apply",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
                   FROM documents),
             p AS (SELECT doc_id, g,
                          md5(array_to_string(
                              list_slice(ws, g * {_PARA_WORDS} + 1,
                                         g * {_PARA_WORDS} + {_PARA_WORDS}),
                              ' ')) AS h
                   FROM w,
                        LATERAL unnest(generate_series(
                            0, (len(ws) + {_PARA_WORDS - 1}) // {_PARA_WORDS} - 1
                        )) t(g)),
             k AS (SELECT h, min(doc_id * {_INST_KEY} + g) AS kk
                   FROM p GROUP BY 1),
             kept AS (SELECT p.doc_id, p.g
                      FROM p JOIN k USING (h)
                      WHERE p.doc_id * {_INST_KEY} + p.g = kk)
        SELECT w.doc_id,
               count(*) AS n_kept,
               string_agg(array_to_string(
                   list_slice(ws, g * {_PARA_WORDS} + 1,
                              g * {_PARA_WORDS} + {_PARA_WORDS}), ' '),
                   ' ' ORDER BY g) AS clean_text
        FROM kept JOIN w ON kept.doc_id = w.doc_id
        WHERE w.doc_id % {_PBATCH_MOD} = {_PBATCH_REM}
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "dedup", "paragraph", "index"),
)
def ns_paragraph_screen_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step on ingest: rewrite the arriving batch (doc_id ≡ 7
    mod 16) keeping only corpus-wide FIRST occurrences, against the
    persisted paragraph-digest index of the rest of the corpus — the
    one-shot ns_paragraph_dedup_apply verdict restricted to batch docs
    (which is the oracle, verbatim, with the batch filter), computed
    without re-digesting the corpus: the index scan is semi-pruned
    map-side by the broadcast batch digest set and reduced to one
    min-key row per matched digest."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_apply,
    )

    d = t(spark, sf_dir, "documents")
    path = _ensure_paragraph_index(spark, sf_dir)
    return incremental_paragraph_apply(
        spark, d.filter(F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM), path
    )


#: Shard token budget for the packing realization — sized so the
#: sf0.01 oracle run yields O(10–100) shards.
_SHARD_TOKENS = 10_000


#: Realize + pack CTE chain over a ``tokc``/``e`` pair already in
#: scope, ending in ``c`` (the running token sum) — shared by
#: ns_epoch_shards and the training capstone (r8). Text byte-identical
#: to the r7 shards oracle.
_REALIZE_SHARD_CTES = f"""
        docs AS (SELECT tokc.doc_id, tokc.source, tokc.nt,
                        CAST(concat('0x', substr(md5(concat('epo',
                             CAST(tokc.doc_id AS VARCHAR))), 1, 8))
                             AS BIGINT) AS h
                 FROM tokc),
        rep AS (SELECT d.doc_id, d.source, d.nt,
                       (e6 // 1000000)
                       + CASE WHEN d.h * 1000000
                                   < (e6 % 1000000) * {_H32}
                              THEN 1 ELSE 0 END AS n_rep
                FROM docs d JOIN e USING (source)),
        r AS (SELECT doc_id, nt, CAST(g AS BIGINT) AS replica
              FROM rep, LATERAL unnest(generate_series(0, n_rep - 1)) u(g)
              WHERE n_rep > 0),
        o AS (SELECT doc_id, replica, nt,
                     md5(concat('shrd', CAST(doc_id AS VARCHAR), ':',
                                CAST(replica AS VARCHAR))) AS hk
              FROM r),
        c AS (SELECT doc_id, replica, nt,
                     sum(nt) OVER (ORDER BY hk, doc_id, replica
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
              FROM o)
"""

_SHARDS_SELECT = f"""
        SELECT doc_id, replica,
               CAST(nt AS BIGINT) AS n_tokens,
               CAST((cum - nt) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
        FROM c
"""


@query(
    "ns_epoch_shards",
    oracle=f"""
        WITH {_EPOCH_E6_ORACLE},
             {_REALIZE_SHARD_CTES}
        {_SHARDS_SELECT}
    """,
    tags=("northstar", "pipeline", "mixture", "sampling"),
)
def ns_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the REALIZED epoch stream (ns_epoch_realize) into fixed
    token-budget training shards: copies are laid out in the seeded
    deterministic shuffle order (md5 over (doc_id, replica) — the
    ns_seeded_shuffle discipline, so every engine/retry packs the same
    shards), the global running token sum assigns each copy to
    ``shard_id = exclusive_prefix DIV {_SHARD_TOKENS}`` (a copy
    straddling a boundary belongs to the shard it starts in), and the
    output is the shard manifest a trainer's data loader reads.

    Scale shape: the global running sum is
    operators/ranks.bucketed_cumsum — per-bucket windows over the md5
    prefix's 256 order-consistent, perfectly balanced buckets plus a
    broadcast prefix-sum over bucket totals; NO single-partition
    window anywhere. Composed on top of the realize plan's broadcast
    join + map-side explode, the whole pipeline is one corpus scan for
    the plan aggregate and one for the stream."""
    return _pack_shards(ns_epoch_realize(spark, sf_dir))


def _pack_shards(realized: DataFrame) -> DataFrame:
    """The packing pass of ns_epoch_shards over an arbitrary realized
    (doc_id, …, replica, n_tokens) stream — factored (r8) so the
    training capstone packs its curated realize output with the
    identical seeded layout order and bucketed global cumsum."""
    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_cumsum,
    )

    key = F.md5(
        F.concat(
            F.lit("shrd"),
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("replica").cast("string"),
        )
    )
    cum = bucketed_cumsum(
        realized.withColumn("_key", key),
        bucket=F.substring(F.col("_key"), 1, 2),
        order_by=[F.col("_key"), F.col("doc_id"), F.col("replica")],
        weight=F.col("n_tokens"),
        cum_col="_cum",
    )
    return cum.select(
        "doc_id",
        "replica",
        "n_tokens",
        F.expr(f"CAST((_cum - n_tokens) DIV {_SHARD_TOKENS} AS BIGINT)").alias(
            "shard_id"
        ),
    )


@query(
    "st_paragraph_apply",
    oracle=None,
    tags=("streaming", "pipeline", "dedup", "paragraph", "index", "rows_only"),
)
def st_paragraph_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ns_paragraph_screen_apply: the batch docs
    arrive as a file-source stream and each micro-batch is REWRITTEN
    against the paragraph-digest index (first-occurrence-wins), then
    appended to it, so later batches lose paragraphs first seen in
    earlier ones. Rows-only (single-batch drained result equals
    ns_paragraph_screen_apply; the multi-batch fold is pinned in
    tests/test_paragraph_ingest.py)."""
    import os
    import tempfile

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_paragraph_index,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        paragraph_apply_stream,
        read_documents_stream,
    )

    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="st_para_apply_")
    path = os.path.join(work, "idx")
    build_paragraph_index(
        d.filter(F.col("doc_id") % _PBATCH_MOD != _PBATCH_REM), path,
        para_words=_PARA_WORDS,
    )
    return paragraph_apply_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _PBATCH_MOD == _PBATCH_REM
        ),
        path,
        out_dir=os.path.join(work, "clean"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        extend_index=True,
    )


@query(
    "ns_training_capstone",
    oracle=f"""
        WITH {_PARA_APPLY_CTES},
             b AS ({_CCNET_ASSIGN_ORACLE}),
             ccnk AS (SELECT doc_id FROM (
                          SELECT b.doc_id, b.bucket,
                                 CAST(concat('0x', substr(md5(concat('ccn',
                                      CAST(b.doc_id AS VARCHAR))), 1, 8))
                                      AS BIGINT) AS h
                          FROM b)
                      WHERE (bucket = 'head' AND h < {_CCNET_KEEP['head']})
                         OR (bucket = 'middle' AND h < {_CCNET_KEEP['middle']})
                         OR (bucket = 'tail' AND h < {_CCNET_KEEP['tail']})),
             tokc AS (SELECT c.doc_id, d.source,
                             len(string_split_regex(trim(c.clean_text), ' +'))
                                 AS nt
                      FROM cleaned c
                      JOIN ccnk USING (doc_id)
                      JOIN documents d USING (doc_id)),
             {_EPOCH_E6_TAIL},
             {_REALIZE_SHARD_CTES}
        {_SHARDS_SELECT}
    """,
    tags=("northstar", "pipeline", "capstone", "dedup", "quality",
          "mixture", "sampling"),
)
def ns_training_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline in ONE declarative plan (r8:
    VERDICT item 8): paragraph-dedup APPLY (rewrite every doc keeping
    each paragraph's corpus-wide first occurrence; fully-boilerplate
    docs vanish) → CCNet stratified CUT (keep head, sample middle 1/2 /
    tail 1/10, md5-derived — over the histogram-threshold assignment)
    → τ=0.5 epoch PLAN + REALIZE over the CURATED token counts (the
    mixture is planned on what survives curation, not the raw corpus)
    → seeded-shuffle SHARD PACKING — emitting the shard manifest
    (doc_id, replica, n_tokens, shard_id) a trainer's loader reads.
    Every stage is individually oracle-gated elsewhere
    (ns_paragraph_dedup_apply, ns_ccnet_sample, ns_epoch_realize,
    ns_epoch_shards); this query proves they COMPOSE — the oracle is
    assembled from the same shared CTE fragments the stage oracles use.

    Scale shape — the composition claim (plan-shape pinned in
    tests/test_pipeline8.py): the corpus text is scanned by the
    screening stage (paragraph digests + the doc_id join-back that
    rebuilds clean text) and the scoring stage (bigram LM + lang
    lookup) ONLY. The mixture, realize, and packing stages ride the
    narrow curated token table — persisted (lazily) because two plans
    consume it: the ≤|sources|-row epoch aggregate and the realize
    join (the r7 persist discipline; ContextCleaner reclaims it) — and
    add ZERO additional corpus scans: the realize is a broadcast-plan
    map-side explode and the packing is the bucketed cumsum, exactly
    the standalone stages' shapes."""
    # Two consumers (epoch aggregate + realize join) — without the
    # persist Catalyst derives the whole screen+cut pipeline twice.
    tokc = persist_lane("capstone_tokc", sf_dir, _capstone_tokc(spark, sf_dir))
    return _pack_shards(_realize_stream(tokc, _plan_e6(_epoch_plan_from_tok(tokc))))


def _capstone_tokc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone's CURATED token table (doc_id, source, nt): the
    paragraph-apply screen composed with the CCNet stratified cut.
    Factored so the plan-shape pin can count this subtree's corpus
    scans in isolation (tests/test_pipeline8.py)."""
    d = t(spark, sf_dir, "documents")
    clean = _paragraph_apply_frame(d, passthrough=("source",))
    b = _ccnet_scaled_assign(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ccn"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    keep = (
        ((F.col("bucket") == "head") & (h < _CCNET_KEEP["head"]))
        | ((F.col("bucket") == "middle") & (h < _CCNET_KEEP["middle"]))
        | ((F.col("bucket") == "tail") & (h < _CCNET_KEEP["tail"]))
    )
    kept_ids = b.filter(keep).select("doc_id")
    return clean.join(kept_ids, "doc_id").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("clean_text")), " +")).alias("nt"),
    )
