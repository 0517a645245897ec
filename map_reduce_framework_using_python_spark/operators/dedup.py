"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference's only dedup-shaped capability is the DISTINCT MR pattern
(emit ``(row, Ø)``, reducer prints each key once — SURVEY.md §2.B);
near-duplicate detection is a pure north-star extension. All operators
are JVM-side expression compositions (split/transform/xxhash64/bitwise)
— no Python UDFs — so they stay inside whole-stage codegen.

Scale design (100 TB corpora):

- exact: shuffle on a 128-bit digest, never on raw document bytes.
- all-pairs shingle join (:func:`ngram_jaccard_pairs`) is the *oracle*,
  quadratic in bucket size — correct at test scale, not the scale path.
- :func:`minhash_lsh_pairs` is the scale path: fixed-width signatures
  (num_hashes × 8 bytes/doc), band-bucket join so only probable pairs
  are generated, then exact verification on the candidates only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup via hash-groupBy (md5 fingerprint).

    Keeps the min-id witness per fingerprint — deterministic, unlike
    ``dropDuplicates`` which keeps an arbitrary row per key.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM higher-order
    fns: split → sequence → slice → concat_ws). Empty array when the
    document has fewer than ``n`` tokens."""
    # Backtick-quote the identifier (embedded backticks double) so names
    # needing quoting resolve instead of breaking the generated SQL —
    # the clustering.assign_clusters convention (r7 dedup review).
    quoted = "`" + text_col.replace("`", "``") + "`"
    toks = f"split({quoted}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n})))) "
        f"ELSE array() END"
    )


def shingle_jaccard(sh_a: str, sh_b: str) -> Column:
    """Exact Jaccard of two shingle-array columns — the ONE definition
    of the verification expression shared by the one-shot operator and
    the persisted-index probe (their equivalence contract requires both
    sides to verify identically; r7 dedup review collapsed the copies)."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return inter / union


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work. A small
    parquet file scans as ONE partition, serializing all shingling/
    hashing on one core (measured 2.9 s single-task at sf0.1); the
    repartition shuffle of the raw rows is trivial by comparison.

    Gated on the master: at cluster scale inputs arrive well-partitioned
    (files ≫ cores), so this must not cost anything there — it only
    runs under local masters (or when forced via
    ``SPARK_GRAFT_SPREAD=force|off``).

    Job-free by construction: the need-to-spread signal is the SOURCE
    FILE COUNT (``df.inputFiles()`` — driver-side listing of the plan's
    file index, no Spark job), never ``df.rdd.getNumPartitions()``,
    whose physical-planning probe would violate the "building a plan
    launches no job" contract on every local plan build. Fewer files
    than cores ⇒ the scan cannot parallelize CPU-heavy per-row work ⇒
    repartition. Non-file sources (in-memory test frames) report zero
    input files and spread too — correct, since a parallelized local
    relation is at worst a trivial extra exchange."""
    import os

    mode = os.environ.get("SPARK_GRAFT_SPREAD", "auto")
    if mode == "off":
        return df
    sc = df.sparkSession.sparkContext
    if mode != "force" and not sc.master.startswith("local"):
        return df
    target = sc.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def _shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return _spread(df).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs above ``threshold``.

    Shingle-inverted-index self-join: docs sharing no shingle never
    meet (MR equivalent: shuffle on shingle + reducer pairing, then a
    second job to aggregate pair counts).
    """
    sh = _shingle_table(df, text_col, id_col, n)
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


#: Hash flavors for the MinHash/LSH lane. ``xxhash64`` (default) is the
#: fast JVM path; ``md5`` derives 48-bit integers from md5 hex — slower
#: per hash, but CROSS-ENGINE REPRODUCIBLE (DuckDB computes the
#: identical value as ``CAST('0x' || substr(md5(s), 1, 12) AS
#: BIGINT)``), which is what lets a full MinHash-LSH pipeline carry a
#: DuckDB oracle (ns_minhash_lsh_pairs_md5, r14) where the xxhash64
#: form can only be recall-pinned. 48 bits (not 64) so the value fits
#: a signed BIGINT on both engines with no sign/overflow edge.
def _seeded_hash(seed: int, flavor: str, col: str = "shingle") -> str:
    if flavor == "xxhash64":
        return f"xxhash64({seed}, {col})"
    if flavor == "md5":
        return (
            f"CAST(conv(substring(md5(concat('{seed}:', {col})), 1, 12),"
            " 16, 10) AS BIGINT)"
        )
    raise ValueError(f"unknown minhash flavor: {flavor!r}")


def _band_key(cols: str, flavor: str) -> str:
    if flavor == "xxhash64":
        return f"xxhash64({cols})"
    if flavor == "md5":
        casted = ", ".join(
            f"CAST({c.strip()} AS STRING)" for c in cols.split(",")
        )
        return (
            f"CAST(conv(substring(md5(concat_ws(',', {casted})), 1, 12),"
            " 16, 10) AS BIGINT)"
        )
    raise ValueError(f"unknown minhash flavor: {flavor!r}")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    flavor: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: ``num_hashes`` seeded xxhash64
    permutations over the shingle set, min per permutation.

    One row per doc, fixed width — the sketch that makes 100 TB dedup
    linear instead of quadratic. Shape: explode shingles → 64 partial
    mins (map-side combined) → final mins. (A per-row ``array_min ∘
    transform`` fold would avoid the shuffle entirely, but Catalyst's
    CollapseProject inlines the shingle expression into each of the 64
    transforms, recomputing it 64× — measured slower.)
    """
    sh = _shingle_table(df, text_col, id_col, n)
    # ONE generated-SQL struct-of-aggregates (a single server parse) —
    # 64 per-column Column/expr calls cost ~0.25 s of driver-side
    # plan-build per call in py4j round trips alone (the
    # similarity._bucket_expr lesson); the struct is expanded right
    # after the agg, so the plan gains only a Project. The int seed
    # literal parses to the IntegerType F.lit(i) carried before, so the
    # hashes are bit-identical (pinned by every LSH recall test).
    cols = ", ".join(
        f"min({_seeded_hash(i, flavor)}) AS h{i}" for i in range(num_hashes)
    )
    return (
        sh.groupBy(id_col)
        .agg(F.expr(f"struct({cols})").alias("_s"))
        .select(id_col, "_s.*")
    )


def band_table(
    sig: DataFrame, id_col: str = "doc_id", num_hashes: int = 64,
    bands: int = 16, flavor: str = "xxhash64",
) -> DataFrame:
    """LSH band-bucket table ``(id, band, key)`` from a signature frame:
    the ``num_hashes`` mins split into ``bands`` bands of r rows each,
    band key = xxhash64 of the band's slice. Docs agreeing on any band
    land in the same (band, key) bucket — the collision structure both
    the one-shot pair generator (:func:`minhash_lsh_pairs`) and the
    persisted incremental index (:mod:`.dedup_index`) are built on.
    Shared so index build and batch probe hash IDENTICALLY forever."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    # One generated-SQL explode(array(named_struct(...))) — same plan
    # and values as the Column-built form, ~10× cheaper to BUILD (the
    # minhash_signatures note above).
    items = []
    for b in range(bands):
        cols = ", ".join(f"h{i}" for i in range(b * r, (b + 1) * r))
        items.append(
            f"named_struct('band', {b}, 'key', {_band_key(cols, flavor)})"
        )
    return sig.select(
        F.col(id_col),
        F.expr("explode(array(" + ",".join(items) + "))").alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    max_bucket: int = 1024,
    anchor_k: int = 3,
    flavor: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-verified.

    1. signatures (num_hashes mins over seeded xxhash64);
    2. split into ``bands`` bands of r = num_hashes/bands rows; band key
       = xxhash64 of the band's slice → docs agreeing on any band meet
       in a bucket (prob ≈ 1-(1-j^r)^bands for true Jaccard j);
    3. bucket self-join → candidate pairs (the only quadratic step, and
       only within buckets, and only for buckets of ≤ ``max_bucket``
       docs — see below);
    4. exact Jaccard verification on candidates via collect_set arrays —
       output is a subset of :func:`ngram_jaccard_pairs` with identical
       schema (recall pinned by pytest).

    **Hot-bucket bound (the 100 TB failure mode).** On boilerplate-heavy
    web corpora a single (band, key) bucket can hold MILLIONS of
    near-identical documents; all-pairs within it is O(|bucket|²)
    output and an unbounded per-task id list. Any bucket that hot is a
    duplicate CLUSTER by construction (its members agree on a whole
    signature band), so buckets over ``max_bucket`` short-circuit to a
    STAR: each member pairs with the bucket's min-id anchor only —
    O(|bucket|) candidates that still exact-verify and still connect
    the whole cluster for downstream ``ns_dup_clusters``/keep-best
    (connected components only need a spanning set, not every edge).
    Direct pairs between two non-anchor members of an oversize bucket
    are emitted only if they also meet in a ≤``max_bucket`` bucket —
    the documented recall trade for boundedness; at the default cap
    this affects only buckets that are overwhelmingly true-duplicate
    clusters. Note the star routes the bucket's connectivity through
    the anchor: a member whose exact-Jaccard against the anchor falls
    below ``threshold`` (possible when small r lets low-similarity
    colliders share a hot bucket) loses all of this bucket's pairs even
    if it has true near-duplicates among the other members.
    ``anchor_k`` > 1 blunts that cliff: star edges are emitted from the
    K min-id anchors instead of one — still O(K·|bucket|) candidates,
    and a single non-duplicate anchor can no longer sever the cluster
    (any of the K verifying connects the member). The default is 3,
    set from a planted-collider measurement (r8): with a
    signature-equal low-Jaccard doc as the bucket's min id, ``k=1``
    severed a 20-doc duplicate cluster COMPLETELY (0/190 true pairs)
    while ``k=3`` restored full connectivity
    (tests/test_dedup.py::test_anchor_star_collider_severs_at_k1_and_k3_rescues);
    the 3× candidate cost applies only inside oversize buckets. Pass 1
    for the minimal spanning star. Per-bucket stats (size + anchor) come from an unordered
    window over the single bucket-key exchange — sort-based and
    spillable, never ``collect_list`` — so no task ever materializes an
    oversize bucket in memory; the id lists that ARE collected are
    capped at ``max_bucket`` elements.
    """
    from pyspark.sql import Window

    buckets = band_table(
        minhash_signatures(df, text_col, id_col, n, num_hashes, flavor),
        id_col, num_hashes, bands, flavor,
    )
    # Per-bucket size + min-id anchor via an unordered window over the
    # ONE (band, key) exchange — sort-based and spillable, so even a
    # multi-million-row hot bucket never has to fit in task memory the
    # way a collect_list would. Both candidate branches below hang off
    # this same exchange subtree (identical by construction → Spark's
    # ReuseExchange materializes the signature pipeline once), and the
    # small-bucket groupBy's distribution requirement is already
    # satisfied by the window's partitioning, so no second bucket-key
    # shuffle exists anywhere. (A groupBy-stats + join-back variant was
    # measured to plan the scan+shingle+signature pipeline 3× because
    # the two exchange shapes differ and reuse cannot fire.)
    wb = Window.partitionBy("band", "key")
    sized = buckets.select(
        F.col(id_col),
        F.col("band"),
        F.col("key"),
        F.count("*").over(wb).alias("_bsize"),
        F.min(id_col).over(wb).alias("_anchor"),
    )
    # Small buckets: pair generation via groupBy + double explode — one
    # exchange on the bucket key instead of a two-sided self-join
    # (which would shuffle the bucket table twice). Quadratic only
    # within a bucket, and the collected list is ≤ max_bucket ids.
    cand_small = (
        sized.filter((F.col("_bsize") > 1) & (F.col("_bsize") <= max_bucket))
        .groupBy("band", "key")
        .agg(F.collect_list(id_col).alias("ids"))
        .select(F.explode("ids").alias("doc_a"), F.col("ids"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    # Oversize buckets: star edges to the min-id anchor, O(|bucket|).
    if anchor_k <= 1:
        cand_big = (
            sized.filter((F.col("_bsize") > max_bucket) & (F.col(id_col) != F.col("_anchor")))
            .select(F.col("_anchor").alias("doc_a"), F.col(id_col).alias("doc_b"))
        )
    else:
        # K-anchor star: edges from the K min-id members (row_number
        # over the SAME bucket-key partitioning — no new exchange) to
        # every member, O(K·|bucket|). The anchors side is K rows per
        # oversize bucket; the join is co-partitioned on (band, key)
        # with the member side (AQE broadcasts it when the oversize
        # bucket count is small, the common case).
        wbo = Window.partitionBy("band", "key").orderBy(F.col(id_col))
        big = sized.filter(F.col("_bsize") > max_bucket)
        anchors = (
            big.withColumn("_rn", F.row_number().over(wbo))
            .filter(F.col("_rn") <= anchor_k)
            .select("band", "key", F.col(id_col).alias("doc_a"))
        )
        cand_big = (
            big.select("band", "key", F.col(id_col).alias("doc_b"))
            .join(anchors, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
    cand = cand_small.union(cand_big).distinct()
    # Exact verification on the (small) candidate set. The expensive
    # shingle expression re-runs ONLY for docs that appear in a
    # candidate pair: a semi-join prunes the text scan first (AQE
    # broadcasts the id set when it is small — the common case at real
    # scale, where candidates ≪ corpus; the same pruning shape as the
    # incremental index probe in dedup_index.py). The candidate table
    # feeds both the id set and the verification join, so it is
    # persisted (lazily — plan builds stay job-free; the ContextCleaner
    # reclaims it once the result is dereferenced): without this the
    # whole signature+banding pipeline would execute twice.
    cand = cand.persist()
    cand_ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets = (
        _spread(df)
        .join(cand_ids, id_col, "semi")
        .select(F.col(id_col), word_shingles(text_col, n).alias("sh_set"))
    )
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    jac = shingle_jaccard("sh_a", "sh_b")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit ±1 vote sum over
    xxhash64(token) of every token occurrence."""
    tok = _spread(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sig = tok.groupBy(id_col).agg(*votes)
    fp = reduce(
        Column.bitwiseOR,
        [
            F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
            for j in range(64)
        ],
    )
    return sig.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: with 4 16-bit chunks, any pair within Hamming
    distance 3 agrees on ≥1 chunk, so the join on (chunk_idx, chunk_val)
    finds all of them without an all-pairs scan. That completeness bound
    is ``chunks - 1 = 3``: at distance 4 a pair can differ by one bit in
    EVERY chunk and never meet, so larger radii are rejected rather than
    silently losing recall (r7 dedup review).
    """
    if max_hamming > 3:
        raise ValueError(
            f"simhash_pairs: max_hamming={max_hamming} exceeds the 4-chunk "
            "pigeonhole completeness bound (3); results would silently "
            "miss pairs differing by one bit per chunk"
        )
    fps = simhash_fingerprints(df, text_col, id_col)
    chunks = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("idx"),
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", F.col("ck.idx").alias("idx"), F.col("ck.val").alias("val"))
    # Persisted lazily: both sides of the self-join read this table, and
    # without the persist the 64-vote fingerprint aggregation runs twice
    # (4 rows × 24 B per doc — linear, spills if ever needed).
    chunks = chunks.persist()
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
