"""Deterministic sampling / split operators over ``documents``.

Training-data pipelines need REPRODUCIBLE membership decisions — which
doc lands in train/val/test, which rows survive a downsample, how much
of each source enters the corpus mix. RNG-backed sampling
(``df.sample``) is neither stable across engines nor across re-runs
with different partitioning, so every operator here derives membership
from the content-addressed 60-bit md5 hash family
(functions/hashing.py) — the same decision on any engine, any cluster
size, any day. This extends the reference's only sampling-adjacent
construct — deterministic key-based dedup membership
(silver_nyt_archive.py:102-120) — to the splits an LLM corpus needs.

Scale shapes (100 TB posture):

- sp1/sp2 are pure map-side expressions (hash + modulo + CASE): no
  shuffle, no state, trivially parallel, and the split column can be
  used as a write-time partition key so downstream training readers
  prune to their split.
- sp3 is one rank window per source partition — a single shuffle on
  ``source``; quotas are enforced without a global sort or a
  driver-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions.hashing import hash32, hash60, sql_hash32, sql_hash60
from bc_proj3_spark.plans.tables import local_rows_df, table
from bc_proj3_spark.registry import register

#: split thresholds over hash-bucket % 100: [0,90) train, [90,95) val,
#: [95,100) test — the conventional 90/5/5.
TRAIN_PCT = 90
VAL_PCT = 95

#: sp2 keeps 1 in STRAT_MOD docs per language stratum.
STRAT_MOD = 5

#: sp3 admits the first MIX_QUOTA docs per source (by hash order).
MIX_QUOTA = 10

#: sp4 packs documents into PACK_WINDOW-token context windows, sharded
#: over PACK_BUCKETS independent packing streams.
PACK_WINDOW = 2048
PACK_BUCKETS = 8


def _seeded(seed: str, *exprs) -> "F.Column":
    """Seed-prefixed concat feeding hash60 — one seed per operator so
    the hash families are independent (a doc's train/test fate must not
    correlate with its sample fate)."""
    return F.concat_ws(":", F.lit(seed), *exprs)


def _sql_seeded(seed: str, *exprs: str) -> str:
    return f"concat_ws(':', '{seed}', {', '.join(exprs)})"


# ---------------------------------------------------------------------------
# sp1 — deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

_SP1_ORACLE = f"""
SELECT doc_id, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {sql_hash60(_sql_seeded('split', 'CAST(doc_id AS VARCHAR)'))} % 100 AS bucket
  FROM documents
) b
"""


@register("sp1_split_assign", _SP1_ORACLE)
def sp1_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment, content-addressed: bucket =
    hash(doc_id) % 100. Adding documents never reassigns existing ones
    (no RNG, no ordering dependence) — the property that keeps eval
    sets stable as the corpus grows. Map-side only; zero shuffles."""
    docs = table(spark, sf_dir, "documents")
    bucket = hash60(_seeded("split", F.col("doc_id").cast("string"))) % 100
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        _split_of(bucket).alias("split"),
    )


# ---------------------------------------------------------------------------
# sp2 — stratified deterministic downsample (per-language Bernoulli)
# ---------------------------------------------------------------------------

_SP2_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {sql_hash60(_sql_seeded('strat', 'lang', 'CAST(doc_id AS VARCHAR)'))}
      % {STRAT_MOD} = 0
"""


@register("sp2_stratified_sample", _SP2_ORACLE)
def sp2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep a deterministic 1-in-{STRAT_MOD} of each language stratum:
    the hash is seeded with the stratum so the kept fraction holds
    PER LANGUAGE (independent coin per stratum), not just globally — a
    plain filter, no shuffle, and re-runs keep exactly the same rows."""
    docs = table(spark, sf_dir, "documents")
    coin = hash60(_seeded("strat", F.col("lang"), F.col("doc_id").cast("string")))
    return docs.filter(coin % STRAT_MOD == 0).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# sp3 — corpus-mix quota (first-K per source by hash order)
# ---------------------------------------------------------------------------

_SP3_ORACLE = f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {sql_hash60(_sql_seeded('mix', 'CAST(doc_id AS VARCHAR)'))}, doc_id
         ) AS rk
  FROM documents
) r
WHERE rk <= {MIX_QUOTA}
"""


@register("sp3_corpus_mix_quota", _SP3_ORACLE)
def sp3_corpus_mix_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit the first {MIX_QUOTA} docs per source, ordered by
    content-addressed hash (doc_id tiebreak for a total order): a
    deterministic per-source reservoir that caps any one source's share
    of the training mix. One rank window per source partition — a
    single shuffle on source; at 100 TB quotas stream per-partition
    with no global sort."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    h = hash60(_seeded("mix", F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MIX_QUOTA)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# sp4 — sequence packing (greedy context-window fill)
# ---------------------------------------------------------------------------

def _sp4_oracle() -> str:
    from bc_proj3_spark.operators.textstats import BPE_RE

    h = sql_hash60(_sql_seeded("pack", "CAST(doc_id AS VARCHAR)"))
    return f"""
SELECT doc_id, bucket,
       CAST(floor((cum - n_tokens) / {PACK_WINDOW}.0) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                            ) AS cum
  FROM (
    SELECT doc_id,
           {h} % {PACK_BUCKETS} AS bucket,
           {h} AS h,
           len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_tokens
    FROM documents
  ) t
) c
"""


@register("sp4_sequence_packing", _sp4_oracle())
def sp4_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a training context window: docs are
    ordered deterministically (content-addressed hash), token lengths
    (the BPE-ish count t5 uses for cost estimates) are cumulatively
    summed, and a doc's pack is the window its first token lands in —
    greedy packing, the standard pre-training batch-prep step.

    Scale shape: a SINGLE global running sum would serialize the corpus
    through one partition, so packing is sharded into {PACK_BUCKETS}
    independent hash-bucket streams — the window's PARTITION BY is the
    parallelism dimension (at 100 TB you raise PACK_BUCKETS to O(cores)
    and each stream packs locally; windows are only ever per-bucket).
    Output key (bucket, pack_id) is the global pack identity."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.operators.textstats import BPE_RE

    docs = table(spark, sf_dir, "documents")
    h = hash60(_seeded("pack", F.col("doc_id").cast("string")))
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        "doc_id",
        (h % PACK_BUCKETS).alias("bucket"),
        h.alias("h"),
        n_tokens.alias("n_tokens"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return staged.select(
        "doc_id",
        "bucket",
        F.floor((F.col("cum") - F.col("n_tokens")) / float(PACK_WINDOW))
        .cast("bigint")
        .alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# sp5 — temperature-scaled corpus mixing (n^alpha sampling weights)
# ---------------------------------------------------------------------------

TEMP_ALPHA = 0.7  # the GPT-3/PaLM-style mixing exponent
TEMP_TARGET_FRAC = 0.5  # corpus-wide target size as a fraction of input
_PPB = 1_000_000_000  # acceptance rates quantized to parts-per-billion

_SP5_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(n) AS n_total, SUM(POWER(n, {TEMP_ALPHA})) AS w_total
  FROM counts
),
rates AS (
  SELECT source,
         CAST(ROUND(least(1.0,
           (POWER(n, {TEMP_ALPHA}) / (SELECT w_total FROM tot))
           * ({TEMP_TARGET_FRAC} * (SELECT n_total FROM tot)) / n
         ) * {_PPB}) AS BIGINT) AS thr
  FROM counts
)
SELECT doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE {sql_hash60(_sql_seeded('temp', 'CAST(doc_id AS VARCHAR)'))} % {_PPB} < thr
"""


@register("sp5_temperature_mix", _SP5_ORACLE)
def sp5_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multi-source sampling: each source's share of
    the output corpus is proportional to n^{TEMP_ALPHA} (the standard
    LLM data-recipe upweighting of small, diverse sources against huge
    crawls), hit deterministically by accepting docs whose content-
    addressed hash coin falls under the source's acceptance threshold.

    The per-source thresholds derive from one source-bounded aggregate
    plus two corpus scalars, broadcast back;
    acceptance is then a map-side filter — no shuffle of the corpus, no
    RNG, identical membership on any engine or cluster size. Thresholds
    are quantized to parts-per-billion so the only transcendental
    (POWER) feeds a ROUND three orders coarser than any engine
    divergence."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.pow(F.col("n"), F.lit(TEMP_ALPHA))).alias("w_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                (F.pow(F.col("n"), F.lit(TEMP_ALPHA)) / F.col("w_total"))
                * (F.lit(TEMP_TARGET_FRAC) * F.col("n_total"))
                / F.col("n"),
            )
            * F.lit(_PPB)
        )
        .cast("bigint")
        .alias("thr"),
    )
    coin = hash60(_seeded("temp", F.col("doc_id").cast("string"))) % F.lit(_PPB)
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(coin < F.col("thr"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# sp6 — deterministic weighted sampling without replacement (A-ES keys)
# ---------------------------------------------------------------------------

#: sample size and the hash-family seed for the priority coin.
WEIGHTED_K = 50
WEIGHTED_SEED = 11

_SP6_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         ROUND(
           -LN(CAST({sql_hash32('CAST(doc_id AS VARCHAR)', WEIGHTED_SEED)} + 1
                    AS DOUBLE) / 4294967296.0)
           / n_chars, 10) AS priority
  FROM documents
)
SELECT doc_id, source, n_chars, priority
FROM pri
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
"""


@register("sp6_weighted_sample", _SP6_ORACLE)
def sp6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of WEIGHTED_K docs without replacement, where a
    doc's inclusion probability is proportional to its length — the
    Efraimidis–Spirakis exponential-keys scheme made DETERMINISTIC: the
    uniform draw is the content-addressed 32-bit hash (u = (h+1)/2^32 ∈
    (0,1]), priority = -ln(u)/weight, keep the K smallest priorities.

    No RNG: the same doc gets the same priority on any engine, any
    cluster size, any re-run; adding documents can only displace, never
    reshuffle, the sample. Priority is map-side codegen; the top-k
    compiles to TakeOrderedAndProject (per-partition heaps + one K-row
    driver merge — never a global sort), so at 100 TB the shuffle
    carries K rows per partition.

    Determinism across engines: 32-bit hash values are exact in double,
    4294967296.0 is a power of two, and the single ln() is rounded to
    10 decimals before ranking (tiebreak on doc_id) — sub-ulp ln
    divergence cannot flip the selection."""
    docs = table(spark, sf_dir, "documents")
    u = (
        hash32(F.col("doc_id").cast("string"), seed=WEIGHTED_SEED) + 1
    ).cast("double") / F.lit(4294967296.0)
    pri = F.round(-F.log(u) / F.col("n_chars"), 10)
    return (
        docs.select("doc_id", "source", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
    )


# ---------------------------------------------------------------------------
# sp7 — rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------

SHARDS_OLD = 8
SHARDS_NEW = 9

_SP7_ORACLE = f"""
WITH nodes AS (
  SELECT unnest(generate_series(0, {SHARDS_NEW - 1})) AS node
),
weights AS (
  SELECT d.doc_id, n.node,
         {sql_hash60(_sql_seeded('rdv', 'CAST(d.doc_id AS VARCHAR)', 'CAST(n.node AS VARCHAR)'))} AS w
  FROM documents d CROSS JOIN nodes n
),
pick8 AS (
  SELECT doc_id, node AS shard8 FROM (
    SELECT doc_id, node,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, node) AS rn
    FROM weights WHERE node < {SHARDS_OLD}
  ) t WHERE rn = 1
),
pick9 AS (
  SELECT doc_id, node AS shard9 FROM (
    SELECT doc_id, node,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, node) AS rn
    FROM weights
  ) t WHERE rn = 1
)
SELECT p8.doc_id, shard8, shard9, shard8 <> shard9 AS moved
FROM pick8 p8 JOIN pick9 p9 ON p8.doc_id = p9.doc_id
"""


@register("sp7_rendezvous_assign", _SP7_ORACLE)
def sp7_rendezvous_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: each document goes
    to the shard with the max seeded hash(doc, shard) — the assignment
    scheme whose defining property is MINIMAL MOVEMENT on resize
    (growing 8→9 shards relocates only ~1/9 of documents, exactly the
    ones whose new shard wins their rendezvous; modulo hashing would
    relocate ~8/9). The query computes both the 8-shard and 9-shard
    assignments and flags the moved docs, so the invariant is IN the
    verified values. Shape: docs × shard-count explode (a constant ≤9×
    fan-out, map-side), then one doc-keyed WindowGroupLimit pick —
    the weights never shuffle wider than the doc key. This is how a
    100 TB corpus is spread over ingestion workers/cache nodes without
    a coordination service."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("doc_id")
    weights = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(SHARDS_NEW - 1))
        ).alias("node"),
    ).withColumn(
        "w",
        hash60(
            _seeded(
                "rdv",
                F.col("doc_id").cast("string"),
                F.col("node").cast("string"),
            )
        ),
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "node")
    pick9 = (
        weights.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("node").alias("shard9"))
    )
    pick8 = (
        weights.filter(F.col("node") < SHARDS_OLD)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("node").alias("shard8"))
    )
    return pick8.join(pick9, "doc_id").select(
        "doc_id",
        "shard8",
        "shard9",
        (F.col("shard8") != F.col("shard9")).alias("moved"),
    )


# ---------------------------------------------------------------------------
# gen1 — the generator source: derive a table from range(), no input files
# ---------------------------------------------------------------------------

GEN_N = 100_000
GEN_BUCKETS = 100

_GEN1_ORACLE = f"""
SELECT
  {sql_hash60(_sql_seeded('gen', 'CAST(i AS VARCHAR)'))} % {GEN_BUCKETS}
    AS bucket,
  COUNT(*) AS n,
  CAST(SUM({sql_hash60(_sql_seeded('gen', 'CAST(i AS VARCHAR)'))} % 1000000)
    AS BIGINT) AS checksum
FROM range(0, {GEN_N}) t(i)
GROUP BY 1
"""


@register("gen1_range_source", _GEN1_ORACLE)
def gen1_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator SOURCE: a table derived from ``spark.range`` (the
    parallelized integer generator — Spark's no-input relation) with
    content-addressed derived columns, reduced to a bucketed checksum
    that DuckDB reproduces from its own ``range()``. This is how
    synthetic benchmark/test data is produced INSIDE the engine at any
    scale — range splits across executors, every derived value is a
    pure function of the row index (no RNG), so a 10^12-row generation
    is embarrassingly parallel and reproducible across engines and
    cluster sizes. The only registered query that reads no files at
    all: sf_dir is ignored."""
    rows = spark.range(0, GEN_N).select(F.col("id").cast("string").alias("i"))
    k = hash60(_seeded("gen", F.col("i")))
    return (
        rows.select(
            (k % GEN_BUCKETS).alias("bucket"),
            (k % 1_000_000).alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# sp8 — k-fold cross-validation assignment with balance audit
# ---------------------------------------------------------------------------

KFOLD_K = 5

_SP8_ORACLE = f"""
WITH assign AS (
  SELECT doc_id,
         {sql_hash60(_sql_seeded('fold', 'CAST(doc_id AS VARCHAR)'))}
           % {KFOLD_K} AS fold
  FROM documents
)
SELECT fold,
       COUNT(*) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM assign GROUP BY fold
"""


@register("sp8_kfold_assign", _SP8_ORACLE)
def sp8_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment, content-addressed like sp1:
    fold = hash(doc_id) % K, so folds are stable under corpus growth
    (new docs never reshuffle old folds — the property RNG-based
    splits lack) and identical on any engine or cluster size. Reported
    per fold with its size and an id checksum, so the verified values
    pin both the BALANCE (sizes within hash-uniformity bounds) and the
    exact MEMBERSHIP of every fold. Map-side hash + one K-row
    aggregate; zero data movement beyond the count."""
    docs = table(spark, sf_dir, "documents")
    fold = hash60(_seeded("fold", F.col("doc_id").cast("string"))) % KFOLD_K
    return (
        docs.select("doc_id", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.sum("doc_id").cast("bigint").alias("doc_id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# sp9 — leakage-safe (dedup-aware) train/val/test split
# ---------------------------------------------------------------------------


def _SP9_ORACLE() -> str:
    """Recursive-CTE twin: components exactly as cc1's oracle (same d4
    pair chain), then both the naive per-doc split and the cluster-level
    split from the SAME seeded hash family as sp1."""
    from bc_proj3_spark.operators.dedup import _D4_ORACLE

    return f"""
WITH RECURSIVE pairs AS (
{_D4_ORACLE}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lab) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges) n
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lab) AS component_id FROM reach GROUP BY node),
assign AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component_id, d.doc_id) AS BIGINT) AS component_id
  FROM documents d
  LEFT JOIN comp c USING (doc_id)
),
b AS (
  SELECT doc_id, component_id,
         {sql_hash60(_sql_seeded('split', 'CAST(doc_id AS VARCHAR)'))} % 100
           AS nb,
         {sql_hash60(_sql_seeded('split', 'CAST(component_id AS VARCHAR)'))} % 100
           AS sb
  FROM assign
),
s AS (
  SELECT component_id,
         CASE WHEN sb < {TRAIN_PCT} THEN 'train'
              WHEN sb < {VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN nb < {TRAIN_PCT} THEN 'train'
              WHEN nb < {VAL_PCT} THEN 'val'
              ELSE 'test' END AS naive_split
  FROM b
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT component_id) AS n_clusters,
       CAST(SUM(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_in
FROM s
GROUP BY split
"""


def _split_of(bucket: "F.Column") -> "F.Column":
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )


@register("sp9_leakage_safe_split", _SP9_ORACLE())
def sp9_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: every near-duplicate CLUSTER
    (cc1's connected components over the verified MinHash-LSH pairs)
    lands in ONE split, by hashing the cluster representative with
    sp1's seed — so singleton documents keep exactly their sp1
    assignment and only duplicate-cluster members move. This closes the
    eval-contamination hole a per-doc split leaves open: with naive
    sp1, a train doc's near-duplicate can land in test, leaking
    training content into evaluation (the reason production corpus
    builds dedup BEFORE splitting). The per-split report carries the
    audit in the verified values: n_moved_in counts docs whose naive
    split differed — exactly the would-have-leaked population.

    Scale shape: components run on the near-dup pair subgraph only
    (never corpus²); the split decision is then one map-side hash on
    the component label; the report is a 3-row aggregate (count +
    cluster-distinct + moved-sum) behind one exchange on `split`.
    No new corpus-wide shuffle beyond cc1's own label join."""
    from bc_proj3_spark.operators.graph import cc1_dedup_components

    assign = cc1_dedup_components(spark, sf_dir)
    nb = hash60(_seeded("split", F.col("doc_id").cast("string"))) % 100
    sb = hash60(_seeded("split", F.col("component_id").cast("string"))) % 100
    per_doc = assign.select(
        "component_id",
        _split_of(sb).alias("split"),
        (_split_of(sb) != _split_of(nb)).cast("int").alias("moved"),
    )
    return per_doc.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("component_id").alias("n_clusters"),
        F.sum("moved").cast("bigint").alias("n_moved_in"),
    )


# ---------------------------------------------------------------------------
# sp11 — deterministic per-epoch shuffle (shard reassignment audit)
# ---------------------------------------------------------------------------

EPOCH_SHARDS = 16
N_EPOCHS = 3


def _sp11_oracle() -> str:
    shard = lambda e: (
        sql_hash60(_sql_seeded("epoch", f"'{e}'", "CAST(doc_id AS VARCHAR)"))
        + f" % {EPOCH_SHARDS}"
    )
    cols = ", ".join(f"{shard(e)} AS s{e}" for e in range(N_EPOCHS))
    rows = " UNION ALL ".join(
        f"SELECT {e} AS epoch, s{e} AS shard, "
        + (
            "CAST(NULL AS BIGINT) AS moved"
            if e == 0
            else f"CASE WHEN s{e} <> s{e - 1} THEN 1 ELSE 0 END AS moved"
        )
        + " FROM per"
        for e in range(N_EPOCHS)
    )
    return f"""
WITH per AS (SELECT doc_id, {cols} FROM documents),
long AS ({rows}),
by_shard AS (
  SELECT epoch, shard, COUNT(*) AS n,
         CAST(SUM(moved) AS BIGINT) AS n_moved
  FROM long GROUP BY epoch, shard
)
SELECT epoch,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       COUNT(*) AS n_shards,
       CAST(MIN(n) AS BIGINT) AS min_shard,
       CAST(MAX(n) AS BIGINT) AS max_shard,
       CAST(SUM(n_moved) AS BIGINT) AS moved_from_prev
FROM by_shard GROUP BY epoch
"""


@register("sp11_epoch_shuffle", _sp11_oracle())
def sp11_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch data shuffling, the way a distributed
    training loader re-orders a 100 TB corpus each epoch WITHOUT a
    global permutation: shard(doc, epoch) = seeded-hash % S re-buckets
    every document per epoch (readers then shuffle within their shard
    buffer). No RNG state, so any worker recomputes any epoch's order
    from the epoch number alone — resumable mid-epoch, identical
    across engines and cluster sizes. The verified values carry the
    two properties that matter: shard balance (min/max shard size
    within hash-uniformity bounds) and inter-epoch decorrelation
    (moved_from_prev ≈ (S-1)/S of the corpus re-shards each epoch —
    a stuck hash would show ~0).

    Shape: the three epoch shards are map-side hash columns computed in
    ONE scan (the epoch fan-out explodes 3 constant structs per row,
    no extra read); one (epoch, shard)-keyed aggregate — S×E groups —
    then an E-row rollup. Partial aggregation absorbs the fan-out
    map-side."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    shards = [
        hash60(
            _seeded("epoch", F.lit(str(e)), F.col("doc_id").cast("string"))
        )
        % EPOCH_SHARDS
        for e in range(N_EPOCHS)
    ]
    per = docs.select(
        "doc_id", *[s.alias(f"s{e}") for e, s in enumerate(shards)]
    )
    # One scan: fan out the E epochs map-side as an array of
    # (epoch, shard, moved) structs and explode — a unionAll of E
    # projections of `per` would re-read documents E times (Spark does
    # not reuse a subplan across union branches; see the registry-wide
    # FileScan audit note).
    epoch_structs = F.array(
        *[
            F.struct(
                F.lit(e).alias("epoch"),
                F.col(f"s{e}").alias("shard"),
                (
                    F.lit(None).cast("bigint")
                    if e == 0
                    else (F.col(f"s{e}") != F.col(f"s{e - 1}")).cast("bigint")
                ).alias("moved"),
            )
            for e in range(N_EPOCHS)
        ]
    )
    long = per.select(F.explode(epoch_structs).alias("x")).select(
        "x.epoch", "x.shard", "x.moved"
    )
    by_shard = long.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("moved").cast("bigint").alias("n_moved"),
    )
    return by_shard.groupBy("epoch").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n").cast("bigint").alias("min_shard"),
        F.max("n").cast("bigint").alias("max_shard"),
        F.sum("n_moved").cast("bigint").alias("moved_from_prev"),
    )


# ---------------------------------------------------------------------------
# sp12 — DSIR: data selection via importance resampling
# ---------------------------------------------------------------------------

#: hashed-bigram feature space (buckets). 4096 keeps the ratio table
#: broadcast-trivial while leaving bucket collisions rare at test SFs;
#: the DSIR paper itself runs with hashed features (10k buckets).
DSIR_BUCKETS = 4096
#: the target distribution: English documents (the corpus's majority
#: class — a realistic "select more target-like raw data" setup).
DSIR_TARGET_LANG = "en"
#: selected fraction: top 1/DSIR_KEEP_DIV of the corpus by gumbel-key.
DSIR_KEEP_DIV = 5


def _sp12_oracle() -> str:
    from bc_proj3_spark.functions.text import sql_tokenize

    u = (
        f"(({sql_hash60(_sql_seeded('dsir', 'CAST(doc_id AS VARCHAR)'))} "
        f"% 1000000000) + 0.5) / 1000000000.0"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {sql_tokenize('text')} AS w FROM documents
),
bg AS (
  SELECT doc_id, lang,
    unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                          i -> w[i] || ' ' || w[i+1])) AS g
  FROM toks
),
bgb AS (
  SELECT doc_id, lang,
         {sql_hash60(_sql_seeded('dsirf', 'g'))} % {DSIR_BUCKETS} AS b
  FROM bg
),
cnt AS (
  SELECT b,
         CAST(COUNT(*) AS BIGINT) AS c_r,
         CAST(count_if(lang = '{DSIR_TARGET_LANG}') AS BIGINT) AS c_t
  FROM bgb GROUP BY b
),
tot AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_t) AS BIGINT) AS n_t
  FROM cnt
),
ratio AS (
  SELECT b,
         ROUND(LN(((c_t + 1) * (n_r + {DSIR_BUCKETS}))::DOUBLE
                  / ((c_r + 1) * (n_t + {DSIR_BUCKETS}))), 9) AS lr
  FROM cnt, tot
),
dw AS (
  SELECT bgb.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         SUM(CAST(lr AS DECIMAL(28,10))) AS wsum
  FROM bgb JOIN ratio USING (b) GROUP BY bgb.doc_id
),
alldocs AS (
  SELECT d.doc_id, d.lang,
         COALESCE(dw.n_grams, 0) AS n_grams,
         COALESCE(dw.wsum, CAST(0 AS DECIMAL(28,10))) AS wsum
  FROM documents d LEFT JOIN dw USING (doc_id)
),
keyed AS (
  SELECT doc_id, lang, n_grams,
         CAST(wsum AS DOUBLE) AS weight,
         wsum + CAST(ROUND(-LN(-LN({u})), 9) AS DECIMAL(28,10)) AS sel_key
  FROM alldocs
)
SELECT doc_id, lang, CAST(n_grams AS BIGINT) AS n_grams, weight
FROM keyed
QUALIFY row_number() OVER (ORDER BY sel_key DESC, doc_id)
  <= greatest((SELECT COUNT(*) FROM documents) // {DSIR_KEEP_DIV}, 1)
"""


@register("sp12_dsir_select", _sp12_oracle())
def sp12_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit two bag-of-hashed-
    bigram unigram models — target (documents in DSIR_TARGET_LANG) and
    raw (the whole corpus) — score every document by its summed
    log-likelihood ratio, and resample WITHOUT replacement via
    deterministic Gumbel-top-k (key = weight + Gumbel(content hash)),
    keeping the top 1/DSIR_KEEP_DIV of the corpus. This completes the
    pipeline's select-not-just-filter story: f1 thresholds, sp5/sp6
    reweight known mixes, sp12 *learns* what target-like means from the
    target sample itself.

    Determinism/oracle discipline: the Gumbel noise derives from the
    seeded content hash (no RNG), its transcendental chain is rounded
    to the 9-decimal lattice, and both the per-gram log-ratios and the
    selection key accumulate in exact DECIMAL(28,10) — both engines
    order candidates identically, with doc_id as the total-order
    tiebreak. The LN argument is formed as an exact-integer product
    ratio ((c+1)·(N+B) < 2^53 at any test SF) so both engines see the
    same double; a production variant would subtract logs instead once
    cross-engine verification is no longer needed.

    Scale shape (100 TB posture): the bigram stream is ONE fanout
    explode, persisted so the bucket-count aggregate and the scoring
    join share the pass (the r7 shingle-index A/B: caching the hash
    fanout beats recomputing it); the ratio table is bounded by
    DSIR_BUCKETS — broadcast by construction, never data-dependent;
    per-doc weights are one map-side-combinable aggregate; selection is
    a distributed TakeOrdered (top-k), never a global sort or a
    single-partition window."""
    from pyspark import StorageLevel

    from bc_proj3_spark.functions.text import tokenize
    from bc_proj3_spark.plans.tables import fanout

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet metadata count — no data scan
    k = max(n_docs // DSIR_KEEP_DIV, 1)

    toks = fanout(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", tokenize(F.col("text")).alias("w")
    )
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat(
                    F.element_at("w", i), F.lit(" "), F.element_at("w", i + 1)
                ),
            )
        ).alias("g"),
    )
    bgb = bg.select(
        "doc_id",
        "lang",
        (hash60(_seeded("dsirf", F.col("g"))) % DSIR_BUCKETS).alias("b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bgb.count()  # one explode pass feeds counts AND scoring

    cnt = bgb.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r"),
        F.sum(
            (F.col("lang") == DSIR_TARGET_LANG).cast("bigint")
        ).cast("bigint").alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.sum("c_t").cast("bigint").alias("n_t"),
    )
    lr = F.round(
        F.log(
            ((F.col("c_t") + 1) * (F.col("n_r") + F.lit(DSIR_BUCKETS))).cast(
                "double"
            )
            / ((F.col("c_r") + 1) * (F.col("n_t") + F.lit(DSIR_BUCKETS)))
        ),
        9,
    )
    ratio = cnt.crossJoin(F.broadcast(tot)).select("b", lr.alias("lr"))

    dec = "decimal(28,10)"
    dw = (
        bgb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.col("lr").cast(dec)).alias("wsum"),
        )
    )
    u = (
        (
            hash60(_seeded("dsir", F.col("doc_id").cast("string")))
            % F.lit(1000000000)
        )
        + F.lit(0.5)
    ) / F.lit(1000000000.0)
    gumbel = F.round(-F.log(-F.log(u)), 9).cast(dec)
    keyed = (
        docs.select("doc_id", "lang")
        .join(dw, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("wsum"), F.lit(0).cast(dec)).alias("wsum"),
        )
        .withColumn("sel_key", F.col("wsum") + gumbel)
    )
    return (
        keyed.orderBy(F.col("sel_key").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "lang",
            "n_grams",
            F.col("wsum").cast("double").alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# sp13 — rebalance the corpus to a target language mix
# ---------------------------------------------------------------------------

#: target language shares in percent (sums to 100). Languages absent
#: from this dict are excluded from the rebalanced corpus.
MIX_TARGET: dict[str, int] = {
    "en": 30, "de": 20, "es": 20, "fr": 15, "zh": 15,
}


def _sp13_oracle() -> str:
    vals = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGET.items())
    coin = sql_hash60(_sql_seeded("mixr", "CAST(d.doc_id AS VARCHAR)"))
    return f"""
WITH tgt(lang, share) AS (VALUES {vals}),
cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
cap AS (
  SELECT MIN(n * 100 // share) AS t FROM cnt JOIN tgt USING (lang)
),
par AS (
  SELECT cnt.lang, cnt.n,
         (SELECT t FROM cap) * tgt.share // 100 AS k
  FROM cnt JOIN tgt USING (lang)
)
SELECT d.doc_id, d.lang
FROM documents d JOIN par ON par.lang = d.lang
WHERE {coin} % par.n < par.k
"""


@register("sp13_mix_rebalance", _sp13_oracle())
def sp13_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to MIX_TARGET language shares: the largest
    achievable total under the target is T = min_d(n_d·100/s_d) (the
    binding domain is kept whole-ish; abundant domains are thinned),
    each domain's budget is k_d = T·s_d/100, and membership is a
    deterministic per-doc coin (hash % n_d < k_d) — the data-mixing
    step that turns prof3's as-is composition into the mix the training
    plan actually wants.

    Budget arithmetic is all-integer (no float seam); membership uses
    the content-addressed hash family, so the kept set is stable under
    re-runs, engine choice, and corpus append order. Rate-based
    thinning keeps selection MAP-SIDE (a per-domain exact-k rank would
    funnel each language through one window partition at 100 TB);
    achieved counts are binomial-tight around k_d, which is what
    production mixers accept in exchange for a shuffle-free plan.
    Scale: one tiny per-lang count aggregate broadcast back over a
    single scan; languages outside MIX_TARGET drop via the inner
    join."""
    docs = table(spark, sf_dir, "documents")
    tgt = local_rows_df(
        docs.sparkSession, list(MIX_TARGET.items()), "lang string, share bigint"
    )
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    j = cnt.join(tgt, "lang")
    cap = j.agg(F.min(F.expr("n * 100 div share")).alias("t"))
    par = j.crossJoin(F.broadcast(cap)).select(
        "lang", "n", F.expr("t * share div 100").alias("k")
    )
    coin = hash60(_seeded("mixr", F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(par), "lang")
        .filter(coin % F.col("n") < F.col("k"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# sp14 — fractional epoch up-sampling (data-recipe materialization)
# ---------------------------------------------------------------------------

#: epochs per language in integer PERCENT (250 = 2.5 epochs): curated /
#: scarce languages are repeated, abundant ones thinned — the "epochs
#: over the mix" column of a training-data recipe (the published
#: LLM recipes repeat books/wiki 2-3x while web text runs <1 epoch).
#: Integer percent avoids any float seam in the budget arithmetic.
EPOCH_PCT: dict[str, int] = {
    "en": 250, "de": 200, "es": 125, "fr": 100, "zh": 40,
}


def _sp14_oracle() -> str:
    vals = ", ".join(f"('{k}', {v})" for k, v in EPOCH_PCT.items())
    coin = sql_hash60(_sql_seeded("epoch", "CAST(d.doc_id AS VARCHAR)"))
    return f"""
WITH rec(lang, pct) AS (VALUES {vals}),
rep AS (
  SELECT d.doc_id, d.lang,
         len(string_split(d.text, ' ')) AS n_tokens,
         pct // 100 + CASE WHEN {coin} % 100 < pct % 100 THEN 1 ELSE 0 END
           AS n_epochs
  FROM documents d JOIN rec ON rec.lang = d.lang
),
x AS (
  SELECT doc_id, lang, n_tokens, unnest(range(1, n_epochs + 1)) AS epoch
  FROM rep
)
SELECT lang, CAST(epoch AS BIGINT) AS epoch,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM x
GROUP BY lang, epoch
"""


@register("sp14_epoch_upsample", _sp14_oracle())
def sp14_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a data recipe's epoch column: each document is
    repeated floor(pct/100) times and once more with probability
    (pct mod 100)/100 via a deterministic content-addressed coin — so
    a 2.5-epoch language shows two full epochs plus a ~half-size third,
    and a 0.4-epoch language is thinned to a ~40% single epoch. The
    verified output is the per-(lang, epoch) doc/token census — the
    table a training run's data loader is provisioned from.

    Teammate ops: sp5 temperature-weights sources, sp13 rebalances to
    target shares, cur1 schedules phases; sp14 is the REPEAT dimension
    (epochs > 1) none of them express, and the epoch tag is what sp11's
    per-epoch shard shuffle keys on downstream.

    Scale shape: zero-shuffle row expansion — the recipe is a literal
    map, membership and repeat count are map-side hash arithmetic, and
    ``explode(sequence(...))`` streams through whole-stage codegen;
    the only exchange is the final bounded (lang × epochs) aggregate.
    Repeats are TAGGED, not copied: downstream stages key on
    (doc_id, epoch) and payload bytes are stored once."""
    docs = table(spark, sf_dir, "documents")
    rec = local_rows_df(
        docs.sparkSession, list(EPOCH_PCT.items()), "lang string, pct bigint"
    )
    coin = hash60(_seeded("epoch", F.col("doc_id").cast("string"))) % 100
    rep = (
        docs.join(F.broadcast(rec), "lang")
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            (
                F.expr("pct div 100")
                + F.when(coin < F.col("pct") % 100, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_epochs"),
        )
        .filter(F.col("n_epochs") > 0)
    )
    x = rep.select(
        "lang",
        "n_tokens",
        F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("epoch"),
    )
    return x.groupBy("lang", F.col("epoch").cast("bigint").alias("epoch")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# sp15 — padded-batch waste: length-sorted vs random batching
# ---------------------------------------------------------------------------

#: data-loader geometry: documents are batched BATCH_SIZE at a time
#: within each of BATCH_SHARDS independent loader shards (a real
#: multi-worker loader batches per worker, never globally).
BATCH_SIZE = 32
BATCH_SHARDS = 16

_SP15_H = sql_hash60(_sql_seeded("bat", "CAST(doc_id AS VARCHAR)"))

_SP15_ORACLE = f"""
WITH lens AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS ln,
         {_SP15_H} AS h
  FROM documents
),
stacked AS (
  SELECT 'sorted' AS strategy, h % {BATCH_SHARDS} AS shard, ln,
         ROW_NUMBER() OVER (
           PARTITION BY h % {BATCH_SHARDS} ORDER BY ln, doc_id) AS rn
  FROM lens
  UNION ALL
  SELECT 'random', h % {BATCH_SHARDS}, ln,
         ROW_NUMBER() OVER (
           PARTITION BY h % {BATCH_SHARDS} ORDER BY h, doc_id)
  FROM lens
),
batches AS (
  SELECT strategy, shard, (rn - 1) // {BATCH_SIZE} AS b,
         COUNT(*) AS cnt, MAX(ln) AS mx, SUM(ln) AS tok
  FROM stacked GROUP BY strategy, shard, (rn - 1) // {BATCH_SIZE}
)
SELECT strategy,
       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       COUNT(*) AS n_batches,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(mx * cnt) AS BIGINT) AS padded_tokens,
       CAST(SUM(mx * cnt - tok) AS BIGINT) AS waste_tokens,
       CAST(SUM(mx * cnt - tok) AS DOUBLE)
         / CAST(SUM(mx * cnt) AS DOUBLE) AS waste_frac
FROM batches GROUP BY strategy
"""


@register("sp15_length_bucketing", _SP15_ORACLE)
def sp15_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste ledger for the two classic data-loader batching
    strategies: hash-random batches vs length-sorted batches, at
    BATCH_SIZE docs per batch within BATCH_SHARDS loader shards. A
    padded batch costs max-length x batch-size tokens of compute;
    the delta between the two waste_frac numbers is the training
    throughput a curator buys by sorting before batching (typically
    2-5x less padding) - the number that justifies sp4's packing or
    this op's cheaper sort-within-shard alternative.

    Exactness: token lengths (t5's whitespace contract), batch
    membership (seeded-hash shard + within-shard rank on a total
    order), and all waste sums are exact integers; waste_frac is ONE
    IEEE division of two exact BIGINTs (EXACT_DOUBLE_OK).

    Scale shape: ONE corpus scan fans both strategies out map-side
    (explode of two (strategy, sort-key) structs); the only wide
    exchange is the window partitioned by (strategy, shard) - batching
    is per-shard BY CONSTRUCTION (as a real multi-worker loader
    batches), so no global sort exists at any corpus size and shard
    count is the parallelism knob; the per-batch and per-strategy
    aggregates ride the window's partitioning combiner-absorbed."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    h = hash60(_seeded("bat", F.col("doc_id").cast("string")))
    lens = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ln"),
        h.alias("h"),
    )
    stacked = lens.select(
        "doc_id",
        "ln",
        (F.col("h") % BATCH_SHARDS).alias("shard"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("sorted").alias("strategy"), F.col("ln").alias("k1")
                ),
                F.struct(
                    F.lit("random").alias("strategy"), F.col("h").alias("k1")
                ),
            )
        ).alias("sk"),
    ).select(
        F.col("sk.strategy").alias("strategy"),
        "shard",
        "ln",
        F.col("sk.k1").alias("k1"),
        "doc_id",
    )
    w = Window.partitionBy("strategy", "shard").orderBy("k1", "doc_id")
    batches = (
        stacked.select(
            "strategy",
            "shard",
            "ln",
            ((F.row_number().over(w) - 1) / BATCH_SIZE)
            .cast("bigint")
            .alias("b"),
        )
        .groupBy("strategy", "shard", "b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("ln").alias("mx"),
            F.sum("ln").alias("tok"),
        )
    )
    pad = F.col("mx") * F.col("cnt")
    return batches.groupBy("strategy").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.sum(pad).cast("bigint").alias("padded_tokens"),
        F.sum(pad - F.col("tok")).cast("bigint").alias("waste_tokens"),
        (
            F.sum(pad - F.col("tok")).cast("double")
            / F.sum(pad).cast("double")
        ).alias("waste_frac"),
    )


# ---------------------------------------------------------------------------
# sp16 — packing-efficiency report over sp4's context windows
# ---------------------------------------------------------------------------


def _sp16_oracle() -> str:
    from bc_proj3_spark.operators.textstats import BPE_RE

    h = sql_hash60(_sql_seeded("pack", "CAST(doc_id AS VARCHAR)"))
    return f"""
WITH staged AS (
  SELECT doc_id,
         {h} % {PACK_BUCKETS} AS bucket,
         {h} AS h,
         len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT bucket, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (
                PARTITION BY bucket ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - n_tokens) / {PACK_WINDOW}.0) AS BIGINT) AS pack_id
  FROM staged
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(SUM(n_tokens) AS BIGINT) AS token_sum,
       CAST(SUM(n_tokens) AS DOUBLE)
         / (COUNT(DISTINCT pack_id) * {PACK_WINDOW}) AS fill_rate
FROM packed
GROUP BY bucket
"""


@register("sp16_pack_efficiency", _sp16_oracle())
def sp16_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing efficiency report over sp4's context-window
    assignment: per hash-bucket stream, document count, window count,
    token total and fill rate (tokens / window capacity) — the padding
    -waste number a training budget is checked against (a fill rate of
    0.7 means 30% of paid FLOPs train on padding; above 1.0 means docs
    straddle window boundaries and the truncation policy is live).
    sp4 ASSIGNS the windows; sp16 is the audit a batch-prep job
    publishes next to them, and the per-bucket breakdown localizes a
    skewed stream before it serializes an epoch.

    Exactness: reuses sp4's exact mechanism verbatim (same seeded
    hash, same cumulative-sum window, same constants); every count is
    an exact BIGINT and the fill rate is ONE IEEE division of exact
    integers.

    Scale shape: sp4's — packing runs as {PACK_BUCKETS} independent
    per-bucket running sums (no global window), then ONE {PACK_BUCKETS}
    -row aggregate. The distinct-pack count collapses map-side: pack
    ids are already bucket-local."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.operators.textstats import BPE_RE

    docs = table(spark, sf_dir, "documents")
    h = hash60(_seeded("pack", F.col("doc_id").cast("string")))
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        docs.select(
            "doc_id",
            (h % PACK_BUCKETS).alias("bucket"),
            h.alias("h"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "bucket",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / float(PACK_WINDOW))
            .cast("bigint")
            .alias("pack_id"),
        )
    )
    return packed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("token_sum"),
        (
            F.sum("n_tokens").cast("double")
            / (F.countDistinct("pack_id") * PACK_WINDOW)
        ).alias("fill_rate"),
    )


# ---------------------------------------------------------------------------
# sp17 — token-budget corpus mix (the token-denominated twin of sp3)
# ---------------------------------------------------------------------------

#: BPE-token allowance per source. Training recipes are specified in
#: TOKENS, not documents ("100B tokens of web, 20B of code"): a
#: doc-count quota (sp3) over-represents long-document sources, so the
#: production mix step fills each source's TOKEN budget instead.
SP17_TOKEN_BUDGET = 500


def _sp17_oracle() -> str:
    from bc_proj3_spark.operators.textstats import BPE_RE

    h = sql_hash60(_sql_seeded("tokmix", "CAST(doc_id AS VARCHAR)"))
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
           AS n_tokens,
         {h} AS h
  FROM documents
),
cum AS (
  SELECT source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c
  FROM base
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c <= {SP17_TOKEN_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN c <= {SP17_TOKEN_BUDGET} THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_admitted,
       CAST({SP17_TOKEN_BUDGET} AS BIGINT) AS budget,
       CAST(SUM(CASE WHEN c <= {SP17_TOKEN_BUDGET} THEN n_tokens ELSE 0 END)
            AS DOUBLE) / {SP17_TOKEN_BUDGET} AS fill_rate
FROM cum
GROUP BY source
"""


@register("sp17_token_budget_mix", _sp17_oracle())
def sp17_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill each source's TOKEN budget greedily in content-addressed
    hash order — the token-denominated corpus mix (sp3 caps documents;
    real recipes cap tokens, because a long-document source would blow
    its share under a doc quota). A doc is admitted iff the running
    token total THROUGH it stays inside the budget (rank-order prefix
    rule — deterministic and re-runnable, same hash-order discipline
    as sp3/sp4); the per-source ledger reports docs seen/admitted,
    tokens admitted, and the fill rate a mix designer tunes against.

    Exactness: token counts are exact integers from the shared BPE_RE
    segmentation (t5/sp4's convention); the prefix sum and admission
    comparison are pure integer arithmetic; fill_rate is ONE IEEE
    division of an exact integer by a literal.

    Scale shape: one documents scan; the prefix sum is one rank window
    per source partition (single shuffle on source, the sp3/sp4 plan);
    the ledger is a combiner-absorbed per-source aggregate. At 100 TB
    the window streams per source partition — no global sort, no
    driver-side state."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.operators.textstats import BPE_RE

    docs = table(spark, sf_dir, "documents")
    h = hash60(_seeded("tokmix", F.col("doc_id").cast("string")))
    n_tokens = (
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = docs.select("doc_id", "source", n_tokens).withColumn(
        "c", F.sum("n_tokens").over(w)
    )
    admitted = F.col("c") <= SP17_TOKEN_BUDGET
    return cum.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(admitted, 1).otherwise(0)).cast("bigint").alias(
            "n_admitted"
        ),
        F.sum(F.when(admitted, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_admitted"),
        F.lit(SP17_TOKEN_BUDGET).cast("bigint").alias("budget"),
        (
            F.sum(F.when(admitted, F.col("n_tokens")).otherwise(0)).cast(
                "double"
            )
            / SP17_TOKEN_BUDGET
        ).alias("fill_rate"),
    )
