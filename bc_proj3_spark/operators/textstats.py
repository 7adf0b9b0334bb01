"""Text analysis operators over the ``documents`` table.

Training-data-pipeline text ops: language identification (character
n-gram heuristic), quality scoring (length / punctuation / stopword
ratios), token histograms, and content fingerprinting. All pure
column expressions (whole-stage codegen; no Python workers), each with
a DuckDB oracle. Heuristics are intentionally simple and deterministic:
integer counts combined with IEEE double arithmetic so both engines
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions import text as T
from bc_proj3_spark.functions.joins import gated_broadcast
from bc_proj3_spark.plans.tables import fanout, local_rows_df, table
from bc_proj3_spark.registry import register

# ---------------------------------------------------------------------------
# t1 — language-ID heuristic (vowel-density buckets)
# ---------------------------------------------------------------------------

_T1_ORACLE = """
WITH feat AS (
  SELECT
    doc_id, lang,
    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS n_vowels,
    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_letters
  FROM documents
)
SELECT
  doc_id,
  lang,
  CAST(n_vowels AS DOUBLE) / n_letters AS vowel_ratio,
  CASE
    WHEN n_letters = 0 THEN 'und'
    WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.28 THEN 'zh'
    WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.33 THEN 'de'
    WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.38 THEN 'en'
    WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.43 THEN 'es'
    ELSE 'fr'
  END AS lang_pred
FROM feat
"""


@register("t1_language_id", _T1_ORACLE)
def t1_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class language-ID heuristic: vowel density bucketed to a
    language guess. A real deployment swaps the bucket table for trained
    n-gram profiles; the Spark shape (pure scan-side expressions, no
    shuffle) is the point."""
    docs = table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_vowels = F.length(F.regexp_replace(lower, "[^aeiou]", ""))
    n_letters = F.length(F.regexp_replace(lower, "[^a-z]", ""))
    ratio = n_vowels.cast("double") / n_letters
    pred = (
        F.when(n_letters == 0, F.lit("und"))
        .when(ratio < 0.28, F.lit("zh"))
        .when(ratio < 0.33, F.lit("de"))
        .when(ratio < 0.38, F.lit("en"))
        .when(ratio < 0.43, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id", "lang", ratio.alias("vowel_ratio"), pred.alias("lang_pred")
    )


# ---------------------------------------------------------------------------
# t2 — document quality score
# ---------------------------------------------------------------------------

_T2_ORACLE = f"""
WITH feat AS (
  SELECT
    doc_id,
    length(text) AS n_chars_m,
    length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')) AS n_clean,
    len(string_split_regex(trim(text), '\\s+')) AS n_words,
    len({T.sql_tokenize('text')}) AS n_content
  FROM documents
)
SELECT
  doc_id,
  CAST(n_chars_m AS INTEGER) AS n_chars_m,
  CAST(n_words AS INTEGER) AS n_words,
  CAST(n_chars_m - n_clean AS DOUBLE) / n_chars_m AS punct_ratio,
  CAST(n_words - n_content AS DOUBLE) / n_words AS stop_ratio,
  0.4 * least(1.0, CAST(n_words AS DOUBLE) / 60)
    + 0.3 * (1.0 - CAST(n_chars_m - n_clean AS DOUBLE) / n_chars_m)
    + 0.3 * (1.0 - CAST(n_words - n_content AS DOUBLE) / n_words) AS quality
FROM feat
"""


@register("t2_quality_score", _T2_ORACLE)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from length, punctuation density and
    stopword/short-token density — the standard pre-training corpus
    filter shape (cf. the reference's normalize-then-filter gold chain,
    gold_article_scoring.py:36-41,174)."""
    docs = table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_chars = F.length(F.col("text"))
    n_clean = F.length(F.regexp_replace(lower, r"[^a-z0-9\s]", ""))
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_content = F.size(T.tokenize(F.col("text")))
    punct_ratio = (n_chars - n_clean).cast("double") / n_chars
    stop_ratio = (n_words - n_content).cast("double") / n_words
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_words.cast("double") / F.lit(60))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars_m"),
        n_words.cast("int").alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


# ---------------------------------------------------------------------------
# t3 — corpus token histogram (the reference's declared "word frequency
#      for trend monitoring" goal, gold_article_scoring.py:12-13)
# ---------------------------------------------------------------------------

_T3_ORACLE = f"""
SELECT word, COUNT(*) AS n_docs
FROM (
  SELECT doc_id, unnest({T.sql_distinct_tokens('text')}) AS word
  FROM documents
) w
GROUP BY word
ORDER BY n_docs DESC, word
LIMIT 50
"""


@register("t3_token_histogram", _T3_ORACLE)
def t3_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency of the top-50 content words: explode distinct
    tokens → count per word. Partial aggregation absorbs the explode
    fan-out before the shuffle."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.distinct_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("word"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# t4 — document fingerprint
# ---------------------------------------------------------------------------

_T4_ORACLE = f"""
SELECT doc_id, {T.sql_fingerprint('text')} AS fp
FROM documents
"""


@register("t4_doc_fingerprint", _T4_ORACLE)
def t4_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    order-insensitive content identity, the building block for exact
    dedup (operators/dedup.py)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# t5 — token counting: whitespace vs BPE-ish regex segmentation
# ---------------------------------------------------------------------------

#: GPT-2-flavored pre-tokenizer shape: letter runs, digit runs, or a
#: single non-alphanumeric — the standard first split before BPE merges.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

_T5_ORACLE = f"""
SELECT
  doc_id,
  CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
  CAST(length(text) AS DOUBLE) / len(regexp_extract_all(lower(text), '{BPE_RE}'))
    AS chars_per_token
FROM documents
"""


@register("t5_token_count", _T5_ORACLE)
def t5_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways a data pipeline needs it: whitespace
    words (logging/quality heuristics) and a BPE-ish regex segmentation
    (the cost estimate for LLM training tokens). chars-per-token is the
    compression-ratio feature used for corpus mix decisions. Pure scan
    expressions — codegen, no shuffle."""
    docs = fanout(table(spark, sf_dir, "documents"))
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    )
    return docs.select(
        "doc_id",
        n_ws.cast("int").alias("n_ws_tokens"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
        (F.length("text").cast("double") / n_bpe).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# t6 — language-ID by character-trigram profiles
# ---------------------------------------------------------------------------

#: Tiny per-language trigram profiles (real deployments learn these from
#: labeled corpora; the operator shape — profile match-count + argmax —
#: is identical).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "ing", "and", " an", "ion"),
    "de": ("der", "sch", "ein", "ich", "und", "gen"),
    "fr": ("les", "ent", "de ", " de", "que", "ons"),
}


def _occurrences(col, needle: str):
    """Occurrence count via length difference — identical arithmetic in
    both engines, no regex escaping concerns."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


def _sql_occurrences(expr: str, needle: str) -> str:
    quoted = needle.replace("'", "''")
    return (
        f"(length({expr}) - length(replace({expr}, '{quoted}', ''))) / {len(needle)}"
    )


def _sql_lang_score(lang: str) -> str:
    return " + ".join(
        _sql_occurrences("lower(text)", tg) for tg in LANG_PROFILES[lang]
    )


_T6_ORACLE = f"""
WITH scores AS (
  SELECT doc_id,
         {', '.join(f"CAST({_sql_lang_score(lang)} AS BIGINT) AS score_{lang}" for lang in LANG_PROFILES)}
  FROM documents
)
SELECT doc_id, score_en, score_de, score_fr,
       CASE
         WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
         WHEN score_de >= score_fr THEN 'de'
         ELSE 'fr'
       END AS lang_pred
FROM scores
"""


@register("t6_ngram_language_id", _T6_ORACLE)
def t6_ngram_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram-profile language ID (the n-gram upgrade of
    t1's vowel heuristic): per-language profile occurrence counts,
    argmax with a fixed tie order. Profile matching is pure string
    arithmetic (length-of-replace), vectorizable and shuffle-free."""
    docs = fanout(table(spark, sf_dir, "documents"))
    lower = F.lower(F.col("text"))
    scores = {
        lang: sum(
            (_occurrences(lower, tg) for tg in tgs), F.lit(0)
        ).cast("bigint")
        for lang, tgs in LANG_PROFILES.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), "en"
        )
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        pred.alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# t7 — rolling-hash document fingerprint (Rabin–Karp fold)
# ---------------------------------------------------------------------------

_ROLL_B = 131
_ROLL_M = 1_000_000_007

_T7_ORACLE = f"""
SELECT
  doc_id,
  list_reduce(
    list_transform(string_split(lower(text), ''), c -> CAST(ascii(c) AS BIGINT)),
    (acc, x) -> (acc * {_ROLL_B} + x) % {_ROLL_M}
  ) AS roll_hash,
  CAST(length(text) AS INTEGER) AS n_chars_fp
FROM documents
"""


@register("t7_rolling_fingerprint", _T7_ORACLE)
def t7_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-SENSITIVE content fingerprint: a Rabin–Karp polynomial
    rolling hash folded left-to-right over the character stream —
    complements t4's order-insensitive token-set fingerprint (re-ordered
    paragraphs get equal t4 but different t7). The same sequential fold
    runs in both engines (aggregate vs list_reduce: init 0 is absorbed
    by acc*B+x), so values are bit-identical."""
    docs = fanout(table(spark, sf_dir, "documents"))
    chars = F.transform(F.split(F.lower(F.col("text")), ""), lambda c: F.ascii(c))
    roll = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _ROLL_B + x) % _ROLL_M,
    )
    return docs.select(
        "doc_id",
        roll.alias("roll_hash"),
        F.length("text").cast("int").alias("n_chars_fp"),
    )


# ---------------------------------------------------------------------------
# t8 — duplicate-trigram fraction (repetition quality signal)
# ---------------------------------------------------------------------------

_T8_N = 3  # trigram repetition, the classic Gopher-rules granularity

#: Shared word-array expression: lowercase, whitespace-split, no empties.
_SQL_WORDS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
)

_T8_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
    list_transform(
      generate_series(1, greatest(len(w) - {_T8_N - 1}, 0)),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
    ) AS g
  FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents) t
)
SELECT doc_id,
       CAST(len(g) AS INTEGER) AS n_trigrams,
       CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
         / greatest(len(g), 1) AS dup_trigram_frac
FROM grams
"""


def _words(col):
    """Lowercased whitespace tokens, empties dropped (codegen twin of
    :data:`_SQL_WORDS` — raw tokens, NOT the stopword-filtered
    :func:`~bc_proj3_spark.functions.text.tokenize`: repetition is
    measured on the text as written)."""
    return F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"), lambda x: x != F.lit("")
    )


@register("t8_repetition", _T8_ORACLE)
def t8_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signal: the fraction of word trigrams
    that are duplicates of an earlier trigram in the same document —
    the standard "repetitious text" filter a training-data pipeline
    applies before anything model-based (boilerplate, keyword stuffing,
    and decoder loops all spike it).

    Pure whole-stage-codegen array expressions (no shuffle, no Python):
    the n-gram list is built with ``transform`` over an index
    ``sequence`` (guarded so docs shorter than n yield an empty list,
    not a descending sequence) and the duplicate fraction is
    ``1 - |distinct|/|all|`` — integer counts divided as IEEE doubles,
    so both engines agree bit-for-bit. Scales embarrassingly: per-row
    work, columnar scan in, columnar out.
    """
    docs = fanout(table(spark, sf_dir, "documents"))
    w = _words(F.col("text"))
    n_grams = F.greatest(F.size(w) - (_T8_N - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(_T8_N)]
        ),
    )
    # sequence(1, 0) yields [1, 0] (descending), not [] — mask to empty
    grams = F.when(n_grams > 0, grams).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select(
        "doc_id",
        F.size(grams).alias("n_trigrams"),
        (
            (F.size(grams) - F.size(F.array_distinct(grams))).cast("double")
            / F.greatest(F.size(grams), F.lit(1))
        ).alias("dup_trigram_frac"),
    )


# ---------------------------------------------------------------------------
# t9 — most-frequent-token share (single-exchange two-level aggregation)
# ---------------------------------------------------------------------------

_T9_ORACLE = f"""
WITH counts AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest({_SQL_WORDS}) AS word FROM documents) t
  GROUP BY doc_id, word
),
ranked AS (
  SELECT doc_id, word, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id) AS total,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, word DESC
         ) AS rn
  FROM counts
)
SELECT doc_id,
       word AS top_token,
       CAST(cnt AS BIGINT) AS top_cnt,
       CAST(cnt AS DOUBLE) / total AS top_token_frac
FROM ranked WHERE rn = 1
"""


@register("t9_top_token_fraction", _T9_ORACLE)
def t9_top_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of a document's tokens taken by its single most frequent
    token (ties broken toward the lexicographically largest token) —
    the companion repetition filter to t8: a high top-token share with
    a low trigram-dup fraction is keyword stuffing rather than phrase
    boilerplate.

    Scale shape: ONE exchange total. The (small, pre-explode) documents
    table is repartitioned on doc_id, the token explode runs inside
    that partitioning (Generate preserves its child's distribution),
    and BOTH aggregations — (doc_id, word) counts, then the per-doc
    max/total — are satisfied by doc_id clustering, so neither adds a
    shuffle. The argmax is ``max(struct(cnt, word))``: struct ordering
    compares cnt first, then word, which is exactly the oracle's
    ``ORDER BY cnt DESC, word DESC LIMIT 1`` — no window needed.
    """
    docs = fanout(table(spark, sf_dir, "documents")).repartition("doc_id")
    counts = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.groupBy("doc_id").agg(
        F.max(F.struct("cnt", "word")).alias("top"),
        F.sum("cnt").alias("total"),
    )
    return top.select(
        "doc_id",
        F.col("top.word").alias("top_token"),
        F.col("top.cnt").alias("top_cnt"),
        (F.col("top.cnt").cast("double") / F.col("total")).alias(
            "top_token_frac"
        ),
    )


# ---------------------------------------------------------------------------
# t11 — PMI bigram collocations (corpus-statistical phrase mining)
# ---------------------------------------------------------------------------

T11_MIN_COUNT = 5
T11_TOP_K = 30

_T11_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {T.sql_tokenize('text')} AS w FROM documents
),
bigrams AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                i -> {{'a': w[i], 'b': w[i+1]}})) AS bg
  FROM toks
),
bg_counts AS (
  SELECT bg.a AS a, bg.b AS b, COUNT(*) AS n_ab FROM bigrams GROUP BY bg.a, bg.b
),
uni AS (
  SELECT unnest(w) AS t FROM toks
),
uni_counts AS (SELECT t, COUNT(*) AS n FROM uni GROUP BY t),
totals AS (
  SELECT (SELECT SUM(n) FROM uni_counts) AS n_tot,
         (SELECT SUM(n_ab) FROM bg_counts) AS n_big
)
SELECT a, b, n_ab,
       ROUND(LN((n_ab / (SELECT n_big FROM totals))
                / ((za.n / (SELECT n_tot FROM totals))
                   * (zb.n / (SELECT n_tot FROM totals)))), 6) AS pmi
FROM bg_counts
JOIN uni_counts za ON a = za.t
JOIN uni_counts zb ON b = zb.t
WHERE n_ab >= {T11_MIN_COUNT}
ORDER BY pmi DESC, a, b
LIMIT {T11_TOP_K}
"""


@register("t11_pmi_collocations", _T11_ORACLE)
def t11_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} bigram collocations by pointwise mutual information —
    the corpus-statistics phrase miner (which word pairs co-occur far
    above chance). The phrase-detection pass a tokenizer-training
    pipeline runs before merging multi-word units.

    One exploded token stream feeds the unigram counts; adjacent-pair
    structs (built in-array JVM-side, like the shingle family) feed the
    bigram counts; both are map-side-combinable aggregates bounded by
    vocabulary size, joined back with the two 1-row totals broadcast.
    PMI is a single ln per surviving bigram computed from exact integer
    counts — no log-sums, so cross-engine parity needs only the final
    round(6). Total order (pmi desc, a, b) shared with the oracle."""
    from pyspark import StorageLevel

    docs = fanout(table(spark, sf_dir, "documents"))
    # r11 single-tokenize (guide §1.2 double-compute): the token stream
    # feeds THREE aggregate branches (bigram counts, unigram counts,
    # and the totals broadcast re-evaluating both), so the un-cached
    # plan ran the regex tokenize 3-4×. Persist the tokenized frame —
    # the gate's measured count below is the first job and fills it;
    # every branch then reads cached arrays. Same trade as the r7
    # shingle-index A/B: at scale this swaps repeated tokenizer CPU for
    # one line-rate local cache write, never a shuffle. Released by the
    # session's per-query clearCache (d11-sig precedent).
    toks = docs.select("doc_id", T.tokenize(F.col("text")).alias("w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    size = F.size(F.col("w"))
    idx = F.when(size >= 2, F.sequence(F.lit(1), size - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("w"), i).alias("a"),
                    F.element_at(F.col("w"), i + 1).alias("b"),
                ),
            )
        ).alias("bg")
    )
    bg_counts = bigrams.groupBy(
        F.col("bg.a").alias("a"), F.col("bg.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    uni_counts = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = uni_counts.agg(F.sum("n").alias("n_tot")).crossJoin(
        bg_counts.agg(F.sum("n_ab").alias("n_big"))
    )
    # vocabulary-sized, data-dependent → measured-count broadcast gate
    # (one persist+count, reused by both sides of the self-join)
    uni_gated = gated_broadcast(uni_counts)
    scored = (
        bg_counts.filter(F.col("n_ab") >= T11_MIN_COUNT)
        .join(uni_gated.alias("za"), F.col("a") == F.col("za.t"))
        .join(uni_gated.alias("zb"), F.col("b") == F.col("zb.t"))
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("n_big"))
                    / (
                        (F.col("za.n") / F.col("n_tot"))
                        * (F.col("zb.n") / F.col("n_tot"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(T11_TOP_K)


# ---------------------------------------------------------------------------
# t12 — BPE merge-candidate counting (the tokenizer-training inner loop)
# ---------------------------------------------------------------------------

T12_TOP_K = 20

_T12_ORACLE = f"""
WITH toks AS (
  SELECT unnest({T.sql_tokenize('text')}) AS w FROM documents
),
vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
  FROM vocab, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS weighted_count
FROM pairs
GROUP BY pair
ORDER BY weighted_count DESC, pair
LIMIT {T12_TOP_K}
"""


@register("t12_bpe_merge_pairs", _T12_ORACLE)
def t12_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One step of BPE tokenizer training: the top merge candidates —
    adjacent character pairs weighted by corpus word frequency. The
    highest-count pair is what a BPE trainer merges next; iterating
    (merge, re-split, recount) is driver-side orchestration of exactly
    this plan over the (vocabulary-sized) word-frequency table.

    The scale trick is the standard one: pair counting runs over the
    DISTINCT vocabulary weighted by frequency, not over the raw token
    stream — the corpus is touched once (word counts, map-side
    combinable); everything after is bounded by vocabulary size.
    Exact integer sums, total order with the oracle."""
    docs = fanout(table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wlen = F.length(F.col("w"))
    pairs = vocab.filter(wlen >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), wlen - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("weighted_count"))
        .orderBy(F.col("weighted_count").desc(), "pair")
        .limit(T12_TOP_K)
    )


# ---------------------------------------------------------------------------
# t13 — language-ID confusion matrix (classifier-eval over t1)
# ---------------------------------------------------------------------------

_T13_ORACLE = """
WITH feat AS (
  SELECT
    lang,
    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS n_vowels,
    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_letters
  FROM documents
),
pred AS (
  SELECT lang,
    CASE
      WHEN n_letters = 0 THEN 'und'
      WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.28 THEN 'zh'
      WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.33 THEN 'de'
      WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.38 THEN 'en'
      WHEN CAST(n_vowels AS DOUBLE) / n_letters < 0.43 THEN 'es'
      ELSE 'fr'
    END AS lang_pred
  FROM feat
)
SELECT lang, lang_pred, COUNT(*) AS n_docs
FROM pred
GROUP BY lang, lang_pred
"""


@register("t13_langid_confusion", _T13_ORACLE)
def t13_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of declared language vs t1's heuristic
    prediction — the EVALUATION step a pipeline runs whenever it swaps
    a classifier (accuracy per class, systematic confusions). Reuses
    t1's exact feature/bucket expressions, then one (truth, pred)
    count aggregate — classifier eval at corpus scale is a groupBy,
    not a collect."""
    pred = t1_language_id(spark, sf_dir)
    return pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# t15 — skip-gram context pairs (embedding-training data prep)
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 3
SKIPGRAM_TOP_K = 50

_T15_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {T.sql_tokenize('text')} AS t FROM documents
),
pos AS (
  SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i
  FROM tok WHERE len(t) >= 2
),
pairs AS (
  SELECT t[i + 1] AS w_a, t[i + 1 + j] AS w_b
  FROM pos, (SELECT unnest(range(1, {SKIPGRAM_WINDOW} + 1)) AS j) js
  WHERE i + j < len(t)
)
SELECT w_a, w_b, COUNT(*) AS n_pairs
FROM pairs
GROUP BY w_a, w_b
ORDER BY n_pairs DESC, w_a, w_b
LIMIT {SKIPGRAM_TOP_K}
"""


@register("t15_skipgram_pairs", _T15_ORACLE)
def t15_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring (center, context) token pairs within a
    SKIPGRAM_WINDOW-token forward window — the pair-extraction step a
    word2vec/GloVe-style embedding trainer runs over the whole corpus.

    Pair generation is one nested codegen expression (sequence →
    transform → struct → flatten → explode): rows multiply by ~window
    per token with NO join and NO shuffle until the count aggregate, so
    the heavy fan-out stage runs at scan speed. The count is a two-phase
    hash aggregate (map-side combine absorbs each partition's repeats)
    and the top-k compiles to TakeOrderedAndProject with a total order
    (count desc, then both words) so both engines pick identical rows."""
    # fanout: the heavy pair fan-out otherwise runs in the scan's
    # partitioning — ONE task on the single-file test corpus (r11;
    # no-op at scale where the scan reads >= shuffle-width files)
    docs = fanout(table(spark, sf_dir, "documents"))
    toks = docs.select(T.tokenize(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, size(t) - 2), i ->
                      transform(sequence(1, least({SKIPGRAM_WINDOW}, size(t) - 1 - i)), j ->
                        struct(element_at(t, i + 1) AS w_a,
                               element_at(t, i + j + 1) AS w_b))))"""
            )
        ).alias("p")
    ).select("p.w_a", "p.w_b")
    return (
        pairs.groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "w_a", "w_b")
        .limit(SKIPGRAM_TOP_K)
    )


# ---------------------------------------------------------------------------
# t17 — PII detection + redaction (emails / phone numbers)
# ---------------------------------------------------------------------------

#: Cross-engine regexes (RE2-safe subset; Java and RE2 agree on these).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\b555-[0-9]{2,4}\\b"

_T17_ORACLE = f"""
WITH tagged AS (
  SELECT
    doc_id,
    'Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-01'
      || CAST(doc_id % 100 AS VARCHAR) || '. ' || text AS raw
  FROM documents
),
scrub AS (
  SELECT
    doc_id,
    len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS n_emails,
    len(regexp_extract_all(raw, '{_PII_PHONE}')) AS n_phones,
    regexp_replace(regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM tagged
)
SELECT
  doc_id,
  n_emails,
  n_phones,
  length(redacted) AS redacted_len,
  substr(redacted, 1, 40) AS redacted_head
FROM scrub
"""


@register("t17_pii_scrub", _T17_ORACLE)
def t17_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass every training-data
    pipeline runs before anything else. The synthetic corpus carries no
    PII (word-soup text, verified digit-free), so both engines first
    inject a deterministic contact line keyed by doc_id, then the
    operator under test finds (regexp_extract_all → count) and redacts
    (regexp_replace → '<EMAIL>'/'<PHONE>') with the SAME patterns — a
    RE2-safe regex subset on which Java regex (Spark, codegen'd JVM
    path) and RE2 (DuckDB) agree. Pure scan-side expressions: no
    shuffle, no Python worker; at 100 TB this runs at parquet-scan
    speed and the redacted column writes straight back out."""
    docs = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-01"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(". "),
        F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_PII_PHONE), 0)).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        F.substring(redacted, 1, 40).alias("redacted_head"),
    )


# ---------------------------------------------------------------------------
# t18 — token-distribution entropy (repetitiveness quality signal)
# ---------------------------------------------------------------------------

_T18_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
agg AS (
  SELECT doc_id, SUM(c) AS n_tokens, SUM(c * log2(c)) AS s_clog
  FROM cnt GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(log2(n_tokens) - s_clog / n_tokens, 9) AS token_entropy
FROM agg
"""


@register("t18_token_entropy", _T18_ORACLE)
def t18_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    quality signal that separates natural prose (high entropy) from
    boilerplate/keyword-stuffed/looping text (low entropy); used
    alongside the Gopher-style repetition fractions (t8) as a corpus
    filter. Computed as log2(N) - sum(c*log2 c)/N, which needs only two
    partially-aggregable sums per doc: explode → (doc, token) count →
    per-doc agg, two key shuffles both combiner-absorbed map-side.
    Rounded at 9 per the cross-engine float convention."""
    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.log2("c")).alias("s_clog"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log2("n_tokens") - F.col("s_clog") / F.col("n_tokens"), 9
        ).alias("token_entropy"),
    )


# ---------------------------------------------------------------------------
# t19 — vocabulary coverage / OOV rate against the corpus top-V vocab
# ---------------------------------------------------------------------------

VOCAB_V = 100

_T19_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
cf AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t FROM cf ORDER BY c DESC, t LIMIT {VOCAB_V})
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 9) AS oov_rate
FROM tok LEFT JOIN vocab v USING (t)
GROUP BY tok.doc_id
"""


@register("t19_oov_rate", _T19_ORACLE)
def t19_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a frequency-built
    vocabulary — the tokenizer-prep metric that tells you what a fixed
    top-V vocab would fail to cover, and the standard screen for docs
    that are mostly rare junk (high OOV ⇒ drop or route to byte-level
    fallback). Two phases: (1) corpus term frequencies (one combiner-
    absorbed shuffle) → top-V via TakeOrdered (V rows to the driver,
    deterministic count-desc/token-asc tie-break); (2) the V-row vocab
    broadcast-left-joins the token stream, so the per-doc coverage agg
    is the only other exchange. At 100 TB the vocab stays K-sized
    however big the corpus — nothing about phase 2 grows."""
    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(VOCAB_V)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "t", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 9
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# t21 — Zipf slope of the corpus token-frequency distribution
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 100

_T21_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents
),
cf AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
top AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk
  FROM cf ORDER BY c DESC, t LIMIT {ZIPF_TOP_N}
),
pts AS (
  SELECT CAST(ROUND(LN(rnk), 9) AS DECIMAL(28,10)) AS x,
         CAST(ROUND(LN(c), 9) AS DECIMAL(28,10)) AS y,
         CAST(ROUND(LN(rnk) * LN(rnk), 9) AS DECIMAL(28,10)) AS xx,
         CAST(ROUND(LN(rnk) * LN(c), 9) AS DECIMAL(28,10)) AS xy
  FROM top
)
SELECT COUNT(*) AS n_terms,
       ROUND(
         (COUNT(*) * CAST(SUM(xy) AS DOUBLE)
          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
         / (COUNT(*) * CAST(SUM(xx) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6)
         AS zipf_slope
FROM pts
"""


@register("t21_zipf_slope", _T21_ORACLE)
def t21_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zipf exponent of the corpus: OLS slope of log-frequency on
    log-rank over the top-{N} tokens — natural language sits near −1,
    and a corpus that drifts far from its historical slope has changed
    composition (template flooding pushes it flatter, dedup failures
    steeper); a one-number corpus-health tile next to prof1. Token
    counts reduce map-side; the top-N ranking is a TakeOrdered of the
    vocab (N rows to one partition — constant work); regression moments
    follow the repo's exact-decimal convention (each per-point term is
    one rounded double op, then DECIMAL sums, so association order
    cannot leak into the slope)."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    cf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = (
        cf.orderBy(F.col("c").desc(), "t")
        .limit(ZIPF_TOP_N)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "t")),
        )
    )
    dec = "decimal(28,10)"
    lx, ly = F.log(F.col("rnk")), F.log(F.col("c"))
    pts = top.select(
        F.round(lx, 9).cast(dec).alias("x"),
        F.round(ly, 9).cast(dec).alias("y"),
        F.round(lx * lx, 9).cast(dec).alias("xx"),
        F.round(lx * ly, 9).cast(dec).alias("xy"),
    )
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxx = F.sum("xx").cast("double")
    sxy = F.sum("xy").cast("double")
    return pts.agg(
        n.alias("n_terms"),
        F.round(
            (n * sxy - sx * sy) / (n * sxx - sx * sx), 6
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# t22 — Flesch-style readability (vowel-run syllable proxy)
# ---------------------------------------------------------------------------

_T22_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
),
syl AS (
  SELECT doc_id,
         COUNT(*) AS n_words,
         SUM(greatest(1, len(regexp_extract_all(w, '[aeiou]+'))))
           AS n_syllables
  FROM words GROUP BY doc_id
),
sent AS (
  SELECT doc_id,
         greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS n_sentences
  FROM documents
)
SELECT s.doc_id, n_words, CAST(n_syllables AS BIGINT) AS n_syllables,
       n_sentences,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
         AS flesch
FROM syl s JOIN sent USING (doc_id)
"""


@register("t22_readability", _T22_ORACLE)
def t22_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease with a vowel-run syllable proxy (each
    maximal [aeiou]+ run counts one syllable, minimum one per word) —
    the classic readability screen corpus curation uses to route text
    to grade-level buckets; exact syllabification is dictionary work,
    but the proxy preserves the ranking, and at 100 TB ranking is what
    the filter consumes. Integer counts all the way (explode → two
    combiner-absorbed aggregates sharing the doc key); the Flesch
    formula is a single chain of double ops on those integers, rounded
    at 6 — no accumulation-order exposure at all."""
    docs = table(spark, sf_dir, "documents")
    words = fanout(docs).select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w"),
    )
    syl = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(
            F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(F.col("w"), F.lit("[aeiou]+"), 0)),
            )
        ).alias("n_syllables"),
    )
    sent = docs.select(
        "doc_id",
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]"), 0)),
        ).alias("n_sentences"),
    )
    return syl.join(sent, "doc_id").select(
        "doc_id",
        "n_words",
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        "n_sentences",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (F.col("n_syllables").cast("double") / F.col("n_words")),
            6,
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# lab1 — weak supervision: labeling-function votes with abstain
# ---------------------------------------------------------------------------

_LAB1_ORACLE = """
WITH votes AS (
  SELECT doc_id,
         CASE WHEN text LIKE '%spark%' THEN 1
              WHEN text LIKE '%slow%' THEN 0 ELSE -1 END AS lf_keyword,
         CASE WHEN n_chars >= 400 THEN 1
              WHEN n_chars < 150 THEN 0 ELSE -1 END AS lf_length,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS lf_lang
  FROM documents
),
tallied AS (
  SELECT doc_id, lf_keyword, lf_length, lf_lang,
         (CASE WHEN lf_keyword = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf_length = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf_lang = 1 THEN 1 ELSE 0 END) AS pos,
         (CASE WHEN lf_keyword = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_length = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_lang = 0 THEN 1 ELSE 0 END) AS neg
  FROM votes
)
SELECT doc_id, pos, neg,
       CASE WHEN pos > neg THEN 1 WHEN neg > pos THEN 0 ELSE -1 END
         AS weak_label
FROM tallied
"""


@register("lab1_weak_labels", _LAB1_ORACLE)
def lab1_weak_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision (Snorkel-style): three labeling functions —
    keyword, length, language — each voting positive / negative /
    ABSTAIN (-1), majority-resolved per document with ties left
    abstaining. This is how training labels are manufactured at corpus
    scale when human annotation can't keep up: rules are cheap,
    abstention is explicit, and the downstream label model consumes
    the vote matrix (here the resolved majority plus the tallies, so
    the matrix is auditable). Pure scan-side CASE expressions — zero
    shuffles, label generation at parquet-scan speed."""
    docs = table(spark, sf_dir, "documents")
    lf_keyword = (
        F.when(F.col("text").contains("spark"), 1)
        .when(F.col("text").contains("slow"), 0)
        .otherwise(-1)
    )
    lf_length = (
        F.when(F.col("n_chars") >= 400, 1)
        .when(F.col("n_chars") < 150, 0)
        .otherwise(-1)
    )
    lf_lang = F.when(F.col("lang") == "en", 1).otherwise(-1)
    votes = docs.select(
        "doc_id",
        lf_keyword.alias("lf_keyword"),
        lf_length.alias("lf_length"),
        lf_lang.alias("lf_lang"),
    )
    def tally(target: int) -> F.Column:
        return sum(
            F.when(F.col(c) == target, 1).otherwise(0)
            for c in ("lf_keyword", "lf_length", "lf_lang")
        )
    tallied = votes.select(
        "doc_id",
        tally(1).alias("pos"),
        tally(0).alias("neg"),
    )
    return tallied.select(
        "doc_id",
        "pos",
        "neg",
        F.when(F.col("pos") > F.col("neg"), 1)
        .when(F.col("neg") > F.col("pos"), 0)
        .otherwise(-1)
        .alias("weak_label"),
    )


# ---------------------------------------------------------------------------
# lab2 — labeling-function diagnostics: coverage / overlap / conflict
# ---------------------------------------------------------------------------

_LAB2_ORACLE = """
WITH votes AS (
  SELECT doc_id,
         CASE WHEN text LIKE '%spark%' THEN 1
              WHEN text LIKE '%slow%' THEN 0 ELSE -1 END AS lf_keyword,
         CASE WHEN n_chars >= 400 THEN 1
              WHEN n_chars < 150 THEN 0 ELSE -1 END AS lf_length,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS lf_lang
  FROM documents
),
per_doc AS (
  SELECT doc_id, lf_keyword, lf_length, lf_lang,
         (CASE WHEN lf_keyword <> -1 THEN 1 ELSE 0 END
          + CASE WHEN lf_length <> -1 THEN 1 ELSE 0 END
          + CASE WHEN lf_lang <> -1 THEN 1 ELSE 0 END) AS n_voting,
         (CASE WHEN lf_keyword = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf_length = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf_lang = 1 THEN 1 ELSE 0 END) AS pos,
         (CASE WHEN lf_keyword = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_length = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_lang = 0 THEN 1 ELSE 0 END) AS neg
  FROM votes
),
lf AS (
  SELECT 'lf_keyword' AS lf, lf_keyword AS vote, n_voting, pos, neg FROM per_doc
  UNION ALL
  SELECT 'lf_length', lf_length, n_voting, pos, neg FROM per_doc
  UNION ALL
  SELECT 'lf_lang', lf_lang, n_voting, pos, neg FROM per_doc
)
SELECT lf,
       CAST(SUM(CASE WHEN vote <> -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(SUM(CASE WHEN vote <> -1 AND n_voting >= 2 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN vote <> -1 AND pos > 0 AND neg > 0 THEN 1 ELSE 0
         END) AS BIGINT) AS n_conflict
FROM lf GROUP BY lf
"""


@register("lab2_lf_diagnostics", _LAB2_ORACLE)
def lab2_lf_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeling-function report card that decides which rules stay
    in the weak-supervision ensemble: per LF, coverage (how often it
    votes), overlap (votes alongside another LF — required for the
    label model to estimate its accuracy), and conflict (votes where
    the rule set disagrees — where denoising happens). Shares lab1's
    vote expressions verbatim; the LF-major unpivot is a 3× scan-side
    union and the report is one |LF|-row aggregate. At corpus scale
    this is the cheap nightly job that watches rule drift."""
    docs = table(spark, sf_dir, "documents")
    lf_keyword = (
        F.when(F.col("text").contains("spark"), 1)
        .when(F.col("text").contains("slow"), 0)
        .otherwise(-1)
    )
    lf_length = (
        F.when(F.col("n_chars") >= 400, 1)
        .when(F.col("n_chars") < 150, 0)
        .otherwise(-1)
    )
    lf_lang = F.when(F.col("lang") == "en", 1).otherwise(-1)
    votes = docs.select(
        "doc_id",
        lf_keyword.alias("lf_keyword"),
        lf_length.alias("lf_length"),
        lf_lang.alias("lf_lang"),
    )
    cols = ("lf_keyword", "lf_length", "lf_lang")

    def tally(target: int) -> "F.Column":
        return sum(
            F.when(F.col(c) == target, 1).otherwise(0) for c in cols
        )

    per_doc = votes.select(
        "doc_id",
        *cols,
        sum(
            F.when(F.col(c) != -1, 1).otherwise(0) for c in cols
        ).alias("n_voting"),
        tally(1).alias("pos"),
        tally(0).alias("neg"),
    )
    unions = None
    for c in cols:
        part = per_doc.select(
            F.lit(c).alias("lf"),
            F.col(c).alias("vote"),
            "n_voting",
            "pos",
            "neg",
        )
        unions = part if unions is None else unions.unionAll(part)
    voting = F.col("vote") != -1
    return unions.groupBy("lf").agg(
        F.sum(F.when(voting, 1).otherwise(0)).alias("n_covered"),
        F.sum(
            F.when(voting & (F.col("n_voting") >= 2), 1).otherwise(0)
        ).alias("n_overlap"),
        F.sum(
            F.when(voting & (F.col("pos") > 0) & (F.col("neg") > 0), 1)
            .otherwise(0)
        ).alias("n_conflict"),
    )


# ---------------------------------------------------------------------------
# t23 — tokenizer fertility per language
# ---------------------------------------------------------------------------

_T23_ORACLE = f"""
WITH per AS (
  SELECT lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_ws,
         len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe,
         length(text) AS n_chars
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_ws) AS BIGINT) AS total_words,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS BIGINT) AS fertility,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS BIGINT)
         AS chars_per_bpe
FROM per
GROUP BY lang
"""


@register("t23_tokenizer_fertility", _T23_ORACLE)
def t23_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE tokens per whitespace word) and
    compression (chars per BPE token) per language — the standard
    multilingual tokenizer-health report: a language whose fertility
    runs far above the corpus norm pays more context budget per word
    and trains on fewer effective words per token (the metric
    motivating vocabulary rebalancing in multilingual models). Uses
    t5's two segmentations so the numbers are consistent with the
    registered token-cost operator.

    Determinism: integer token counts sum exactly; the two ratios are
    single IEEE divisions of exact integers — bit-identical across
    engines with no rounding step (t5's chars_per_token precedent).
    Scale: scan-side regex counts, one map-side-combinable aggregate
    keyed by lang; nothing corpus-sized moves."""
    docs = fanout(table(spark, sf_dir, "documents"))
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    )
    per = docs.select(
        "lang",
        n_ws.alias("n_ws"),
        n_bpe.alias("n_bpe"),
        F.length("text").alias("n_chars"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("total_words"),
        F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        (
            F.sum("n_bpe").cast("double") / F.sum("n_ws").cast("bigint")
        ).alias("fertility"),
        (
            F.sum("n_chars").cast("double") / F.sum("n_bpe").cast("bigint")
        ).alias("chars_per_bpe"),
    )


# ---------------------------------------------------------------------------
# lab3 — inter-annotator agreement (Cohen's kappa) between labeling functions
# ---------------------------------------------------------------------------

_LAB3_ORACLE = """
WITH votes AS (
  SELECT lang,
         CASE WHEN text LIKE '%spark%' THEN 1
              WHEN text LIKE '%slow%' THEN 0 ELSE -1 END AS a,
         CASE WHEN n_chars >= 400 THEN 1
              WHEN n_chars < 150 THEN 0 ELSE -1 END AS b
  FROM documents
),
both_vote AS (
  SELECT lang, a, b FROM votes WHERE a <> -1 AND b <> -1
),
cells AS (
  SELECT lang,
         COUNT(*) AS n,
         SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree,
         SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS a1,
         SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS b1
  FROM both_vote GROUP BY lang
)
SELECT lang,
       CAST(n AS BIGINT) AS n_both,
       CAST(agree AS BIGINT) AS n_agree,
       CAST(agree AS DOUBLE) / n AS po,
       CAST(n * agree - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
         / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE) AS kappa
FROM cells
"""


@register("lab3_annotator_agreement", _LAB3_ORACLE)
def lab3_annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement between two of lab1's labeling
    functions (keyword vs length), per language, on the documents where
    BOTH vote: observed agreement po and chance-corrected Cohen's
    kappa. This is the diagnostic lab2's coverage/conflict counts can't
    give — conflict says the functions disagree, kappa says whether
    their agreement is better than the marginals alone would produce
    (kappa ~ 0 means the "agreement" is coincidence and one function is
    adding no information; a per-language breakdown catches rules that
    only work in English).

    Exactness: the 2x2 contingency cells are exact integer sums; kappa
    is computed on the common denominator — kappa = (N*agree - pe_num)
    / (N^2 - pe_num) with pe_num = a1*b1 + a0*b0 — so both engines
    divide the identical exact BIGINTs once (EXACT_DOUBLE_OK; no
    ROUND-tie seam).

    Scale shape: label votes are scan-side CASE expressions (lab1's
    plan); one combiner-absorbed groupBy on lang — a single exchange
    bounded by the language domain at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    a = (
        F.when(F.col("text").contains("spark"), 1)
        .when(F.col("text").contains("slow"), 0)
        .otherwise(-1)
    )
    b = (
        F.when(F.col("n_chars") >= 400, 1)
        .when(F.col("n_chars") < 150, 0)
        .otherwise(-1)
    )
    votes = docs.select("lang", a.alias("a"), b.alias("b")).filter(
        (F.col("a") != -1) & (F.col("b") != -1)
    )
    cells = votes.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0)).alias("agree"),
        F.sum(F.when(F.col("a") == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("b") == 1, 1).otherwise(0)).alias("b1"),
    )
    pe_num = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    return cells.select(
        "lang",
        F.col("n").cast("bigint").alias("n_both"),
        F.col("agree").cast("bigint").alias("n_agree"),
        (F.col("agree").cast("double") / F.col("n")).alias("po"),
        (
            (F.col("n") * F.col("agree") - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double")
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# t24 — lexical diversity (type-token ratio and hapax share) per language
# ---------------------------------------------------------------------------

_T24_ORACLE = r"""
WITH tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
),
cf AS (SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY lang, t),
m AS (
  SELECT lang,
         COUNT(*) AS v,
         SUM(c) AS n_tok,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax
  FROM cf GROUP BY lang
)
SELECT lang,
       CAST(v AS BIGINT) AS vocab,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(hapax AS BIGINT) AS n_hapax,
       CAST(v AS DOUBLE) / CAST(n_tok AS DOUBLE) AS ttr,
       CAST(hapax AS DOUBLE) / CAST(v AS DOUBLE) AS hapax_frac
FROM m
"""


@register("t24_lexical_diversity", _T24_ORACLE)
def t24_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: vocabulary size, corpus token
    count, hapax legomena count (tokens occurring exactly once), and
    the two ratios a corpus curator reads off them — type-token ratio
    (template/boilerplate corpora collapse toward 0) and hapax share
    of the vocabulary (natural language sits near 0.4-0.6 by Zipf's
    law; a scrape full of serial numbers or OCR noise drifts toward
    1.0, a tiny fixed template toward 0). t21's Zipf slope fits the
    head of the frequency distribution; this reads the tail.

    Exactness: all three counts are exact integers off one token-
    frequency aggregate (t21's whitespace-token contract); ttr and
    hapax_frac are each ONE IEEE division of two exact BIGINTs
    (EXACT_DOUBLE_OK).

    Scale shape: explode -> (lang, token) combiner-absorbed groupBy
    (the map side absorbs duplicate tokens within a partition), then a
    vocabulary-bounded second aggregate per language; nothing but the
    16-byte-ish token keys ever shuffles, and the output is bounded by
    the language domain."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    )
    cf = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    m = cf.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("c").alias("n_tok"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
    )
    return m.select(
        "lang",
        F.col("v").cast("bigint").alias("vocab"),
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        F.col("hapax").cast("bigint").alias("n_hapax"),
        (F.col("v").cast("double") / F.col("n_tok").cast("double")).alias(
            "ttr"
        ),
        (F.col("hapax").cast("double") / F.col("v").cast("double")).alias(
            "hapax_frac"
        ),
    )


# ---------------------------------------------------------------------------
# t25 — Heaps'-law vocabulary-growth fit
# ---------------------------------------------------------------------------

#: doc_id-bucket width (doc_id >> 8) for the corpus-order prefix sums —
#: a pure performance knob (value-invariant; same discipline as
#: KS_BUCKET_SHIFT): per-bucket offsets get a tiny running window,
#: per-doc cumulatives are PARTITIONED BY bucket.
HEAPS_BUCKET_SHIFT = 8

_T25_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
per_tok AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
firsts AS (SELECT t, MIN(doc_id) AS fd FROM tok GROUP BY t),
per_new AS (SELECT fd AS doc_id, COUNT(*) AS n_new FROM firsts GROUP BY fd),
per AS (
  SELECT p.doc_id, p.n_tok, COALESCE(n.n_new, 0) AS n_new
  FROM per_tok p LEFT JOIN per_new n USING (doc_id)
),
cum AS (
  SELECT SUM(n_tok) OVER (ORDER BY doc_id) AS ct,
         SUM(n_new) OVER (ORDER BY doc_id) AS cv
  FROM per
),
pts AS (
  SELECT CAST(ROUND(LN(ct), 9) AS DECIMAL(28,10)) AS x,
         CAST(ROUND(LN(cv), 9) AS DECIMAL(28,10)) AS y,
         CAST(ROUND(LN(ct) * LN(ct), 9) AS DECIMAL(28,10)) AS xx,
         CAST(ROUND(LN(ct) * LN(cv), 9) AS DECIMAL(28,10)) AS xy
  FROM cum
),
fit AS (
  SELECT COUNT(*) AS n_docs,
         (COUNT(*) * CAST(SUM(xy) AS DOUBLE)
          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
         / (COUNT(*) * CAST(SUM(xx) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS beta,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x) AS DOUBLE) AS sx
  FROM pts
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       (SELECT CAST(SUM(n_tok) AS BIGINT) FROM per) AS total_tokens,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts) AS vocab,
       ROUND(beta, 6) AS heaps_beta,
       ROUND((sy - beta * sx) / n_docs, 6) AS heaps_log_k
FROM fit
"""


@register("t25_heaps_law", _T25_ORACLE)
def t25_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) ~ K * N^beta of vocabulary growth against
    cumulative corpus size in corpus (doc_id) order — the scaling law
    that says how fast NEW types keep arriving as the corpus grows.
    It answers two curation questions t21/t24 can't: how large a
    tokenizer vocabulary a planned corpus size will want (extrapolate
    V(N)), and whether ingest has gone stale (beta collapsing toward 0
    means new batches add tokens but no new vocabulary — template or
    duplicate flooding; natural text sits near beta ~ 0.5).

    Exactness: the per-doc cumulative token/vocab counts are exact
    integers; each regression point contributes one rounded-LN term
    (t21's log-lattice discipline: ROUND(LN(int), 9) cast to DECIMAL,
    then decimal sums, so association order cannot leak); beta and
    log-K are fixed IEEE chains over those exact sums, ROUND-wrapped
    only at the output.

    Scale shape: token explode reduces to the per-doc count and the
    vocabulary first-occurrence table (both combiner-absorbed, one
    shuffle each); the corpus-order running totals use the repo's
    TWO-LEVEL prefix sum (per-bucket offsets over doc_id >> 8
    broadcast back; per-doc window PARTITIONED BY bucket — never a
    global single-partition window); the OLS moments collapse
    map-side to one row. Nothing driver-side, nothing corpus²."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    )
    per_tok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    per_new = firsts.groupBy("fd").agg(F.count(F.lit(1)).alias("n_new"))
    per = (
        per_tok.join(
            per_new, per_tok["doc_id"] == per_new["fd"], "left_outer"
        )
        .select(
            "doc_id",
            "n_tok",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .withColumn("bkt", F.shiftright("doc_id", HEAPS_BUCKET_SHIFT))
        .localCheckpoint(eager=True)  # feeds offsets + cumulative + totals
    )
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        per.groupBy("bkt")
        .agg(F.sum("n_tok").alias("tt"), F.sum("n_new").alias("tv"))
        .select(
            "bkt",
            F.coalesce(F.sum("tt").over(w_bkt), F.lit(0)).alias("off_t"),
            F.coalesce(F.sum("tv").over(w_bkt), F.lit(0)).alias("off_v"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.join(F.broadcast(offsets), "bkt").select(
        (F.col("off_t") + F.sum("n_tok").over(w_in)).alias("ct"),
        (F.col("off_v") + F.sum("n_new").over(w_in)).alias("cv"),
    )
    dec = "decimal(28,10)"
    lt, lv = F.log(F.col("ct")), F.log(F.col("cv"))
    pts = cum.select(
        F.round(lt, 9).cast(dec).alias("x"),
        F.round(lv, 9).cast(dec).alias("y"),
        F.round(lt * lt, 9).cast(dec).alias("xx"),
        F.round(lt * lv, 9).cast(dec).alias("xy"),
    )
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxx = F.sum("xx").cast("double")
    sxy = F.sum("xy").cast("double")
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    totals = per.agg(
        F.sum("n_tok").cast("bigint").alias("total_tokens")
    )
    vocab = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    fit = pts.agg(
        n.cast("bigint").alias("n_docs"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round((sy - beta * sx) / n, 6).alias("heaps_log_k"),
    )
    return (
        fit.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vocab))
        .select(
            "n_docs", "total_tokens", "vocab", "heaps_beta", "heaps_log_k"
        )
    )


# ---------------------------------------------------------------------------
# t26 — vocabulary coverage curve (token mass covered by the top-K types)
# ---------------------------------------------------------------------------

#: coverage checkpoints — candidate tokenizer vocabulary sizes.
COVERAGE_KS = (10, 100, 1000, 10000)

_T26_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents
),
cf AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab FROM cf),
ks AS (
  {' UNION ALL '.join(f'''SELECT {k} AS k,
    (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM
      (SELECT c FROM cf ORDER BY c DESC, t LIMIT {k}) s) AS covered_tokens'''
      for k in COVERAGE_KS)}
)
SELECT k, covered_tokens, total_tokens, vocab,
       ROUND(CAST(covered_tokens AS DOUBLE) / total_tokens, 9) AS coverage
FROM ks CROSS JOIN tot
"""


@register("t26_ngram_coverage", _T26_ORACLE)
def t26_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary coverage curve: what fraction of the corpus's
    TOKEN MASS the top-K most frequent types cover, at candidate
    tokenizer vocabulary sizes K — the direct answer to "how big a
    vocab do we need" that t19's OOV rate (one fixed V) and t25's
    Heaps fit (growth law) bracket from either side. A curve that
    saturates early says a small vocab + byte-fallback suffices; a
    flat tail says the corpus is vocabulary-hungry (multilingual or
    code-heavy mixes).

    Exactness: counts are exact integers; each checkpoint's top-K set
    is a total order (count desc, token asc); coverage is one IEEE
    division ROUND-wrapped at the output.

    Scale shape: ONE combiner-absorbed token count builds the
    vocabulary table (persisted — it feeds every checkpoint and the
    totals); each checkpoint is a TakeOrderedAndProject of K rows plus
    a 1-row sum — K-bounded work per checkpoint, never a global sort;
    the 1-row totals frame broadcasts in (BNLJ-gated pattern)."""
    from pyspark import StorageLevel

    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    cf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cf.count()  # one vocabulary build feeds all checkpoints + totals
    tot = cf.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    parts = []
    for k in COVERAGE_KS:
        topk = cf.orderBy(F.col("c").desc(), "t").limit(k)
        parts.append(
            topk.agg(
                F.lit(k).cast("bigint").alias("k"),
                F.coalesce(F.sum("c"), F.lit(0))
                .cast("bigint")
                .alias("covered_tokens"),
            )
        )
    ks = parts[0]
    for p in parts[1:]:
        ks = ks.unionByName(p)
    return ks.crossJoin(F.broadcast(tot)).select(
        "k",
        "covered_tokens",
        "total_tokens",
        "vocab",
        F.round(
            F.col("covered_tokens").cast("double") / F.col("total_tokens"), 9
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# t27 — BPE tokenizer LEARNING (iterative merges, not just pair stats)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 4  # learned merges (unrolled in the oracle, pi2's lesson)


def _bpe_cte_chain() -> str:
    """The shared WITH-chain (v0..v{BPE_ROUNDS} spelling evolution)
    used by t27's trajectory oracle and t30's encoder oracle — one
    source of truth for the learned merges on the SQL side, mirroring
    :func:`_bpe_spellings` on the Spark side."""
    head = f"""WITH toks AS (
  SELECT unnest({T.sql_tokenize('text')}) AS w FROM documents
),
vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
v0 AS MATERIALIZED (
  SELECT w, freq,
         array_to_string(list_transform(generate_series(1, len(w)),
                                         i -> w[i]), ' ') AS s
  FROM vocab
)"""
    steps = [head]
    for r in range(1, BPE_ROUNDS + 1):
        p = r - 1
        steps.append(f"""pc{r} AS (
  SELECT a[i] || ' ' || a[i+1] AS pair, SUM(freq) AS cnt
  FROM (SELECT freq, string_split(s, ' ') AS a FROM v{p}) t,
       unnest(generate_series(1, len(a) - 1)) AS u(i)
  GROUP BY 1
),
best{r} AS MATERIALIZED (
  SELECT pair, cnt FROM pc{r} ORDER BY cnt DESC, pair LIMIT 1
),
pos{r} AS (
  SELECT w, freq, i, a[i] AS sym,
         CASE WHEN i < len(a) THEN a[i+1] END AS nxt,
         i < len(a)
           AND a[i] || ' ' || a[i+1] = (SELECT pair FROM best{r}) AS m
  FROM (SELECT w, freq, string_split(s, ' ') AS a FROM v{p}) t,
       unnest(generate_series(1, len(a))) AS u(i)
),
mk{r} AS (
  SELECT *, CASE WHEN m THEN
      SUM(CASE WHEN m THEN 1 ELSE 0 END)
        OVER (PARTITION BY w ORDER BY i) END AS k
  FROM pos{r}
),
act{r} AS (
  SELECT *, m AND (k - MIN(k) OVER (PARTITION BY w, isl)) % 2 = 0 AS active
  FROM (SELECT *, CASE WHEN m THEN i - k END AS isl FROM mk{r}) t
),
em{r} AS (
  SELECT w, freq, i,
         CASE WHEN active THEN sym || nxt
              WHEN LAG(active) OVER (PARTITION BY w ORDER BY i) THEN NULL
              ELSE sym END AS esym
  FROM act{r}
),
v{r} AS MATERIALIZED (
  SELECT w, freq, string_agg(esym, ' ' ORDER BY i) AS s
  FROM em{r} WHERE esym IS NOT NULL GROUP BY w, freq
)""")
    return ",\n".join(steps)


def _t27_oracle() -> str:
    rows = []
    for r in range(1, BPE_ROUNDS + 1):
        p = r - 1
        rows.append(
            f"SELECT {r} AS round,"
            f" (SELECT pair FROM best{r}) AS merged_pair,"
            f" (SELECT CAST(cnt AS BIGINT) FROM best{r}) AS weighted_count,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM v{r} n"
            f"   JOIN v{p} o USING (w) WHERE n.s <> o.s)"
            f"   AS n_spellings_changed,"
            f" (SELECT CAST(SUM(freq * len(string_split(s, ' '))) AS BIGINT)"
            f"   FROM v{r}) AS total_symbols"
        )
    return (
        _bpe_cte_chain()
        + "\nSELECT CAST(round AS INTEGER) AS round, merged_pair,"
        " weighted_count, n_spellings_changed, total_symbols FROM ("
        + " UNION ALL ".join(rows)
        + ") trail"
    )


def _bpe_spellings(
    spark: SparkSession, sf_dir: str
) -> "tuple[list[DataFrame], list[tuple]]":
    """(v0..vN spelling frames (w, freq, s), per-round stat tuples
    (pair, cnt, n_changed, total_symbols)). Each vr is eagerly
    localCheckpointed (cc-family O(1)-lineage discipline).

    Per round exactly TWO jobs run: the 1-row best-merge winner is
    collected directly (it is needed on the driver anyway — its pair
    string parameterizes the merge application, injected as a literal
    instead of the former crossJoin-broadcast whose build job re-ran
    the pair count), and the round's trajectory stats ride the
    spelling checkpoint via df.observe (the former shape ran a third
    job joining consecutive vocab frames per round)."""
    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    docs = fanout(table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    spell0 = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        " ",
    )
    frames = [
        vocab.select("w", "freq", spell0.alias("s")).localCheckpoint(
            eager=True
        )
    ]
    stats: list = []
    w_cum = (
        Window.partitionBy("w")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_seq = Window.partitionBy("w").orderBy("i")
    for _ in range(BPE_ROUNDS):
        prev = frames[-1]
        base = prev.select(
            "w", "freq", F.col("s").alias("old_s"), F.split("s", " ").alias("a")
        )
        pair_idx = F.when(
            F.size("a") >= 2, F.sequence(F.lit(1), F.size("a") - 1)
        ).otherwise(F.array().cast("array<int>"))
        best_rows = (
            base.select("freq", "a", F.explode(pair_idx).alias("i"))
            .select(
                "freq",
                F.concat_ws(
                    " ",
                    F.element_at("a", F.col("i")),
                    F.element_at("a", F.col("i") + 1),
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not best_rows:
            # degenerate corpus (empty vocabulary / no adjacent pairs):
            # the merge is a no-op; keep the spelling frame and mirror
            # t27's NULL-pair stat row
            stats.append((None, None, 0, None))
            frames.append(prev)
            continue
        bp = best_rows[0]["pair"]
        pos = (
            base.select(
                "w", "freq", "old_s", "a",
                F.explode(F.sequence(F.lit(1), F.size("a"))).alias("i"),
            )
            .select(
                "w", "freq", "old_s", "i",
                F.element_at("a", F.col("i")).alias("sym"),
                F.when(
                    F.col("i") < F.size("a"),
                    F.element_at("a", F.col("i") + 1),
                ).alias("nxt"),
            )
            .withColumn(
                "m",
                F.col("nxt").isNotNull()
                & (F.concat_ws(" ", "sym", "nxt") == F.lit(bp)),
            )
        )
        pos = pos.withColumn(
            "k",
            F.when(F.col("m"), F.sum(F.col("m").cast("int")).over(w_cum)),
        ).withColumn("isl", F.when(F.col("m"), F.col("i") - F.col("k")))
        w_isl = Window.partitionBy("w", "isl")
        pos = pos.withColumn(
            "active",
            F.col("m")
            & (((F.col("k") - F.min("k").over(w_isl)) % 2) == 0),
        ).withColumn(
            "esym",
            F.when(F.col("active"), F.concat(F.col("sym"), F.col("nxt")))
            .when(F.lag("active").over(w_seq), F.lit(None))
            .otherwise(F.col("sym")),
        )
        obs = Observation()
        nxt_frame = (
            pos.filter(F.col("esym").isNotNull())
            .groupBy("w", "freq", "old_s")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("i", "esym"))
                        ),
                        lambda x: x["esym"],
                    ),
                    " ",
                ).alias("s")
            )
            .observe(
                obs,
                F.sum(
                    (F.col("s") != F.col("old_s")).cast("int")
                ).alias("changed"),
                F.sum(
                    F.col("freq") * F.size(F.split("s", " "))
                ).alias("total"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(nxt_frame)
        stats.append(
            (
                bp,
                int(best_rows[0]["cnt"]),
                int(obs.get["changed"]),
                int(obs.get["total"]),
            )
        )
    return frames, stats


@register("t27_bpe_learn", _t27_oracle())
def t27_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING as a Spark job: starting from character
    spellings of the corpus vocabulary, learn BPE_ROUNDS merges — each
    round counts adjacent symbol pairs weighted by word frequency,
    merges the (count DESC, pair ASC) winner with the standard greedy
    leftmost-non-overlapping rule, and reports (merge, its count at
    selection time, spellings changed, total weighted corpus symbols
    after the merge). The trajectory IS the tokenizer: t12 showed the
    first merge candidates; t27 actually trains, and the shrinking
    total_symbols column is the compression curve a tokenizer team
    watches (t23 measures fertility of a FIXED tokenizer; t27 builds
    one). At production scale this loop over the frequency-weighted
    VOCABULARY (never the raw token stream) is exactly how BPE is
    trained on a 100 TB corpus: the corpus is touched once.

    Exactness: counts are exact integers and the merge winner is an
    exact order statistic; greedy non-overlap ("xxx" + merge (x,x) →
    [xx, x]) is implemented identically in both engines as window
    parity — match runs become islands (i - cumulative-match-rank) and
    a match is APPLIED iff its rank parity within the island is even —
    so every spelling, and therefore every later round, is
    bit-identical. The oracle unrolls the same rounds as MATERIALIZED
    CTEs (pi2's lesson).

    Scale shape: one corpus scan builds the word-frequency table; each
    round is bounded by vocabulary size — a map-side-combinable pair
    count, a 1-row winner (collected and re-injected as a literal), and three windows whose
    partitions are single WORDS (bounded by word length). Spellings are
    eagerly localCheckpointed per round. Nothing corpus-sized shuffles
    after the first aggregate."""
    _frames, stats = _bpe_spellings(spark, sf_dir)
    # the trajectory stats rode each round's spelling-checkpoint job
    # via df.observe (no per-round join or extra collect here)
    out_rows = [
        (r, pair, cnt, changed, total)
        for r, (pair, cnt, changed, total) in enumerate(stats, start=1)
    ]
    return local_rows_df(
        spark,
        out_rows,
        "round int, merged_pair string, weighted_count long,"
        " n_spellings_changed long, total_symbols long",
    )


# ---------------------------------------------------------------------------
# t28 — TextRank keyword extraction (scaled-integer PageRank over the
#       word co-occurrence graph)
# ---------------------------------------------------------------------------

TEXTRANK_SCALE = 10 ** 9
TEXTRANK_ROUNDS = 4
TEXTRANK_TOP_K = 10


def _tr_halfup(a: str, b: str) -> str:
    return f"((2 * ({a}) + ({b})) // (2 * ({b})))"


def _t28_oracle() -> str:
    s = TEXTRANK_SCALE
    steps = [f"""toks AS (
  SELECT doc_id, {T.sql_tokenize('text')} AS w FROM documents
),
bigrams AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                i -> {{'a': w[i], 'b': w[i+1]}})) AS bg
  FROM toks
),
bg_counts AS (
  SELECT bg.a AS a, bg.b AS b, COUNT(*) AS n
  FROM bigrams WHERE bg.a <> bg.b GROUP BY bg.a, bg.b
),
dir AS MATERIALIZED (
  SELECT u, v, CAST(SUM(n) AS BIGINT) AS n FROM (
    SELECT a AS u, b AS v, n FROM bg_counts
    UNION ALL
    SELECT b AS u, a AS v, n FROM bg_counts
  ) GROUP BY u, v
),
deg AS (SELECT u, CAST(SUM(n) AS BIGINT) AS w_u FROM dir GROUP BY u),
q AS MATERIALIZED (
  SELECT dir.u, dir.v, {_tr_halfup(f'dir.n * {s}', 'deg.w_u')} AS q
  FROM dir JOIN deg ON deg.u = dir.u
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
r0 AS MATERIALIZED (
  SELECT u AS t, CAST({s} // (SELECT n_nodes FROM nn) AS BIGINT) AS r
  FROM deg
)"""]
    for k in range(1, TEXTRANK_ROUNDS + 1):
        p = k - 1
        steps.append(f"""r{k} AS MATERIALIZED (
  SELECT q.v AS t,
         {_tr_halfup(f'15 * CAST({s} AS BIGINT)',
                     '100 * (SELECT n_nodes FROM nn)')}
         + {_tr_halfup(
             f"85 * CAST(SUM({_tr_halfup(f'q.q * r{p}.r', str(s))}) AS BIGINT)",
             '100',
         )} AS r
  FROM q JOIN r{p} ON r{p}.t = q.u
  GROUP BY q.v
)""")
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT t AS word,
       CAST(r AS BIGINT) AS rank_scaled,
       CAST(r AS DOUBLE) / {s} AS rank
FROM r{TEXTRANK_ROUNDS}
ORDER BY r DESC, t
LIMIT {TEXTRANK_TOP_K}
"""
    )


@register("t28_textrank_keywords", _t28_oracle())
def t28_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau EMNLP'04): PageRank
    over the word co-occurrence graph — nodes are content tokens, edges
    are adjacent-pair counts symmetrized, and four damped power-
    iteration rounds rank the words most central to the corpus's
    phrase structure. The standard unsupervised keyword/keyphrase
    baseline a labeling pipeline runs before paying for a model.

    Exactness: the cc3/e24 half-up scaled-integer protocol — row-
    normalized transition weights and ranks live in 1e-9 fixed-point
    BIGINTs, the damping mix is integer arithmetic ((15·S)/(100·N) +
    (85·contrib)/100, each an explicit half-up), and q·r products stay
    under 2^63, so the walk and the final (rank desc, word) top-k
    selection are bit-identical across engines; the display rank is
    ONE exact division.

    Scale shape: t11's single exploded pass builds the bigram counts
    (adjacent-pair structs in-array JVM-side); everything after runs on
    the vocabulary-bounded edge table — O(edges) per round regardless
    of corpus size, with O(1) lineage via per-round eager checkpoints;
    the top-k compiles to TakeOrderedAndProject."""
    s = TEXTRANK_SCALE
    docs = fanout(table(spark, sf_dir, "documents"))
    toks = docs.select(T.tokenize(F.col("text")).alias("w"))
    size = F.size(F.col("w"))
    idx = F.when(size >= 2, F.sequence(F.lit(1), size - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("w"), i).alias("a"),
                    F.element_at(F.col("w"), i + 1).alias("b"),
                ),
            )
        ).alias("bg")
    )
    bg_counts = (
        bigrams.filter(F.col("bg.a") != F.col("bg.b"))
        .groupBy(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dir_ = (
        bg_counts.select(F.col("a").alias("u"), F.col("b").alias("v"), "n")
        .unionAll(
            bg_counts.select(
                F.col("b").alias("u"), F.col("a").alias("v"), "n"
            )
        )
        .groupBy("u", "v")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    deg = dir_.groupBy("u").agg(F.sum("n").cast("bigint").alias("w_u"))
    q = (
        dir_.join(deg, "u")
        .select(
            "u",
            "v",
            F.expr(f"(2 * n * {s} + w_u) div (2 * w_u)").alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        # degenerate corpus (no adjacent distinct-token pair anywhere):
        # the oracle's final select over the empty rank table yields
        # zero rows — mirror it instead of crashing on SCALE // 0
        return spark.createDataFrame(
            [], "word string, rank_scaled long, rank double"
        )
    base = (2 * 15 * s + 100 * n_nodes) // (2 * 100 * n_nodes)
    r = deg.select(
        F.col("u").alias("t"),
        F.lit(s // n_nodes).cast("bigint").alias("r"),
    ).localCheckpoint(eager=True)
    for _ in range(TEXTRANK_ROUNDS):
        r = (
            q.join(r, q["u"] == r["t"])
            .select(
                "v",
                F.expr(f"(2 * q * r + {s}) div (2 * {s})").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").cast("bigint").alias("contrib"))
            .select(
                F.col("v").alias("t"),
                (
                    F.lit(base).cast("bigint")
                    + F.expr("(2 * 85 * contrib + 100) div (2 * 100)")
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        r.orderBy(F.col("r").desc(), "t")
        .limit(TEXTRANK_TOP_K)
        .select(
            F.col("t").alias("word"),
            F.col("r").cast("bigint").alias("rank_scaled"),
            (F.col("r").cast("double") / F.lit(float(s))).alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# lab4 — Dawid–Skene-style ability-weighted consensus over the LF votes
# ---------------------------------------------------------------------------

_LAB4_ORACLE = """
WITH votes AS (
  SELECT doc_id,
         CASE WHEN text LIKE '%spark%' THEN 1
              WHEN text LIKE '%slow%' THEN 0 ELSE -1 END AS lf_keyword,
         CASE WHEN n_chars >= 400 THEN 1
              WHEN n_chars < 150 THEN 0 ELSE -1 END AS lf_length,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS lf_lang
  FROM documents
),
maj AS (
  SELECT doc_id, lf_keyword, lf_length, lf_lang,
         CASE WHEN pos > neg THEN 1 WHEN neg > pos THEN 0 ELSE -1 END AS m
  FROM (
    SELECT *,
           (CASE WHEN lf_keyword = 1 THEN 1 ELSE 0 END
            + CASE WHEN lf_length = 1 THEN 1 ELSE 0 END
            + CASE WHEN lf_lang = 1 THEN 1 ELSE 0 END) AS pos,
           (CASE WHEN lf_keyword = 0 THEN 1 ELSE 0 END
            + CASE WHEN lf_length = 0 THEN 1 ELSE 0 END
            + CASE WHEN lf_lang = 0 THEN 1 ELSE 0 END) AS neg
    FROM votes
  ) t
),
lf AS (
  SELECT doc_id, m, 'lf_keyword' AS lf, lf_keyword AS vote FROM maj
  UNION ALL SELECT doc_id, m, 'lf_length', lf_length FROM maj
  UNION ALL SELECT doc_id, m, 'lf_lang', lf_lang FROM maj
),
wt AS (
  SELECT lf,
         CAST(COUNT(*) AS BIGINT) AS n_covered,
         CAST(SUM(CASE WHEN m <> -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_scored,
         CAST(SUM(CASE WHEN m <> -1 AND vote = m THEN 1 ELSE 0 END)
           AS BIGINT) AS n_agree,
         CAST(ROUND(LN(
             CAST(2 * SUM(CASE WHEN m <> -1 AND vote = m THEN 1 ELSE 0 END)
                  + 1 AS DOUBLE)
             / (2 * SUM(CASE WHEN m <> -1 AND vote <> m THEN 1 ELSE 0 END)
                + 1)), 9) AS DECIMAL(12,9)) AS w
  FROM lf WHERE vote <> -1 GROUP BY lf
),
wrow AS (
  SELECT MAX(CASE WHEN lf = 'lf_keyword' THEN w END) AS wk,
         MAX(CASE WHEN lf = 'lf_length' THEN w END) AS wl,
         MAX(CASE WHEN lf = 'lf_lang' THEN w END) AS wg
  FROM wt
),
revote AS (
  SELECT m,
         (CASE WHEN lf_keyword = 1 THEN wk
               ELSE CAST(0 AS DECIMAL(12,9)) END
          + CASE WHEN lf_length = 1 THEN wl
                 ELSE CAST(0 AS DECIMAL(12,9)) END
          + CASE WHEN lf_lang = 1 THEN wg
                 ELSE CAST(0 AS DECIMAL(12,9)) END) AS s1,
         (CASE WHEN lf_keyword = 0 THEN wk
               ELSE CAST(0 AS DECIMAL(12,9)) END
          + CASE WHEN lf_length = 0 THEN wl
                 ELSE CAST(0 AS DECIMAL(12,9)) END
          + CASE WHEN lf_lang = 0 THEN wg
                 ELSE CAST(0 AS DECIMAL(12,9)) END) AS s0
  FROM maj, wrow
),
delta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN
             (CASE WHEN s1 > s0 THEN 1 WHEN s0 > s1 THEN 0 ELSE -1 END) <> m
           THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
  FROM revote
)
SELECT lf, n_covered, n_scored, n_agree,
       CASE WHEN n_scored > 0
            THEN CAST(n_agree AS DOUBLE) / n_scored END AS accuracy,
       CAST(w AS DOUBLE) AS weight,
       (SELECT n_items FROM delta) AS n_items,
       (SELECT n_changed FROM delta) AS n_changed
FROM wt
"""


@register("lab4_dawid_skene", _LAB4_ORACLE)
def lab4_dawid_skene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dawid–Skene-style (one EM round) ability-weighted consensus over
    lab1's labeling-function votes: estimate each LF's accuracy against
    the majority label, convert it to a log-odds weight, and re-resolve
    every document by weighted vote — the label model that turns a raw
    vote matrix into training labels when annotators differ in quality
    (Dawid & Skene 1979; the one-round variant is the standard weak-
    supervision warm start). lab3 says whether two LFs agree; lab4 says
    how much each LF's vote should COUNT, and how many documents the
    ability weighting actually relabels vs naive majority (n_changed is
    the number of training labels majority vote gets wrong if the
    weights are right).

    Exactness: accuracies are exact integer tallies; each weight is
    ROUND(LN(x), 9) of ONE IEEE division of exact BIGINTs — the
    (2a+1)/(2d+1) Laplace odds cleared of fractions (fe5's discipline)
    — and the weighted scores are fixed three-term DECIMAL(12,9) sums,
    so every argmax comparison is exact and the relabeled consensus is
    bit-identical cross-engine. An LF with no scored docs keeps a NULL
    weight that poisons its terms to NULL on BOTH engines (the CASE
    falls through to abstain identically).

    Scale shape: two scan-side passes over documents (votes are CASE
    expressions): pass 1 feeds a 3-row LF aggregate (map-side
    combinable explode of 3 structs), pass 2 re-votes against the
    broadcast 1-row weight vector and reduces to a 2-number delta.
    Nothing item-count-sized ever shuffles or materializes — at 100 TB
    this is two scans and two combiner-absorbed aggregates."""
    docs = table(spark, sf_dir, "documents")
    lf_keyword = (
        F.when(F.col("text").contains("spark"), 1)
        .when(F.col("text").contains("slow"), 0)
        .otherwise(-1)
    )
    lf_length = (
        F.when(F.col("n_chars") >= 400, 1)
        .when(F.col("n_chars") < 150, 0)
        .otherwise(-1)
    )
    lf_lang = F.when(F.col("lang") == "en", 1).otherwise(-1)

    def tally(target: int) -> F.Column:
        return sum(
            F.when(F.col(c) == target, 1).otherwise(0)
            for c in ("lf_keyword", "lf_length", "lf_lang")
        )

    maj = (
        docs.select(
            "doc_id",
            lf_keyword.alias("lf_keyword"),
            lf_length.alias("lf_length"),
            lf_lang.alias("lf_lang"),
        )
        .withColumn("pos", tally(1))
        .withColumn("neg", tally(0))
        .select(
            "doc_id",
            "lf_keyword",
            "lf_length",
            "lf_lang",
            F.when(F.col("pos") > F.col("neg"), 1)
            .when(F.col("neg") > F.col("pos"), 0)
            .otherwise(-1)
            .alias("m"),
        )
    )
    lf_long = maj.select(
        "m",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("lf"), F.col(c).alias("vote")
                    )
                    for c in ("lf_keyword", "lf_length", "lf_lang")
                ]
            )
        ).alias("x"),
    ).select("m", F.col("x.lf").alias("lf"), F.col("x.vote").alias("vote"))
    scored = F.when(F.col("m") != -1, 1).otherwise(0)
    agree = F.when(
        (F.col("m") != -1) & (F.col("vote") == F.col("m")), 1
    ).otherwise(0)
    disagree = F.when(
        (F.col("m") != -1) & (F.col("vote") != F.col("m")), 1
    ).otherwise(0)
    wt = (
        lf_long.filter(F.col("vote") != -1)
        .groupBy("lf")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_covered"),
            F.sum(scored).cast("bigint").alias("n_scored"),
            F.sum(agree).cast("bigint").alias("n_agree"),
            F.sum(disagree).cast("bigint").alias("n_disagree"),
        )
        .withColumn(
            "w",
            F.round(
                F.log(
                    (2 * F.col("n_agree") + 1).cast("double")
                    / (2 * F.col("n_disagree") + 1)
                ),
                9,
            ).cast("decimal(12,9)"),
        )
        .localCheckpoint(eager=True)
    )
    wrow = wt.agg(
        *[
            F.max(F.when(F.col("lf") == c, F.col("w"))).alias(a)
            for c, a in (
                ("lf_keyword", "wk"),
                ("lf_length", "wl"),
                ("lf_lang", "wg"),
            )
        ]
    )
    zero = F.expr("CAST(0 AS DECIMAL(12,9))")

    def side(target: int) -> F.Column:
        return (
            F.when(F.col("lf_keyword") == target, F.col("wk")).otherwise(zero)
            + F.when(F.col("lf_length") == target, F.col("wl")).otherwise(zero)
            + F.when(F.col("lf_lang") == target, F.col("wg")).otherwise(zero)
        )

    revote = maj.crossJoin(F.broadcast(wrow)).select(
        "m", side(1).alias("s1"), side(0).alias("s0")
    )
    new_label = (
        F.when(F.col("s1") > F.col("s0"), 1)
        .when(F.col("s0") > F.col("s1"), 0)
        .otherwise(-1)
    )
    delta = revote.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.when(new_label != F.col("m"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
    )
    return wt.crossJoin(F.broadcast(delta)).select(
        "lf",
        "n_covered",
        "n_scored",
        "n_agree",
        F.when(
            F.col("n_scored") > 0,
            F.col("n_agree").cast("double") / F.col("n_scored"),
        ).alias("accuracy"),
        F.col("w").cast("double").alias("weight"),
        "n_items",
        "n_changed",
    )


# ---------------------------------------------------------------------------
# t30 — BPE tokenizer INFERENCE: encode the corpus with t27's merges
# ---------------------------------------------------------------------------


def _t30_oracle() -> str:
    return f"""{_bpe_cte_chain()},
lv AS (
  SELECT lang, w, COUNT(*) AS n
  FROM (SELECT lang, unnest({T.sql_tokenize('text')}) AS w
        FROM documents) t
  GROUP BY lang, w
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_word_types,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * length(w)) AS BIGINT) AS total_chars,
       CAST(SUM(n * len(string_split(s, ' '))) AS BIGINT) AS total_symbols,
       CAST(SUM(n * length(w)) AS DOUBLE)
         / CAST(SUM(n * len(string_split(s, ' '))) AS BIGINT)
         AS chars_per_symbol,
       CAST(SUM(n * len(string_split(s, ' '))) AS DOUBLE)
         / CAST(SUM(n) AS BIGINT) AS symbols_per_word
FROM lv JOIN v{BPE_ROUNDS} USING (w)
GROUP BY lang
"""


@register("t30_bpe_encode", _t30_oracle())
def t30_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer INFERENCE: encode the whole corpus with the
    BPE_ROUNDS merges t27 learns, and report the per-language encoding
    bill — word types, word occurrences, chars in, symbols out, and
    the two ratios (chars/symbol = achieved compression,
    symbols/word = fertility of the LEARNED tokenizer). t27 emits the
    training trajectory; t30 is the other half of the tokenizer
    lifecycle — applying the merge table — and the per-language split
    is the number multilingual teams watch (a language the merges
    ignore keeps fertility ~ word length). t23 measures a FIXED
    regex tokenizer; t30 measures the one this corpus just trained.

    Exactness: encoding reuses :func:`_bpe_spellings` — the identical
    window-parity merge application pinned bit-exact by t27 — so every
    spelling is identical cross-engine (the oracle splices the same
    shared CTE chain, asserted byte-identical to t27's by test);
    per-language sums are exact integers; the two ratios are single
    IEEE divisions.

    Scale shape: t27's — the corpus is touched once more for the
    (lang, word) frequency table (map-side-combinable); encoding
    itself runs over the frequency-weighted VOCABULARY, never the raw
    token stream, so the merge application is vocabulary-bounded at
    any corpus size; the final join is vocabulary-sized on both
    sides."""
    frames, _stats = _bpe_spellings(spark, sf_dir)
    final = frames[-1].select(
        "w", F.size(F.split("s", " ")).alias("n_sym")
    )
    docs = fanout(table(spark, sf_dir, "documents"))
    lv = (
        docs.select("lang", F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = lv.join(final, "w")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum("n").cast("bigint").alias("n_words"),
        F.sum(F.col("n") * F.length("w")).cast("bigint").alias("total_chars"),
        F.sum(F.col("n") * F.col("n_sym")).cast("bigint").alias(
            "total_symbols"
        ),
        (
            F.sum(F.col("n") * F.length("w")).cast("double")
            / F.sum(F.col("n") * F.col("n_sym")).cast("bigint")
        ).alias("chars_per_symbol"),
        (
            F.sum(F.col("n") * F.col("n_sym")).cast("double")
            / F.sum("n").cast("bigint")
        ).alias("symbols_per_word"),
    )


# ---------------------------------------------------------------------------
# t31 — term burstiness (variance-to-mean dispersion over documents)
# ---------------------------------------------------------------------------

#: document-frequency floor: a term must appear in at least this many
#: docs before its dispersion is ranked (rare terms have meaningless
#: variance estimates).
T31_DF_FLOOR = 5
T31_TOP_K = 20

_T31_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY term, doc_id
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS df,
         SUM(CAST(c AS HUGEINT)) AS t,
         SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM tf GROUP BY term
)
SELECT term, df, CAST(t AS BIGINT) AS total_tf,
       CAST(n.n_docs * s2 - t * t AS DOUBLE)
         / CAST(n.n_docs * t AS DOUBLE) AS vmr
FROM stats CROSS JOIN n
WHERE df >= {T31_DF_FLOOR}
ORDER BY vmr DESC, term
LIMIT {T31_TOP_K}
"""


@register("t31_term_burstiness", _T31_ORACLE)
def t31_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: the variance-to-mean ratio (index of
    dispersion) of each term's per-document count, zeros included —
    Church & Gale's observation that content words arrive in BURSTS
    (VMR >> 1) while function words scatter ~Poisson (VMR ≈ 1). The
    corpus-curation use is template detection: a term whose VMR spikes
    marks boilerplate concentrated in a document subfamily that t3's
    global histogram averages away. Top-{T31_TOP_K} by dispersion over
    the df floor.

    Exactness: with zero-count docs included, VMR = var/mean collapses
    to (N·Σc² − (Σc)²)/(N·Σc) on EXACT integers (population variance
    over all N docs; zero terms contribute nothing to either Σ), so
    the only float is ONE IEEE division and the (vmr DESC, term) order
    is bit-identical cross-engine.

    Scale shape: one exploded token pass → (term, doc) counts →
    per-term map-side-combinable moments (vocabulary-bounded output);
    the corpus size joins in as a broadcast 1-row aggregate; top-k
    compiles to TakeOrderedAndProject — no global sort."""
    docs = fanout(table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("t"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("s2"),
    )
    return (
        stats.filter(F.col("df") >= T31_DF_FLOOR)
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            F.col("t").cast("bigint").alias("total_tf"),
            (
                (
                    F.col("n_docs").cast("decimal(19,0)") * F.col("s2")
                    - F.col("t") * F.col("t")
                ).cast("double")
                / (F.col("n_docs").cast("decimal(19,0)") * F.col("t")).cast(
                    "double"
                )
            ).alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), "term")
        .limit(T31_TOP_K)
    )


# ---------------------------------------------------------------------------
# t32 — per-source unigram KL drift from the corpus distribution
# ---------------------------------------------------------------------------

_T32_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
sw AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_sw
  FROM tok GROUP BY source, term
),
w AS (
  SELECT term, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY term
),
s AS (
  SELECT source, CAST(SUM(c_sw) AS BIGINT) AS t_s,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM sw GROUP BY source
),
tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS t FROM w),
lat AS (
  SELECT sw.source, sw.c_sw,
         CAST(ROUND(LN(CAST(sw.c_sw AS DOUBLE)), 9) AS DECIMAL(13,9))
           - CAST(ROUND(LN(CAST(w.c_w AS DOUBLE)), 9) AS DECIMAL(13,9))
           + CAST(ROUND(LN(CAST(tot.t AS DOUBLE)), 9) AS DECIMAL(13,9))
           - CAST(ROUND(LN(CAST(s.t_s AS DOUBLE)), 9) AS DECIMAL(13,9))
           AS lr
  FROM sw JOIN w USING (term) JOIN s USING (source) CROSS JOIN tot
)
SELECT s.source, s.t_s AS n_tokens, s.vocab,
       CAST(kl.num AS DOUBLE) / CAST(s.t_s AS DOUBLE) AS kl_nats
FROM s JOIN (
  SELECT source, SUM(CAST(c_sw AS DECIMAL(20,0)) * lr) AS num
  FROM lat GROUP BY source
) kl USING (source)
"""


@register("t32_source_kl_drift", _T32_ORACLE)
def t32_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the pooled corpus
    distribution — the mix-design drift number: a source whose KL
    spikes is distributionally unusual (different domain, template
    flood, language leak) and is exactly what DSIR-style importance
    weighting (sp12) responds to at the document level; this is the
    SOURCE-level dashboard row. KL(p_s ‖ p) = Σ_w p_s(w)·ln(p_s(w)/p(w))
    over the source's observed vocabulary (p_s(w) > 0 everywhere it is
    evaluated, and p(w) ≥ p_s(w)·T_s/T > 0, so every log is finite).

    Exactness: the log-ratio ln(c_sw·T/(c_w·T_s)) is carried as a SUM
    of four 9-dp lattice LN terms (ROUND(LN(count),9), the t21/g9
    discipline — no division ever enters a transcendental), weighted
    by exact integer c_sw in DECIMAL and summed order-free; the final
    KL is ONE IEEE division by the exact token total. Bit-identical
    cross-engine.

    Scale shape: one exploded token pass → (source, term) counts; the
    global term histogram and per-source totals both derive from that
    vocabulary-bounded table (checkpointed — the scan never re-runs);
    the corpus total joins as a broadcast 1-row aggregate. Output is
    source-bounded."""
    docs = fanout(table(spark, sf_dir, "documents"))
    sw = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_sw"))
        .localCheckpoint(eager=True)
    )
    w = sw.groupBy("term").agg(F.sum("c_sw").cast("bigint").alias("c_w"))
    s = sw.groupBy("source").agg(
        F.sum("c_sw").cast("bigint").alias("t_s"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    tot = w.agg(F.sum("c_w").cast("bigint").alias("t"))

    def lat9(col):
        return F.round(F.log(col.cast("double")), 9).cast("decimal(13,9)")

    lat = (
        sw.join(w, "term")
        .join(F.broadcast(s.select("source", "t_s")), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "c_sw",
            (
                lat9(F.col("c_sw"))
                - lat9(F.col("c_w"))
                + lat9(F.col("t"))
                - lat9(F.col("t_s"))
            ).alias("lr"),
        )
    )
    kl = lat.groupBy("source").agg(
        F.sum(F.col("c_sw").cast("decimal(20,0)") * F.col("lr")).alias("num")
    )
    return s.join(kl, "source").select(
        "source",
        F.col("t_s").alias("n_tokens"),
        "vocab",
        (F.col("num").cast("double") / F.col("t_s").cast("double")).alias(
            "kl_nats"
        ),
    )
