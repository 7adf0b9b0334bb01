"""Text normalization / tokenization — paired Spark + SQL builders.

Re-implements the reference's gold-layer text chain natively
(clean_text regexes at gold_article_scoring.py:36-41; Tokenizer /
StopWordsRemover at :49-65; distinct-token counting at :149-154) as
JVM-side column expressions — no Python UDF in the hot path
(SURVEY.md §4 codegen note: every row-at-a-time UDF breaks whole-stage
codegen and pays a JVM↔Python round trip).

Every Spark builder here has a ``sql_*`` twin emitting the equivalent
DuckDB expression, so oracle queries share one source of truth for the
normalization semantics. Only order-insensitive derivations (counts,
sorted fingerprints) are exposed to hash comparison — element order of
``array_distinct`` is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_RE = r"(https?://)\S+"
NON_ALNUM_RE = r"[^a-z0-9\s]"
WS_RE = r"\s+"
MIN_TOKEN_LEN = 2  # keep tokens with length > 2, as gold_article_scoring.py:79

# compact English stopword list (reference uses StopWordsRemover's default
# English list, gold_article_scoring.py:54-65; a fixed explicit list keeps
# the DuckDB oracle bit-identical)
STOPWORDS = (
    "the", "and", "for", "are", "was", "not", "all", "can", "has", "had",
    "his", "her", "how", "new", "now", "see", "two", "who", "with", "that",
    "this", "from", "they", "will", "have", "been", "were", "which", "their",
    "would", "there", "what", "about", "when", "into", "than", "them", "then",
)


def clean_text(col: Column) -> Column:
    """lower → strip URLs → strip non-alphanumerics (keep whitespace).

    Deliberate divergences from the reference chain
    (gold_article_scoring.py:36-41): replacements insert ' ' rather than
    '' so adjacent words never fuse into a phantom token
    ("solar.Wind" → "solar wind", not "solarwind"), and the reference's
    leading-"rt " strip (a Twitter-ism absent from this corpus) is
    dropped.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, URL_RE, " ")
    return F.regexp_replace(c, NON_ALNUM_RE, " ")


def sql_clean_text(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace(lower({expr}), '{URL_RE}', ' ', 'g'), "
        f"'{NON_ALNUM_RE}', ' ', 'g')"
    )


def tokenize(col: Column) -> Column:
    """clean → whitespace split → drop short tokens and stopwords."""
    toks = F.split(clean_text(col), WS_RE)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        toks,
        lambda x: (F.length(x) > MIN_TOKEN_LEN) & ~F.array_contains(stop, x),
    )


def sql_tokenize(expr: str) -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"list_filter(string_split_regex({sql_clean_text(expr)}, '{WS_RE}'), "
        f"x -> length(x) > {MIN_TOKEN_LEN} AND NOT list_contains([{stop_list}], x))"
    )


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokenize(col))


def sql_distinct_tokens(expr: str) -> str:
    return f"list_distinct({sql_tokenize(expr)})"


def fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (the scalable stand-in for the reference's sha2 surrogate
    keys when the goal is content identity, not row identity)."""
    return F.md5(F.concat_ws(" ", F.sort_array(distinct_tokens(col))))


def sql_fingerprint(expr: str) -> str:
    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # concat_ws over an empty array is '' — align on '' so empty/
    # all-stopword docs fingerprint identically (md5 of empty string).
    return f"md5(COALESCE(array_to_string(list_sort({sql_distinct_tokens(expr)}), ' '), ''))"
