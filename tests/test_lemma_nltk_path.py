"""Exercise the NLTK pandas_udf branch of pipeline.gold.lemmatize.

The container has no real NLTK, so the branch is normally dead code
behind the ImportError fallback. A minimal fake ``nltk`` package —
shipped to Python workers via ``addPyFile`` and made importable on the
driver via sys.path — lets the pandas_udf wiring (Arrow batch in/out,
ArrayType round-trip, per-token lemmatize calls) execute for real.

The fake lemmatizer includes an irregular mapping (geese→goose) the
native rule-based fallback cannot produce, so the assertion proves the
UDF path actually ran rather than the fallback.
"""

from __future__ import annotations

import shutil
import sys
import textwrap

from pyspark.sql import functions as F

_FAKE_STEM = textwrap.dedent(
    """
    import re


    class WordNetLemmatizer:
        _IRREGULAR = {"geese": "goose"}

        def lemmatize(self, token):
            if token in self._IRREGULAR:
                return self._IRREGULAR[token]
            token = re.sub(r"ies$", "y", token)
            return re.sub(r"(?<!s)s$", "", token)
    """
)


def test_nltk_pandas_udf_lemmatizer_wiring(spark, tmp_path):
    pkg = tmp_path / "nltk"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "stem.py").write_text(_FAKE_STEM)
    zip_base = tmp_path / "fake_nltk"
    shutil.make_archive(str(zip_base), "zip", tmp_path, "nltk")
    spark.sparkContext.addPyFile(str(zip_base) + ".zip")

    sys.path.insert(0, str(tmp_path))
    try:
        from bc_proj3_spark.pipeline.gold import lemmatize

        df = spark.createDataFrame(
            [(["geese", "studies", "cats", "press", "ab"],)],
            "tokens array<string>",
        )
        out = df.select(lemmatize(F.col("tokens")).alias("lemmed")).collect()
        # geese→goose is the NLTK-only mapping; ab is dropped (len <= 2)
        assert out[0]["lemmed"] == ["goose", "study", "cat", "press"]
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("nltk.stem", None)
        sys.modules.pop("nltk", None)
