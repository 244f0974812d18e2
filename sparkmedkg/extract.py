"""Text extraction: html binary -> text, byte-stable.

The reference joins abstract sections with ' ' (parser.py:79-87); the rebuild's
per-row invariant (BASELINE.json input_hint) is byte-identical extracted text
per url. The extractor is a vectorized Arrow pandas UDF — no per-row Python
at the Spark API level; the regex runs over Arrow-delivered batches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_py(html: bytes | None) -> str:
    """Deterministic, byte-stable html -> text (strip tags, no reflow)."""
    if html is None:
        return ""
    return _TAG_RE.sub("", bytes(html).decode("utf-8", errors="replace"))


def extract_text_udf():
    # built lazily: pandas_udf type parsing needs an active SparkSession
    @pandas_udf("string")
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_text_py)

    return _udf


def with_extracted_text(docs: DataFrame, out_col: str = "extracted_text") -> DataFrame:
    """Adds ``out_col`` = extract_text(html). Tests assert it equals ``text``
    byte-for-byte per url (the P2 invariant)."""
    return docs.withColumn(out_col, extract_text_udf()(F.col("html")))
