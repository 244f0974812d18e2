"""Fixed StructType contracts + NodeTable-style validation.

The reference enforces per-table invariants on every NodeTable
(basepipe.py:77-117): required columns present, ``node_label`` values drawn
from an expected domain, column names Cypher-safe (no space / ``-``,
basepipe.py:92-100), and NaN normalized to '' (basepipe.py:47).  We keep the
same contract as explicit StructType constants + a ``validate`` helper —
no schema inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SOURCE_COL = "source"
NODE_LABEL_COL = "node_label"

# ---- input contract (BASELINE.json input_hint) --------------------------
DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# ---- lookup tables (replace live UMLS / MedGen / UniProt) ----------------
UMLS_CONCEPTS_SCHEMA = StructType(
    [
        StructField("CUI", StringType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("definition", StringType(), True),
        StructField("semtype", StringType(), False),  # DISEASE | CHEMICAL
    ]
)

UMLS_ALIASES_SCHEMA = StructType(
    [
        StructField("alias", StringType(), False),  # lower-cased surface form
        StructField("CUI", StringType(), False),
        StructField("is_canonical", StringType(), True),  # 'true'/'false'
    ]
)

MEDGEN_SCHEMA = StructType(
    [
        StructField("CUI", StringType(), False),
        StructField("genes", ArrayType(StringType()), True),
        StructField(
            "snomed",
            ArrayType(
                StructType(
                    [
                        StructField("SAUI", StringType()),
                        StructField("snomed_text", StringType()),
                        StructField("SCUI", StringType()),
                        StructField("SAB", StringType()),
                    ]
                )
            ),
            True,
        ),
        StructField(
            "clinical_features",
            ArrayType(
                StructType(
                    [
                        StructField("CUI", StringType()),
                        StructField("type", StringType()),
                        StructField("name", StringType()),
                        StructField("definition", StringType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

UNIPROT_SCHEMA = StructType(
    [
        StructField("Entry", StringType(), False),
        StructField("EntryName", StringType(), True),
        StructField("Reviewed", StringType(), True),
        StructField("Organism", StringType(), True),
        StructField("ProteinNames", StringType(), True),
        StructField("GeneNames", StringType(), True),       # space-sep synonyms
        StructField("GenePrimary", StringType(), True),     # exact-match path
        StructField("Function", StringType(), True),
        StructField("go_molecular_function", StringType(), True),
        StructField("go_biological_process", StringType(), True),
        StructField("go_cellular_component", StringType(), True),
    ]
)

# ---- output contract ------------------------------------------------------
MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("mention", StringType(), False),   # raw span, lower-cased
        StructField("resolved", StringType(), False),  # abbrev-resolved form
        StructField("node_label", StringType(), False),
    ]
)

LINKS_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),  # resolved mention text
        StructField("CUI", StringType(), False),
        StructField("kb_score", DoubleType(), False),
        StructField("name", StringType(), True),
        StructField("Definition", StringType(), True),
        StructField("node_label", StringType(), False),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("node_label", StringType(), False),
        StructField("node_id", StringType(), False),
        StructField("props", StringType(), True),  # JSON-encoded attributes
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("src_label", StringType(), False),
        StructField("src_id", StringType(), False),
        StructField("pred", StringType(), False),  # always CONTAINS (ref semantics)
        StructField("dst_label", StringType(), False),
        StructField("dst_id", StringType(), False),
    ]
)


class SchemaError(ValueError):
    pass


def validate(
    df: DataFrame,
    required_cols: list[str],
    expected_labels: list[str] | None = None,
) -> DataFrame:
    """Replicates the reference NodeTable checks (basepipe.py:77-117).

    - required columns present
    - column names contain no space / '-'
    - if ``expected_labels`` given, distinct ``node_label`` values are a
      subset of it (basepipe.py:101-117)
    Returns df with string-typed nulls normalized to '' (basepipe.py:47).
    """
    missing = [c for c in required_cols if c not in df.columns]
    if missing:
        raise SchemaError(f"missing required columns: {missing}")
    bad = [c for c in df.columns if " " in c or "-" in c]
    if bad:
        raise SchemaError(f"illegal column names (space or '-'): {bad}")
    if expected_labels is not None:
        found = {
            r[0]
            for r in df.select(NODE_LABEL_COL).distinct().collect()
        }
        extra = found - set(expected_labels)
        if extra:
            raise SchemaError(
                f"unexpected node_label values {sorted(extra)}; "
                f"expected subset of {expected_labels}"
            )
    str_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    return df.na.fill({c: "" for c in str_cols})


def with_empty_strings(df: DataFrame) -> DataFrame:
    """NaN -> '' on all string columns (basepipe.py:47)."""
    str_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    return df.na.fill({c: "" for c in str_cols})


def trigrams(col):
    """Distinct character-3-gram set of a string column, JVM-side.

    Used by the linking score (link.py): set-cosine over char-3-grams.
    Strings shorter than 3 chars yield the string itself as a single gram.
    """
    c = F.lower(F.col(col)) if isinstance(col, str) else F.lower(col)
    n = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(1))),
        lambda i: c.substr(i, F.lit(3)),
    )
    return F.array_distinct(grams)
