"""DuckDB-oracle-gated wrappers for the enrichment + canonicalization
operators, runnable standalone on the inline synthetic ontology.

Each Spark query uses the *real* operator implementation
(enrich.py / canon.py) over the fixture lookup DataFrames; the paired SQL
builder inlines the very same ontology constants as VALUES so DuckDB can
verify the result row-for-row. These gate E1-E4, J4 and the
connected-components merge (SURVEY.md §2.5-2.6, §4.3) independently of the
corpus queries in webkg.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkmedkg import canon, enrich, fixtures, ontology


def _sql_lit(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _values(rows: list[tuple], cols: str, name: str) -> str:
    body = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows
    )
    return f"{name} AS (SELECT * FROM (VALUES {body}) AS _t({cols}))"


def _all_cuis(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c,) for c in sorted(ontology.MEDGEN)], "CUI string"
    )


# ---------------------------------------------------------------------------
# E1: CUI -> genes explode.
# ---------------------------------------------------------------------------

def q_genes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich.genes_table(_all_cuis(spark), fixtures.medgen_df(spark)).select(
        "source", "gene", "node_label"
    )


def sql_genes() -> str:
    rows = [
        (cui, g)
        for cui in sorted(ontology.MEDGEN)
        for g in ontology.MEDGEN[cui]["genes"]
    ]
    return f"""
WITH {_values(rows, "cui, gene", "mg")}
SELECT cui AS source, gene, 'Gene' AS node_label FROM mg
"""


# ---------------------------------------------------------------------------
# E2: CUI -> SNOMED inline.
# ---------------------------------------------------------------------------

def q_snomed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich.snomed_table(_all_cuis(spark), fixtures.medgen_df(spark))


def sql_snomed() -> str:
    rows = [
        (cui, *s)
        for cui in sorted(ontology.MEDGEN)
        for s in ontology.MEDGEN[cui]["snomed"]
    ]
    return f"""
WITH {_values(rows, "cui, saui, snomed_text, scui, sab", "sn")}
SELECT cui AS source, saui AS SAUI, snomed_text, scui AS SCUI, sab AS SAB,
       'SnomedConcept' AS node_label
FROM sn
"""


# ---------------------------------------------------------------------------
# E3: CUI -> clinical features inline (missing subfields -> '').
# ---------------------------------------------------------------------------

def q_clinical_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich.clinical_features_table(_all_cuis(spark), fixtures.medgen_df(spark))


def sql_clinical_features() -> str:
    rows = [
        (cui, *cf)
        for cui in sorted(ontology.MEDGEN)
        for cf in ontology.MEDGEN[cui]["clinical_features"]
    ]
    return f"""
WITH {_values(rows, "src, cui, typ, name, definition", "cf")}
SELECT src AS source, cui AS CUI, typ AS type, name,
       COALESCE(definition, '') AS definition,
       'ClinicalFeature' AS node_label
FROM cf
"""


# ---------------------------------------------------------------------------
# J4: gene -> proteins (exact + substring-containment theta fallback).
# ---------------------------------------------------------------------------

def _all_genes(spark: SparkSession) -> DataFrame:
    genes = sorted({g for v in ontology.MEDGEN.values() for g in v["genes"]})
    return spark.createDataFrame([(g,) for g in genes], "gene string")


def q_proteins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich.proteins_table(
        _all_genes(spark), fixtures.uniprot_df(spark)
    ).select("source", "Entry", "name", "GeneNames", "Organism", "uniProtUrl")


def _uniprot_values() -> str:
    cols = [
        "Entry", "EntryName", "Reviewed", "Organism", "ProteinNames",
        "GeneNames", "GenePrimary", "Function",
        "go_molecular_function", "go_biological_process", "go_cellular_component",
    ]
    rows = [tuple(r[c] for c in cols) for r in ontology.UNIPROT]
    return _values(rows, ", ".join(cols), "up")


def sql_proteins() -> str:
    genes = sorted({g for v in ontology.MEDGEN.values() for g in v["genes"]})
    return f"""
WITH {_values([(g,) for g in genes], "gene", "g")},
{_uniprot_values()},
exact AS (
  SELECT g.gene, up.* FROM g JOIN up ON g.gene = up.GenePrimary
),
theta AS (
  SELECT g.gene, up.*
  FROM (SELECT gene FROM g
        WHERE gene NOT IN (SELECT GenePrimary FROM up)) g
  JOIN up ON strpos(' ' || lower(up.GeneNames) || ' ',
                    ' ' || lower(g.gene) || ' ') > 0
),
allm AS (SELECT * FROM exact UNION ALL SELECT * FROM theta)
SELECT gene AS source, Entry,
       CASE WHEN strpos(ProteinNames, '(') > 0
            THEN substring(ProteinNames, 1, strpos(ProteinNames, '(') - 1)
            ELSE ProteinNames END AS name,
       GeneNames, Organism,
       'https://www.uniprot.org/uniprotkb/' || Entry AS uniProtUrl
FROM allm
"""


# ---------------------------------------------------------------------------
# E4: protein -> GO unpivot/explode/regexp.
# ---------------------------------------------------------------------------

def q_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich.go_table(fixtures.uniprot_df(spark))


def sql_go() -> str:
    return f"""
WITH {_uniprot_values()},
stacked AS (
  SELECT Entry AS source, 'molecular function' AS GoType,
         go_molecular_function AS go_list FROM up
  UNION ALL
  SELECT Entry, 'biological process', go_biological_process FROM up
  UNION ALL
  SELECT Entry, 'cellular component', go_cellular_component FROM up
),
segs AS (
  SELECT source, GoType, unnest(string_split(go_list, ';')) AS seg
  FROM stacked WHERE go_list IS NOT NULL AND go_list <> ''
)
SELECT source,
       trim(regexp_extract(seg, '^(.*?)\\s*\\[GO:(\\d+)\\]\\s*$', 1)) AS name,
       'GO:' || regexp_extract(seg, '^(.*?)\\s*\\[GO:(\\d+)\\]\\s*$', 2) AS GoID,
       GoType, 'GO' AS node_label
FROM segs
WHERE regexp_extract(seg, '^(.*?)\\s*\\[GO:(\\d+)\\]\\s*$', 2) <> ''
"""


# ---------------------------------------------------------------------------
# Connected-components canonicalization (recursive-CTE oracle).
# ---------------------------------------------------------------------------

def q_canonical_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real iterated min-propagation CC (canon.py) over the medical
    alias clusters."""
    return canon.cui_canonical_map(fixtures.aliases_df(spark)).orderBy("CUI")


def sql_canonical_cc() -> str:
    alias_rows = sorted({(a, c) for a, c, _ in ontology.ALIASES})
    return f"""
WITH RECURSIVE {_values(alias_rows, "alias, cui", "al")},
verts AS (SELECT DISTINCT cui FROM al),
edges AS (
  SELECT DISTINCT a.cui AS src, b.cui AS dst
  FROM al a JOIN al b ON a.alias = b.alias AND a.cui <> b.cui
),
reach(id, r) AS (
  SELECT cui, cui FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS CUI, MIN(r) AS canonical_cui
FROM reach GROUP BY id ORDER BY CUI
"""


def q_canonical_cc_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same alias-cluster canonicalization as ``q_canonical_cc``, but with
    the driver fast path DISABLED (``driver_threshold=0``) so the oracle
    gates the distributed min-label-propagation join loop itself — the
    code path a genuinely huge alias graph takes (canon.py's small-graph
    union-find shortcut never runs on one).  Output must equal the
    recursive-CTE oracle AND q_canonical_cc bit-for-bit."""
    aliases = fixtures.aliases_df(spark)
    from pyspark.sql import functions as F

    vertices = aliases.select(F.col("CUI").alias("id")).distinct()
    cc = canon.connected_components(
        vertices, canon.alias_cluster_edges(aliases), driver_threshold=0
    )
    return cc.select(
        F.col("id").alias("CUI"), F.col("component").alias("canonical_cui")
    ).orderBy("CUI")


def sql_canonical_cc_distributed() -> str:
    return sql_canonical_cc()
