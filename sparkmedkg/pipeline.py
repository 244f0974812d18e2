"""End-to-end KG construction: docs -> node tables -> nodes/edges.

The Spark lifecycle analogue of POST /buildGraph (SURVEY.md §3.1): one lazy
logical plan from Iceberg/parquet scan through NER, linking, selection and
enrichment to the partitioned node/edge tables; Catalyst/AQE picks the
physical plan (broadcast joins for every lookup, AQE skew splits for the hot
CUIs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import canon, enrich, link, ner, select
from sparkmedkg.ontology import TOPICS


def topic_expr(url_col: str = "url"):
    """SearchTerm analogue: topic derived from the doc index in the url
    (round-robin over TOPICS, FIXTURES.md §1)."""
    idx = F.element_at(F.split(F.col(url_col), "/"), -1).cast("int") % len(TOPICS)
    return F.element_at(F.array(*[F.lit(t) for t in TOPICS]), idx + 1)


def build_graph(
    spark: SparkSession,
    docs: DataFrame,
    lkp: dict[str, DataFrame],
    snomed: bool = True,
    clinical_features: bool = True,
    go: bool = True,
    top_n: int = 15,
    cui_n: int = 4,
    alias_bc=None,
    gate_empty_genes: bool = False,
    ner_impl: str = "python",
) -> dict[str, DataFrame]:
    """Runs every stage; returns the named intermediate + output DataFrames.

    All outputs are lazy; callers trigger actions (write/collect/count).
    ``alias_bc`` lets long-lived drivers reuse one broadcast alias index
    across runs (the analogue of loading the NER model once per process,
    manager.py:22-25) instead of re-collecting the alias table each call.

    ``gate_empty_genes=True`` reproduces the reference's conditional stage
    execution (manager.py:123-124: the UniProt pipe is skipped entirely
    when the gene list is empty): it costs one eager emptiness probe of the
    genes plan, so the proteins/GO stages never schedule jobs on empty
    input. Default False keeps the whole graph lazy (empty genes then just
    yield empty downstream tables).

    ``ner_impl`` selects the mention-detection lane: ``"python"``
    (default — the Arrow-batched mapInPandas trie, also the seam where
    model-scored NER plugs in) or ``"jvm"`` (the single-projection HOF
    matcher over a 1-row broadcast lexicon map). Both lanes emit
    identical rows (asserted in test_ner). The python trie is the
    MEASURED-faster lane for dictionary matching — 0.8s vs 3.3s on 100k
    300-byte docs and 1.0s vs 4.6s on 20k 3-8KB pages at local[32]
    (Catalyst higher-order-function lambdas evaluate interpreted, not
    codegen'd; the CPython trie walk is cheaper per token) — see
    BENCH.md "mention-detection lanes".
    """
    papers = docs.where(F.col("lang") == "en").select(
        "url", "warc_ts", "text", "lang", topic_expr().alias("topic")
    )
    # NER and linking fan out into every downstream table; persist both so
    # the detection stage and the link shuffle run once
    if ner_impl == "jvm":
        lex = ner.alias_label_df(spark, lkp["aliases"], lkp["concepts"])
        mentions = ner.detect_mentions_jvm(docs, lex).persist()
    else:
        if alias_bc is None:
            alias_bc = ner.broadcast_alias_index(
                spark, lkp["aliases"], lkp["concepts"]
            )
        mentions = ner.detect_mentions(docs, alias_bc).persist()
    links = link.link_mentions(mentions, lkp["aliases"], lkp["concepts"]).persist()
    ents = select.top_entities(mentions, n=top_n)
    cuis = (
        select.top_cuis_per_entity(links, ents, cui_n=cui_n)
        .select("CUI")
        .distinct()
    )

    out: dict[str, DataFrame] = {
        "papers": papers,
        "mentions": mentions,
        "links": links,
        "top_entities": ents,
        "selected_cuis": cuis,
    }
    genes = enrich.genes_table(cuis, lkp["medgen"])
    out["genes"] = genes
    if snomed:
        out["snomed"] = enrich.snomed_table(cuis, lkp["medgen"])
    if clinical_features:
        out["clinical_features"] = enrich.clinical_features_table(cuis, lkp["medgen"])
    if gate_empty_genes and genes.isEmpty():
        out["cui_canonical"] = canon.cui_canonical_map(lkp["aliases"])
        return out
    proteins = enrich.proteins_table(genes, lkp["uniprot"])
    out["proteins"] = proteins
    if go:
        # broadcast the distinct Entry set explicitly: it is bounded by the
        # uniprot lookup size, but as a derived aggregate it has no size
        # stats, so the planner would otherwise fall back to a sort-merge
        # semi-join (full shuffle of the lookup table)
        matched = lkp["uniprot"].join(
            F.broadcast(proteins.select("Entry").distinct()), "Entry", "left_semi"
        )
        out["go"] = enrich.go_table(matched)
    out["cui_canonical"] = canon.cui_canonical_map(lkp["aliases"])
    return out


def triples(tables: dict[str, DataFrame]) -> DataFrame:
    """The full CONTAINS edge set (SURVEY.md §1.3) as one DataFrame:
    (src_label, src_id, pred, dst_label, dst_id)."""
    from sparkmedkg.materialize import edges_from

    t = tables
    mention_labels = (
        t["mentions"]
        .select(F.col("mention").alias("_m"), F.col("node_label").alias("src_lbl"))
        .distinct()
    )
    link_edges_src = (
        t["links"]
        .select(F.col("source").alias("src"), F.col("CUI").alias("dst"))
        .join(mention_labels, F.col("src") == F.col("_m"))
        .select("src_lbl", "src", "dst")
    )

    # No dedup anywhere: every edge set is unique by construction — the NER
    # stage dedups mentions per doc (entityrecognition.py:54-64 semantics),
    # links are deduped on (CUI, source), papers are unique by url, and the
    # enrichment joins fan out distinct keys over unique lookup rows. The
    # label columns keep the sets disjoint from each other. Skipping the
    # distinct removes the single largest shuffle of the job (the full edge
    # union); GraphStore.merge_edges still enforces MERGE semantics at write.
    parts = [
        edges_from(t["papers"], "SearchTerm", "topic", "Paper", "url", dedup=False),
        edges_from(t["mentions"], "Paper", "url", F.col("node_label"), "mention",
                   dedup=False),
        edges_from(link_edges_src, F.col("src_lbl"), "src", "UMLS", "dst",
                   dedup=False),
        edges_from(t["genes"], "UMLS", "source", "Gene", "gene", dedup=False),
    ]
    if "snomed" in t:
        parts.append(edges_from(t["snomed"], "UMLS", "source", "SnomedConcept",
                                "SAUI", dedup=False))
    if "clinical_features" in t:
        parts.append(
            edges_from(t["clinical_features"], "UMLS", "source",
                       "ClinicalFeature", "CUI", dedup=False)
        )
    parts.append(edges_from(t["proteins"], "Gene", "source", "Protein", "Entry",
                            dedup=False))
    if "go" in t:
        parts.append(edges_from(t["go"], "Protein", "source", "GO", "GoID",
                                dedup=False))

    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result


def all_nodes(tables: dict[str, DataFrame]) -> DataFrame:
    """Canonical nodes table across all 8 levels (dedup per label+id)."""
    from sparkmedkg.materialize import nodes_from

    t = tables
    parts = [
        nodes_from(
            t["papers"].select(F.lit("SearchTerm").alias("l"), F.col("topic")),
            "l", "topic", [],
        ),
        nodes_from(
            t["papers"].select(F.lit("Paper").alias("l"), "url", "lang"),
            "l", "url", ["lang"],
        ),
        nodes_from(t["mentions"], "node_label", "mention", []),
        nodes_from(
            t["links"].join(t["cui_canonical"], "CUI", "left"),
            "node_label", "CUI", ["name", "Definition", "canonical_cui"],
        ),
        nodes_from(t["genes"], "node_label", "gene", []),
        nodes_from(
            t["proteins"], "node_label", "Entry",
            ["name", "ProteinNames", "GeneNames", "Organism", "Function", "uniProtUrl"],
        ),
    ]
    if "snomed" in t:
        parts.append(
            nodes_from(t["snomed"], "node_label", "SAUI", ["snomed_text", "SCUI", "SAB"])
        )
    if "clinical_features" in t:
        parts.append(
            nodes_from(t["clinical_features"], "node_label", "CUI", ["type", "name", "definition"])
        )
    if "go" in t:
        parts.append(nodes_from(t["go"], "node_label", "GoID", ["name", "GoType"]))
    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result.dropDuplicates(["node_label", "node_id"])
