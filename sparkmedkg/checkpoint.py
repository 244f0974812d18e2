"""Checkpoint/resume + per-partition lineage and metrics (north_rule).

Two-phase design, sized for the 10^12-doc target:

**Phase 1 (doc-parallel, checkpointed).** The corpus is hash-bucketed on
``url``. Each bucket group runs the scan-heavy per-document stages (extract ->
NER -> linking), MERGE-appends the resulting doc-level nodes/edges plus a
``links`` side table into the GraphStore, and records a marker line with
triple-count metrics (the telemetry analogue of the reference's insert_data
totals, neo4jconnector.py:214-216). Appends are anti-join idempotent, so a
crash between "write graph" and "write marker" re-processes one group with no
duplicate rows.

**Phase 2 (global finalize, cheap).** Top-15-entity x top-4-CUI selection is a
*global* aggregate, so it cannot run per bucket: finalize() recomputes it from
the accumulated doc-level edges (distinct (url, mention) rows -> document
frequency) and runs the enrichment joins — a tiny job over KB-sized data,
re-runnable any time.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import enrich, link, ner, pipeline, select
from sparkmedkg.materialize import GraphStore, edges_from, nodes_from

BUCKET_COL = "_bucket"


def with_bucket(docs: DataFrame, n_buckets: int) -> DataFrame:
    return docs.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


class CheckpointLog:
    """File-backed marker + metrics log (one JSON line per completed bucket)."""

    def __init__(self, path: str):
        self.path = path

    def done_buckets(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        done = set()
        with open(self.path) as fh:
            for line in fh:
                if line.strip():
                    done.add(json.loads(line)["bucket"])
        return done

    def mark(self, bucket: int, metrics: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"bucket": bucket, **metrics}) + "\n")

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        if not os.path.exists(self.path):
            return spark.createDataFrame(
                [], "bucket int, n_triples long, wall_sec double"
            )
        return spark.read.json(self.path)


class LinksStore:
    """Side table (source, CUI, kb_score, name, Definition) with
    anti-join-idempotent appends keyed on (source, CUI)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            from sparkmedkg import schemas

            return self.spark.createDataFrame([], schemas.LINKS_SCHEMA)

    def merge(self, links: DataFrame) -> None:
        links = links.dropDuplicates(["source", "CUI"])
        existing = self.read().select("source", "CUI")
        if existing.take(1):
            links = links.join(existing, ["source", "CUI"], "left_anti")
        if links.take(1):
            links.write.mode("append").parquet(self.path)


def doc_stage(
    spark: SparkSession, docs: DataFrame, lkp: dict[str, DataFrame]
) -> tuple[DataFrame, DataFrame, DataFrame, list[DataFrame]]:
    """Per-document stages only: returns (doc_nodes, doc_edges, links,
    cached) where ``cached`` are the persisted intermediates to unpersist
    after the group's writes. The nodes/edges/links outputs all fan out
    from the mention-detection stage, and a group performs THREE actions
    (merge_nodes, merge_edges, links merge) — without the persist the
    detection stage would re-run once per action."""
    alias_bc = ner.broadcast_alias_index(spark, lkp["aliases"], lkp["concepts"])
    papers = docs.where(F.col("lang") == "en").select(
        "url", "lang", pipeline.topic_expr().alias("topic")
    )
    mentions = ner.detect_mentions(docs, alias_bc).persist()
    links = link.link_mentions(mentions, lkp["aliases"], lkp["concepts"]).persist()

    mention_labels = (
        mentions.select(F.col("mention").alias("_m"), F.col("node_label").alias("src_lbl"))
        .distinct()
    )
    link_edges = (
        links.select(F.col("source").alias("src"), F.col("CUI").alias("dst"))
        .join(mention_labels, F.col("src") == F.col("_m"))
        .select("src_lbl", "src", "dst")
    )
    edges = (
        edges_from(papers, "SearchTerm", "topic", "Paper", "url")
        .unionByName(edges_from(mentions, "Paper", "url", F.col("node_label"), "mention"))
        .unionByName(edges_from(link_edges, F.col("src_lbl"), "src", "UMLS", "dst"))
    )
    nodes = (
        nodes_from(papers.select(F.lit("SearchTerm").alias("l"), "topic"), "l", "topic", [])
        .unionByName(nodes_from(papers.select(F.lit("Paper").alias("l"), "url", "lang"), "l", "url", ["lang"]))
        .unionByName(nodes_from(mentions, "node_label", "mention", []))
        .unionByName(nodes_from(links, "node_label", "CUI", ["name", "Definition"]))
    )
    return nodes, edges, links, [mentions, links]


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    lkp: dict[str, DataFrame],
    store: GraphStore,
    log: CheckpointLog,
    links_store: LinksStore,
    n_buckets: int = 8,
    group_size: int = 4,
    fail_after_groups: int | None = None,
) -> dict:
    """Phase 1: process pending buckets in groups; resume = skip done ones.

    ``fail_after_groups`` simulates a crash for the resume test.
    """
    bucketed = with_bucket(docs, n_buckets)
    done = log.done_buckets()
    pending = [b for b in range(n_buckets) if b not in done]
    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]

    total = 0
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError("simulated crash for resume test")
        t0 = time.time()
        part = bucketed.where(F.col(BUCKET_COL).isin(group)).drop(BUCKET_COL)
        nodes, edges, links, cached = doc_stage(spark, part, lkp)
        edges = edges.persist()
        store.merge_nodes(nodes)
        n_new = store.merge_edges(edges)
        links_store.merge(links)
        n_rows = edges.count()
        edges.unpersist()
        for df in cached:
            df.unpersist()
        total += n_rows
        wall = time.time() - t0
        for b in group:
            log.mark(
                b,
                {"n_triples": n_rows, "new_edges": n_new,
                 "wall_sec": round(wall, 3), "group": gi},
            )
    return {"groups": len(groups), "triples_seen": total}


def finalize(
    spark: SparkSession,
    store: GraphStore,
    links_store: LinksStore,
    lkp: dict[str, DataFrame],
    top_n: int = 15,
    cui_n: int = 4,
) -> None:
    """Phase 2: global selection + enrichment from the accumulated doc-level
    graph. Document frequency comes from the stored distinct Paper->mention
    edges, so the result is identical to a single non-checkpointed run."""
    edges = store.read_edges()
    links = links_store.read()

    mention_df = (
        edges.where((F.col("src_label") == "Paper") & (F.col("dst_label") == "DISEASE"))
        .groupBy(F.col("dst_id").alias("text"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("text"))
        .limit(top_n)
    )
    cuis = (
        select.top_cuis_per_entity(links, mention_df, cui_n=cui_n)
        .select("CUI")
        .distinct()
    )
    genes = enrich.genes_table(cuis, lkp["medgen"])
    snomed = enrich.snomed_table(cuis, lkp["medgen"])
    cfs = enrich.clinical_features_table(cuis, lkp["medgen"])
    proteins = enrich.proteins_table(genes, lkp["uniprot"])
    matched = lkp["uniprot"].join(
        F.broadcast(proteins.select("Entry").distinct()), "Entry", "left_semi"
    )
    go = enrich.go_table(matched)

    new_nodes = (
        nodes_from(genes, "node_label", "gene", [])
        .unionByName(nodes_from(snomed, "node_label", "SAUI", ["snomed_text", "SCUI", "SAB"]))
        .unionByName(nodes_from(cfs, "node_label", "CUI", ["type", "name", "definition"]))
        .unionByName(
            nodes_from(
                proteins, "node_label", "Entry",
                ["name", "ProteinNames", "GeneNames", "Organism", "Function", "uniProtUrl"],
            )
        )
        .unionByName(nodes_from(go, "node_label", "GoID", ["name", "GoType"]))
    )
    new_edges = (
        edges_from(genes, "UMLS", "source", "Gene", "gene")
        .unionByName(edges_from(snomed, "UMLS", "source", "SnomedConcept", "SAUI"))
        .unionByName(edges_from(cfs, "UMLS", "source", "ClinicalFeature", "CUI"))
        .unionByName(edges_from(proteins, "Gene", "source", "Protein", "Entry"))
        .unionByName(edges_from(go, "Protein", "source", "GO", "GoID"))
    )
    store.merge_nodes(new_nodes)
    store.merge_edges(new_edges)
