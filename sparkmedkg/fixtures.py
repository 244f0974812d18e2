"""Deterministic synthetic corpus + lookup-table DataFrames (FIXTURES.md).

``gen_docs`` produces the primary input per BASELINE.json input_hint:
``docs(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
with ``extract_text(html) == text`` byte-exactly (parser.py:79-87 invariant:
text is a ' '-join of sentence "sections").

Skew is built in: the three HOT_ALIASES appear in ~60% of documents
(hot-CUI skew, north_rule), while topic terms rotate round-robin over
TOPICS — the SearchTerm analogue (conftest.py:31).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from sparkmedkg import ontology as onto
from sparkmedkg import schemas

SEED = 42

# Sentence pools. Every sentence is a "section"; doc text joins sections
# with ' ' exactly as the reference joins abstract sections (parser.py:79-87).
_TOPIC_SENTENCES: dict[str, list[str]] = {
    "phenylketonuria": [
        "Phenylketonuria (PKU) is an inherited disorder of phenylalanine metabolism.",
        "Patients with phenylketonurie require a diet low in Phenylalanine.",
        "Untreated PKU leads to intellectual disability and eczema.",
        "Folling disease was first described in Norway.",
        "Dihydropteridine reductase deficiency mimics classic phenylketonuria.",
        "DHPR deficiency does not respond to dietary phenylalanine restriction alone.",
        "Serum phe levels are monitored weekly in phenylketonuria.",
        "Maternal phenylketonuria can harm the developing fetus.",
    ],
    "hyperthyroidism": [
        "Hyperthyroidism results from excess thyroxine production.",
        "An overactive thyroid may cause weight loss and tachycardia.",
        "Thyrotoxicosis is confirmed by suppressed TSH.",
        "Severe Hyperthyroidism can precipitate atrial fibrillation and heart attack.",
        "Methotrexate is not a treatment for hyperthyroidism.",
        "MTX toxicity is unrelated to overactive thyroid states.",
        "Beta blockers control symptoms of thyrotoxicosis while thyroxine normalizes.",
        "Untreated hyperthyroidism raises the risk of myocardial infarction.",
    ],
    "epilepsy": [
        "Epilepsy is diagnosed after two unprovoked seizure episodes.",
        "A seizure disorder may begin in childhood.",
        "Falling sickness is an ancient name for epilepsy.",
        "Valproate and carbamazepine are first line drugs for epilepsy.",
        "Valproic acid exposure in pregnancy is teratogenic.",
        "A febrile convulsion is usually benign.",
        "Levetiracetam is well tolerated in focal epilepsy.",
        "Each seizure was recorded on video EEG.",
    ],
}

_HOT_SENTENCES = [
    "Aspirin remains the most widely used drug worldwide.",
    "Low dose aspirin prevents myocardial infarction in high risk adults.",
    "Ibuprofen and paracetamol are common over the counter analgesics.",
    "Acetaminophen overdose is the leading cause of acute liver failure.",
    "Patients taking acetylsalicylic acid should avoid ibuprofen co-administration.",
    "ASA desensitization is possible in aspirin exacerbated respiratory disease.",
    "Paracetamol is preferred over aspirin in children.",
]

_GENERIC_SENTENCES = [
    "The cohort was followed for five years.",
    "Diabetes mellitus and hypertension were common comorbidities.",
    "Asthma prevalence increased over the study period.",
    "Schizophrenia onset typically occurs in early adulthood.",
    "High blood pressure was controlled in most participants.",
    "Diabetes screening was performed annually.",
    "No adverse events were reported.",
    "Results were statistically significant.",
]

_NON_EN_SENTENCES = [
    "Die Studie umfasste viele Patienten ohne Befund.",
    "Les resultats ne montrent aucune difference notable.",
    "Weitere Untersuchungen sind erforderlich.",
    "Le traitement a ete bien tolere.",
]

HTML_PREFIX = b"<html><body><p>"
HTML_SUFFIX = b"</p></body></html>"


def gen_doc_row(
    i: int, seed: int = SEED, min_sent: int = 2, max_sent: int = 6
) -> tuple:
    """Deterministic row i: (url, warc_ts, html, text, lang). Pure function
    of (i, seed, sentence bounds) so local and distributed generation agree.

    ``min_sent``/``max_sent`` size the page: the defaults give abstract-sized
    docs (~300 B); scaling benchmarks pass e.g. 30..80 for web-page-sized
    docs (3-8 KB, closer to Common-Crawl extracted text)."""
    t0 = datetime(2022, 1, 1)
    rng = random.Random(seed * 1_000_003 + i)
    topic = onto.TOPICS[i % 3]
    lang = "en" if rng.random() < 0.9 else rng.choice(["de", "fr"])
    if lang == "en":
        n_sent = rng.randint(min_sent, max_sent)
        pool = _TOPIC_SENTENCES[topic]
        sents = [pool[rng.randrange(len(pool))] for _ in range(n_sent)]
        if rng.random() < 0.6:  # hot-chemical skew
            sents.append(_HOT_SENTENCES[rng.randrange(len(_HOT_SENTENCES))])
        if rng.random() < 0.4:
            sents.append(_GENERIC_SENTENCES[rng.randrange(len(_GENERIC_SENTENCES))])
    else:
        sents = [
            _NON_EN_SENTENCES[rng.randrange(len(_NON_EN_SENTENCES))]
            for _ in range(rng.randint(1, 3))
        ]
    text = " ".join(sents)
    html = HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX
    url = f"https://site{i % 97}.example/med/{i}"
    return (url, t0 + timedelta(seconds=i * 137), bytearray(html), text, lang)


def gen_doc_rows(
    n_docs: int, seed: int = SEED, min_sent: int = 2, max_sent: int = 6
) -> list[tuple]:
    """Deterministic doc rows: (url, warc_ts, html, text, lang)."""
    return [gen_doc_row(i, seed, min_sent, max_sent) for i in range(n_docs)]


def docs_df(spark: SparkSession, n_docs: int, seed: int = SEED) -> DataFrame:
    return spark.createDataFrame(gen_doc_rows(n_docs, seed), schemas.DOCS_SCHEMA)


def docs_df_dist(
    spark: SparkSession,
    n_docs: int,
    seed: int = SEED,
    min_sent: int = 2,
    max_sent: int = 6,
    n_partitions: int = 64,
) -> DataFrame:
    """Distributed corpus generation: spark.range + mapInPandas, one
    deterministic row per id — same rows as ``docs_df`` but generated on
    executors (driver-side generation does not scale past ~10^5 docs)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc_row(int(i), seed, min_sent, max_sent)
                    for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schemas.DOCS_SCHEMA)
    )


def topic_of_url(url: str) -> str:
    """SearchTerm analogue: topic is derivable from the url's doc index."""
    return onto.TOPICS[int(url.rsplit("/", 1)[1]) % 3]


# ---------------------------------------------------------------------------
# Lookup DataFrames (broadcast-joined at job time; no network).
# ---------------------------------------------------------------------------

def concepts_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(onto.CONCEPTS, schemas.UMLS_CONCEPTS_SCHEMA)


def aliases_df(spark: SparkSession) -> DataFrame:
    rows = [(a, c, str(ic).lower()) for a, c, ic in onto.ALIASES]
    return spark.createDataFrame(rows, schemas.UMLS_ALIASES_SCHEMA)


def medgen_df(spark: SparkSession) -> DataFrame:
    rows = []
    for cui in sorted(onto.MEDGEN):
        v = onto.MEDGEN[cui]
        rows.append(
            (
                cui,
                list(v["genes"]),
                [tuple(s) for s in v["snomed"]],
                [tuple(cf) for cf in v["clinical_features"]],
            )
        )
    return spark.createDataFrame(rows, schemas.MEDGEN_SCHEMA)


def medgen_gene_cuis_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c,) for c in onto.MEDGEN_GENE_CUIS], "CUI string"
    )


def uniprot_df(spark: SparkSession) -> DataFrame:
    cols = [f.name for f in schemas.UNIPROT_SCHEMA.fields]
    rows = [tuple(r[c] for c in cols) for r in onto.UNIPROT]
    return spark.createDataFrame(rows, schemas.UNIPROT_SCHEMA)


def lookups(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "concepts": concepts_df(spark),
        "aliases": aliases_df(spark),
        "medgen": medgen_df(spark),
        "medgen_gene_cuis": medgen_gene_cuis_df(spark),
        "uniprot": uniprot_df(spark),
    }


def write_fixture_dir(spark: SparkSession, out_dir: str, n_docs: int) -> None:
    """Materialize docs + lookups as parquet (bench / checkpoint input)."""
    docs_df(spark, n_docs).write.mode("overwrite").parquet(f"{out_dir}/docs.parquet")
    for name, df in lookups(spark).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
