"""sparkmedkg — a from-scratch PySpark-native medical knowledge-graph
construction engine.

Re-expresses the dataflow semantics of the reference
(medical-knowledge-graph/medknowledgegraph, /root/reference) as a bulk
Spark DataFrame job over Common-Crawl-style web-page tables:

    docs(url, warc_ts, html, text, lang)
      -> extract.extract_text          (byte-identical text per url)
      -> ner.detect_mentions           (dictionary-trie NER, mapInPandas)
      -> link.link_mentions            (candidate gen + 3-gram cosine, JVM-side)
      -> select.select_concepts        (top-15 entities x top-4 CUIs)
      -> enrich.*                      (genes / snomed / clinical features /
                                        proteins / GO broadcast joins + explodes)
      -> canon.*                       (salted dedup + connected components)
      -> materialize.*                 (partitioned nodes/edges tables)

No network, no Neo4j, no Flask: external databases (UMLS, MedGen, UniProt)
are deterministic broadcast lookup tables (fixtures.py).
"""

__version__ = "0.1.0"
