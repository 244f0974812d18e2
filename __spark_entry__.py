"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query on sf0.001;
``queries()`` exposes every oracle-gated operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity search / text analysis /
multimodal plumbing); ``oracle_sql()`` returns the DuckDB-equivalent SQL for
each (generated from the same inline lexicon/ontology constants the Spark
queries use, so both engines see identical inputs).

Non-SQL-expressible entries (mapInPandas feature extraction) intentionally
have no oracle — the driver records the weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkmedkg import (
    corpusops,
    dedup,
    graphalgo,
    graphgate,
    hierarchy,
    kgoracle,
    medgenxml,
    multimodal,
    pubmed,
    relations,
    relops,
    simsearch,
    textstats,
    trainprep,
    webclean,
    webgraph,
    webkg,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full corpus-level triple extraction (SearchTerm->Paper->
    mention->CUI CONTAINS edges) over the sf0.001 web corpus."""
    return webkg.q_triples(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- KG construction over the web corpus (SURVEY.md §2.2-2.4) ---
        "kg_extract_text": webkg.q_extract_text,
        "kg_mentions": webkg.q_mentions,
        "kg_mentions_topk": webkg.q_mentions_topk,
        "kg_links": webkg.q_links,
        "kg_selected_cuis": webkg.q_selected_cuis,
        "kg_triples": webkg.q_triples,
        "kg_salted_mention_counts": webkg.q_salted_mention_counts,
        "kg_search_terms": webkg.q_search_terms,
        "kg_intersection": webkg.q_intersection,
        "kg_cooccurrence": webkg.q_cooccurrence,
        "kg_relations": relations.q_relations,
        "kg_pagerank": relations.q_pagerank,
        "kg_pmi_edges": relations.q_pmi_edges,
        "kg_triangles": trainprep.kg_triangles,
        # --- graph analytics over the co-occurrence KG ---
        "kg_degree_dist": graphalgo.q_degree_dist,
        "kg_bfs_reach": graphalgo.q_bfs_reach,
        "kg_label_propagation": graphalgo.q_label_propagation,
        "kg_neighbor_jaccard": graphalgo.q_neighbor_jaccard,
        "kg_kcore": graphalgo.q_kcore,
        "kg_weighted_sssp": graphalgo.q_weighted_sssp,
        "kg_adamic_adar": webgraph.q_adamic_adar,
        # --- web-graph construction + sketches ---
        "web_link_graph": webgraph.link_graph,
        "web_hits": webgraph.q_hits,
        "corpus_kmv_distinct": webgraph.kmv_distinct,
        "dedup_containment": webgraph.containment_pairs,
        "kg_ontology_closure": hierarchy.ontology_closure,
        "kg_category_rollup": hierarchy.category_rollup,
        # --- training-corpus preparation (composed filters + sampling) ---
        "corpus_training_ready": trainprep.training_ready,
        "corpus_stratified_sample": trainprep.stratified_sample,
        "corpus_decontaminate": corpusops.decontaminate,
        "corpus_pack_sequences": corpusops.pack_sequences,
        "corpus_bm25_topk": corpusops.bm25_topk,
        "corpus_chunk_dedup": webclean.chunk_dedup,
        "corpus_pii_redact": webclean.pii_redact,
        "corpus_url_normalize": webclean.url_normalize,
        "corpus_host_stats": webclean.host_stats,
        "corpus_quality_filter": webclean.quality_filter,
        "corpus_snapshot_diff": webclean.snapshot_diff,
        "corpus_weighted_sample": trainprep.weighted_sample,
        "corpus_temperature_sample": trainprep.temperature_sample,
        "corpus_oov_rate": corpusops.oov_rate,
        "emb_kmeans": simsearch.kmeans,
        # --- enrichment + canonicalization (E1-E4, J4, CC) ---
        "kg_genes": kgoracle.q_genes,
        "kg_snomed": kgoracle.q_snomed,
        "kg_clinical_features": kgoracle.q_clinical_features,
        "kg_proteins": kgoracle.q_proteins,
        "kg_go": kgoracle.q_go,
        "kg_canonical_cc": kgoracle.q_canonical_cc,
        "kg_canonical_cc_distributed": kgoracle.q_canonical_cc_distributed,
        # --- nested-struct parsing + XML parsing (S2/S5, P1-P5) ---
        "kg_pubmed_paper": pubmed.q_pubmed_paper,
        "kg_medgen_xml": medgenxml.q_medgen_xml,
        # --- materialization semantics (S8/S9/J5/J2/A6) ---
        "kg_node_merge": graphgate.q_node_merge,
        "kg_store_merge": graphgate.q_store_merge,
        "kg_edge_integrity": graphgate.q_edge_integrity,
        "kg_selected_cuis_semijoin": graphgate.q_selected_cuis_semijoin,
        # --- dedup family ---
        "dedup_exact": dedup.exact_dedup,
        "dedup_jaccard": dedup.jaccard_pairs,
        "dedup_jaccard_prefix": dedup.jaccard_pairs_prefix,
        "dedup_minhash_sig": dedup.minhash_signatures,
        "dedup_lsh_pairs": dedup.lsh_candidate_pairs,
        "dedup_simhash": dedup.simhash,
        "dedup_embedding": dedup.embedding_near_dups,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_common_ngrams": dedup.common_ngrams,
        # --- similarity search ---
        "ann_cosine_topk": simsearch.cosine_topk,
        "ann_lsh_topk": simsearch.lsh_topk,
        "ann_ivf_topk": simsearch.ivf_topk,
        "ann_batch_topk": simsearch.batch_topk,
        "ann_quantized_topk": simsearch.quantized_topk,
        "emb_int8_quant": simsearch.int8_quant,
        # --- text analysis ---
        "text_lang_id": textstats.lang_id,
        "text_quality": textstats.quality,
        "text_token_counts": textstats.token_counts,
        "text_fingerprint": textstats.fingerprint,
        "text_repetition": textstats.repetition,
        "text_normalize": textstats.normalize,
        "corpus_domain_stats": trainprep.domain_stats,
        # --- multimodal plumbing ---
        "mm_binary_meta": multimodal.binary_meta,
        "mm_fake_features": multimodal.fake_features,  # mapInPandas + SQL oracle
        "mm_fake_resize": multimodal.fake_resize,
        "mm_frame_sample": multimodal.frame_sample,
        # --- relational operator showcase (events + TPC-H) ---
        "events_sessionize": relops.events_sessionize,
        "events_asof_join": relops.events_asof_join,
        "events_tumbling_counts": relops.events_tumbling_counts,
        "events_json_props": relops.events_json_props,
        "events_rollup": relops.events_rollup,
        "events_pivot": relops.events_pivot,
        "events_percentiles": relops.events_percentiles,
        "events_sliding_sum": relops.events_sliding_sum,
        "events_latest_per_key": relops.events_latest_per_key,
        "events_range_join": relops.events_range_join,
        "events_running_sum": relops.events_running_sum,
        "events_topk_per_user": relops.events_topk_per_user,
        "tpch_pricing_summary": relops.tpch_pricing_summary,
        "tpch_revenue_by_region": relops.tpch_revenue_by_region,
        "tpch_semi_anti": relops.tpch_semi_anti,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_extract_text": webkg.sql_extract_text(),
        "kg_mentions": webkg.sql_mentions(),
        "kg_mentions_topk": webkg.sql_mentions_topk(),
        "kg_links": webkg.sql_links(),
        "kg_selected_cuis": webkg.sql_selected_cuis(),
        "kg_triples": webkg.sql_triples(),
        "kg_salted_mention_counts": webkg.sql_salted_mention_counts(),
        "kg_search_terms": webkg.sql_search_terms(),
        "kg_intersection": webkg.sql_intersection(),
        "kg_cooccurrence": webkg.sql_cooccurrence(),
        "kg_relations": relations.sql_relations(),
        "kg_pagerank": relations.sql_pagerank(),
        "kg_pmi_edges": relations.sql_pmi_edges(),
        "kg_triangles": trainprep.sql_kg_triangles(),
        "kg_degree_dist": graphalgo.sql_degree_dist(),
        "kg_bfs_reach": graphalgo.sql_bfs_reach(),
        "kg_label_propagation": graphalgo.sql_label_propagation(),
        "kg_neighbor_jaccard": graphalgo.sql_neighbor_jaccard(),
        "kg_kcore": graphalgo.sql_kcore(),
        "kg_weighted_sssp": graphalgo.sql_weighted_sssp(),
        "kg_adamic_adar": webgraph.sql_adamic_adar(),
        "web_link_graph": webgraph.sql_link_graph(),
        "web_hits": webgraph.sql_hits(),
        "corpus_kmv_distinct": webgraph.sql_kmv_distinct(),
        "dedup_containment": webgraph.sql_containment_pairs(),
        "kg_ontology_closure": hierarchy.sql_ontology_closure(),
        "kg_category_rollup": hierarchy.sql_category_rollup(),
        "corpus_training_ready": trainprep.sql_training_ready(),
        "corpus_stratified_sample": trainprep.sql_stratified_sample(),
        "corpus_decontaminate": corpusops.sql_decontaminate(),
        "corpus_pack_sequences": corpusops.sql_pack_sequences(),
        "corpus_bm25_topk": corpusops.sql_bm25_topk(),
        "corpus_chunk_dedup": webclean.sql_chunk_dedup(),
        "corpus_pii_redact": webclean.sql_pii_redact(),
        "corpus_url_normalize": webclean.sql_url_normalize(),
        "corpus_host_stats": webclean.sql_host_stats(),
        "corpus_quality_filter": webclean.sql_quality_filter(),
        "corpus_snapshot_diff": webclean.sql_snapshot_diff(),
        "corpus_weighted_sample": trainprep.sql_weighted_sample(),
        "corpus_temperature_sample": trainprep.sql_temperature_sample(),
        "corpus_oov_rate": corpusops.sql_oov_rate(),
        "emb_kmeans": simsearch.sql_kmeans(),
        "kg_genes": kgoracle.sql_genes(),
        "kg_snomed": kgoracle.sql_snomed(),
        "kg_clinical_features": kgoracle.sql_clinical_features(),
        "kg_proteins": kgoracle.sql_proteins(),
        "kg_go": kgoracle.sql_go(),
        "kg_canonical_cc": kgoracle.sql_canonical_cc(),
        "kg_canonical_cc_distributed": kgoracle.sql_canonical_cc_distributed(),
        "kg_pubmed_paper": pubmed.sql_pubmed_paper(),
        "kg_medgen_xml": medgenxml.sql_medgen_xml(),
        "kg_node_merge": graphgate.sql_node_merge(),
        "kg_store_merge": graphgate.sql_store_merge(),
        "kg_edge_integrity": graphgate.sql_edge_integrity(),
        "kg_selected_cuis_semijoin": graphgate.sql_selected_cuis_semijoin(),
        "dedup_exact": dedup.sql_exact_dedup(),
        "dedup_jaccard": dedup.sql_jaccard_pairs(),
        "dedup_jaccard_prefix": dedup.sql_jaccard_pairs_prefix(),
        "dedup_minhash_sig": dedup.sql_minhash_signatures(),
        "dedup_lsh_pairs": dedup.sql_lsh_candidate_pairs(),
        "dedup_simhash": dedup.sql_simhash(),
        "dedup_embedding": dedup.sql_embedding_near_dups(),
        "dedup_clusters": dedup.sql_dedup_clusters(),
        "dedup_common_ngrams": dedup.sql_common_ngrams(),
        "ann_cosine_topk": simsearch.sql_cosine_topk(),
        "ann_lsh_topk": simsearch.sql_lsh_topk(),
        "ann_ivf_topk": simsearch.sql_ivf_topk(),
        "ann_batch_topk": simsearch.sql_batch_topk(),
        "ann_quantized_topk": simsearch.sql_quantized_topk(),
        "emb_int8_quant": simsearch.sql_int8_quant(),
        "text_lang_id": textstats.sql_lang_id(),
        "text_quality": textstats.sql_quality(),
        "text_token_counts": textstats.sql_token_counts(),
        "text_fingerprint": textstats.sql_fingerprint(),
        "text_repetition": textstats.sql_repetition(),
        "text_normalize": textstats.sql_normalize(),
        "corpus_domain_stats": trainprep.sql_domain_stats(),
        "mm_binary_meta": multimodal.sql_binary_meta(),
        "mm_fake_features": multimodal.sql_fake_features(),
        "mm_fake_resize": multimodal.sql_fake_resize(),
        "mm_frame_sample": multimodal.sql_frame_sample(),
        "events_sessionize": relops.sql_events_sessionize(),
        "events_asof_join": relops.sql_events_asof_join(),
        "events_tumbling_counts": relops.sql_events_tumbling_counts(),
        "events_json_props": relops.sql_events_json_props(),
        "events_rollup": relops.sql_events_rollup(),
        "events_pivot": relops.sql_events_pivot(),
        "events_percentiles": relops.sql_events_percentiles(),
        "events_sliding_sum": relops.sql_events_sliding_sum(),
        "events_latest_per_key": relops.sql_events_latest_per_key(),
        "events_range_join": relops.sql_events_range_join(),
        "events_running_sum": relops.sql_events_running_sum(),
        "events_topk_per_user": relops.sql_events_topk_per_user(),
        "tpch_pricing_summary": relops.sql_tpch_pricing_summary(),
        "tpch_revenue_by_region": relops.sql_tpch_revenue_by_region(),
        "tpch_semi_anti": relops.sql_tpch_semi_anti(),
    }
