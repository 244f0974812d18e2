"""Physical-plan evidence: .explain("formatted") for the headline queries,
with the scale-critical properties asserted and summarized into PLANS.md.

Checks per query (where applicable):
- PushedFilters / partial pushdown reaching the parquet scan
- ReadSchema column pruning (scan reads only needed columns)
- BroadcastHashJoin for every lookup join (no accidental sort-merge)
- WholeStageCodegen spans covering the JVM-side expression work

    python tools/explain_report.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF = "/root/testdata/sf0.01"

#: static PLANS.md section preserved across regenerations
AUDIT_SECTION = """## Cross-engine parity-hazard audit (round 4)

Two hazard classes were swept across all ~390 oracle-gated queries:

**1. Filter-on-rounded-value (the mirror_hosts class).** Every site that
rounds a similarity/score column for output was checked for whether the
THRESHOLD compares the raw expression (safe) or the rounded column
(hazard).  Sites audited: dedup.embedding_near_dups + _allpairs +
sql twin, dedup.jaccard_pairs_blocking / jaccard_pairs_prefix,
er.tfidf_pairs, graphalgo.q_neighbor_jaccard, simsearch.range_search,
corpusops.semantic_decontaminate, webclean.quality_filter.  **All
filter on the raw expression and round only the emitted column** —
zero fixes needed.  simsearch.semdedup thresholds in exact int64
(1e6*dot >= tau_micro*QK^2), which is stronger still.

**2. Interpolated-percentile cuts feeding filters/buckets (the
events_zonemap_prune class, round-3 advice).** Spark `percentile` and
DuckDB `quantile_cont` share the (n-1)*p definition but fold
`lo + frac*(hi-lo)` in engine-specific order; a last-ulp difference can
flip a boundary row's bucket.  Every remaining `percentile` /
`quantile_cont` call site was classified:

| site | cut feeds | resolution |
|---|---|---|
| events_zonemap_prune | zone assignment | rank-based integer cuts (r4) |
| corpus_quality_filter | release membership | micro-unit rank cut (r4) |
| text_quality_deciles | decile buckets | exactq, den=10 (r4) |
| events_pareto_curve | decile buckets | exactq, den=10 reverse (r4) |
| events_rfm_segments | quartile grid | exactq ×3, den=4 (r4) |
| metric_probe_calibration | decile buckets | exactq, den=10 (r4) |
| events_percentiles | output only | exactq closed form, exact division (r4) |
| events_robust_zscore | anomaly flags | exactq half/quarter-cent lane (r4) |
| events_winsorize | cap flags + clamp sum | exactq cent lane, den=100 (r4) |
| emb_norm_profile | output only | exactq median (half-ints exact) (r4) |

`sparkmedkg/exactq.py` computes the same interpolated cut entirely in
bigints (cut_scaled = den*x[k] + rem*(x[k+1]-x[k]); order statistics
from a value-histogram cumulative window, bounded by the value domain —
counts, cents, micro-unit scores — never a corpus sort), so bucket
membership is `den*v > cut_scaled` — an integer comparison identical in
both engines by construction.  No interpolated-percentile cut feeds a
filter or bucket anywhere in the contract anymore.
"""



def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from sparkmedkg import corpusops, dedup, graphalgo, hierarchy, kgembed, relations, relops, simsearch, textstats
    from sparkmedkg import curate, emblinalg, er, kgdelta, metrics, multimodal, shardops, statops, trainprep, webclean, webgraph, webkg
    from sparkmedkg.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("explain", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    checks = {
        # query -> (df factory, [expected plan fragments])
        "kg_mentions_topk": (
            lambda: webkg.q_mentions_topk(spark, SF),
            ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]",
             "TakeOrderedAndProject"],
        ),
        "kg_links": (
            lambda: webkg.q_links(spark, SF),
            ["BroadcastHashJoin", "Window", "PushedFilters"],
        ),
        "text_quality": (
            lambda: textstats.quality(spark, SF),
            ["ReadSchema: struct<doc_id:bigint,text:string>", "codegen id"],
        ),
        "dedup_lsh_pairs": (
            lambda: dedup.lsh_candidate_pairs(spark, SF),
            # Generate/higher-order-fn stages are not codegen'd (expected);
            # assert the partial aggs + the single band-join shuffle instead
            ["HashAggregate", "Exchange", "BroadcastHashJoin"],
        ),
        "ann_cosine_topk": (
            lambda: simsearch.cosine_topk(spark, SF),
            ["BroadcastNestedLoopJoin", "TakeOrderedAndProject"],
        ),
        "ann_ivf_topk": (
            lambda: simsearch.ivf_topk(spark, SF),
            # probe list + centroid set broadcast; final top-k is TakeOrdered.
            # The cell assignment is an expression-level argmax — there must
            # be NO Window (the old full-corpus row_number shuffle).
            ["BroadcastHashJoin", "TakeOrderedAndProject", "!Window",
             "!SortMergeJoin"],
        ),
        "dedup_embedding": (
            lambda: dedup.embedding_near_dups(spark, SF),
            # centroid-cell blocking: candidates flow through hash joins on
            # the cell key — no Cartesian / nested-loop node anywhere
            ["!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "dedup_jaccard_prefix": (
            lambda: dedup.jaccard_pairs_prefix(spark, SF),
            # persisted key arrays scanned from InMemoryRelation; the prefix
            # band join shuffles 8-byte keys only
            ["InMemoryTableScan", "HashAggregate"],
        ),
        "tpch_revenue_by_region": (
            lambda: relops.tpch_revenue_by_region(spark, SF),
            ["BroadcastHashJoin", "PushedFilters: [IsNotNull(l_orderkey)]"],
        ),
        "events_sessionize": (
            lambda: relops.events_sessionize(spark, SF),
            ["Window", "HashAggregate"],
        ),
        "kg_cooccurrence": (
            # same doc_cui lineage kg_pagerank iterates over (pagerank's own
            # returned DF is an eager localCheckpoint scan, so the audit
            # lives here): per-doc pair self-join + partial-agg support count
            lambda: webkg.q_cooccurrence(spark, SF),
            ["BroadcastHashJoin", "PushedFilters: [IsNotNull(lang), "
             "EqualTo(lang,en)]", "!CartesianProduct"],
        ),
        "kg_relations": (
            # posexplode + broadcast lexicon join fuse (Generate feeding a
            # BroadcastHashJoin); the pair join is a (doc_id, position)
            # equi-join — no Cartesian / nested-loop anywhere.
            # use_cache=False: audit the full declarative plan (the
            # session-memoized variant runs this exact plan once, then
            # serves the checkpointed 4x4-bounded result table)
            lambda: relations.q_relations(spark, SF, use_cache=False),
            ["Generate", "BroadcastHashJoin", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "kg_triangles": (
            # degree-oriented wedge enumeration: equi-joins only
            lambda: trainprep.kg_triangles(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "corpus_training_ready": (
            # lang filter pushed to the scan below the dedup anti-join
            lambda: trainprep.training_ready(spark, SF),
            # join adds IsNotNull(doc_id) to the scan's pushed set
            ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)",
             "!CartesianProduct"],
        ),
        "corpus_stratified_sample": (
            # map-only: a 10^12-row sample must not shuffle
            lambda: trainprep.stratified_sample(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "events_asof_join": (
            # union-merge formulation: ONE user_id shuffle + one window
            # pass; a range-join would be a nested loop
            lambda: relops.events_asof_join(spark, SF),
            ["Window", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "ann_batch_topk": (
            # two-stage top-k: both ranks are Windows over broadcast-scored
            # rows; no corpus shuffle beyond the salted rank exchanges
            lambda: simsearch.batch_topk(spark, SF),
            ["Window", "BroadcastNestedLoopJoin", "!SortMergeJoin"],
        ),
        "emb_int8_quant": (
            # quantization is a pure projection: no Exchange anywhere
            lambda: simsearch.int8_quant(spark, SF),
            ["!Exchange"],
        ),
        "text_normalize": (
            # map-only normalize+digest: no Exchange
            lambda: textstats.normalize(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "ann_quantized_topk": (
            # shortlist phase: corpus scan + TakeOrdered on approx score;
            # rerank touches only the shortlist — no shuffle joins
            lambda: simsearch.quantized_topk(spark, SF),
            ["TakeOrderedAndProject", "!SortMergeJoin", "!Exchange hashpartitioning"],
        ),
        "kg_bfs_reach": (
            # per-hop frontier join must stay a hash join on src
            lambda: graphalgo.q_bfs_reach(spark, SF),
            ["!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "kg_label_propagation": (
            # argmax window rides the groupBy(dst) shuffle — no extra
            # exchange between the aggregate and the rank
            lambda: graphalgo.q_label_propagation(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "dedup_common_ngrams": (
            # doc-freq count must be partial+final (map-side combine) with
            # a TakeOrdered top slice — no full sort, no joins
            lambda: dedup.common_ngrams(spark, SF),
            ["TakeOrderedAndProject", "HashAggregate", "!SortMergeJoin"],
        ),
        "events_sliding_sum": (
            # one shuffle on user_id; the range frame rides the time sort
            lambda: relops.events_sliding_sum(spark, SF),
            ["Window", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "events_latest_per_key": (
            # ranked keep-latest: single window over the compaction key
            lambda: relops.events_latest_per_key(spark, SF),
            ["Window", "!SortMergeJoin"],
        ),
        "events_range_join": (
            # bucketed band join: pure equi-join on (user_id, bucket) with
            # the 2-bucket probe explode — Spark must NOT fall back to the
            # nested-loop plan it picks for a raw range predicate
            lambda: relops.events_range_join(spark, SF),
            ["!BroadcastNestedLoop", "!CartesianProduct"],
        ),
        "corpus_chunk_dedup": (
            # keeper set = min(struct) aggregate per chunk; two partial+final
            # aggregate shuffles, never a join back against the corpus
            lambda: webclean.chunk_dedup(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "corpus_bpe_pair_counts": (
            # word-count shape: per-row pair transform + partial/final
            # count + TakeOrdered — no join anywhere, text-only scan
            lambda: corpusops.bpe_pair_counts(spark, SF),
            ["TakeOrderedAndProject", "HashAggregate", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "corpus_tfidf_keywords": (
            # per-doc top-k must compile to WindowGroupLimit (local k per
            # map task before the doc_id exchange); N is a 1-row broadcast
            lambda: corpusops.tfidf_keywords(spark, SF),
            ["WindowGroupLimit", "!SortMergeJoin"],
        ),
        "corpus_countmin_freq": (
            # sketch build = one partial-agg shuffle; probe cells and the
            # sketch join broadcast; never a sort-merge join
            lambda: corpusops.countmin_freq(spark, SF),
            ["HashAggregate", "BroadcastHashJoin", "!SortMergeJoin"],
        ),
        "corpus_bpe_merge_step": (
            # merge rewrite is a projection; recount is the word-count
            # shape (partial agg + TakeOrdered), no joins
            lambda: corpusops.bpe_merge_step(spark, SF),
            ["TakeOrderedAndProject", "HashAggregate", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "corpus_pii_redact": (
            # map-only regexp pass: no Exchange
            lambda: webclean.pii_redact(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "corpus_url_normalize": (
            # map-only regexp+array canonicalization: no Exchange
            lambda: webclean.url_normalize(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "corpus_host_stats": (
            # one partial-aggregated shuffle on host
            lambda: webclean.host_stats(spark, SF),
            ["HashAggregate", "Exchange", "!SortMergeJoin"],
        ),
        "corpus_quality_filter": (
            # 1-row percentile broadcast back over the score scan
            lambda: webclean.quality_filter(spark, SF),
            ["BroadcastNestedLoopJoin", "!SortMergeJoin"],
        ),
        "corpus_snapshot_diff": (
            # co-partitioned full-outer sort-merge join on the crawl key
            lambda: webclean.snapshot_diff(spark, SF),
            ["SortMergeJoin FullOuter", "!CartesianProduct"],
        ),
        "corpus_weighted_sample": (
            # map-only sample key + per-partition top-k: no Exchange
            lambda: trainprep.weighted_sample(spark, SF),
            ["TakeOrderedAndProject", "!Exchange"],
        ),
        "kg_pmi_edges": (
            # lexicon-bounded marginals broadcast onto the pair set
            lambda: relations.q_pmi_edges(spark, SF),
            ["BroadcastHashJoin", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "emb_centroid_classify": (
            # scoring is a map-only projection (class-mean literals folded
            # in); the only exchange is the tiny confusion-matrix count
            lambda: simsearch.centroid_classify(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "kg_motif_paths": (
            # two-hop self-join co-partitions on the mid key; the hub cap
            # keeps per-key fan bounded — never a nested-loop product
            lambda: relations.q_motif_paths(spark, SF),
            ["!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "kg_random_walks": (
            # per-step frontier joins are equi-joins on cur = src; lineage
            # is checkpoint-truncated per hop (plan shows the final union)
            lambda: graphalgo.q_random_walks(spark, SF),
            ["Union", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "corpus_hll_union": (
            # shard-sketch merge: two partial-agg shuffles over register
            # rows only; the raw corpus is scanned once
            lambda: webgraph.hll_union(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!CartesianProduct"],
        ),
        "corpus_bpe_encode": (
            # m composed row-local rewrites feeding one pair-count shape;
            # the token arrays never cross an exchange
            lambda: corpusops.bpe_encode(spark, SF),
            ["!SortMergeJoin", "!CartesianProduct", "!Exchange hashpartitioning"],
        ),
        "mm_audio_vad": (
            # framing, energy, run detection all row-local HOFs; the only
            # non-map op is the final per-clip segment explode
            lambda: multimodal.audio_vad_segments(spark, SF),
            ["Generate", "!Exchange", "!SortMergeJoin"],
        ),
        "dedup_snapshot_neardup": (
            # delta x corpus prefix join: equi-join on the 8-byte key,
            # verify by pair id — never a cross join
            lambda: dedup.snapshot_near_dup(spark, SF),
            ["HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "events_attribution": (
            # no purchase x click self-join: one per-user RANGE window
            # pass — a single exchange, never a join
            lambda: relops.events_attribution(spark, SF),
            ["Window", "!SortMergeJoin", "!BroadcastHashJoin",
             "!CartesianProduct"],
        ),
        "kg_transe_rank": (
            # map-only integer-hash scoring over the checkpointed negative
            # set, one groupBy on the triple key — no extra joins.
            # _build_*: audit the full declarative plan (q_transe_rank is
            # session-memoized since r5 and serves a checkpoint scan,
            # same convention as kg_relations' use_cache=False)
            lambda: kgembed._build_transe_rank(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!CartesianProduct"],
        ),
        "kg_pred_signature": (
            # per-(pred, side) argmax window rides the groupBy prefix
            lambda: kgembed.q_pred_signature(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_export_ntriples": (
            # serialization is a map-only union over the triple set
            lambda: kgembed.q_export_ntriples(spark, SF),
            ["Union", "!CartesianProduct"],
        ),
        "tpch_min_cost_supplier": (
            # dims broadcast; min agg + join-back share l_partkey hashing
            lambda: relops.tpch_min_cost_supplier(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "tpch_waiting_orders": (
            # one orderkey join + groupBy, broadcast supplier dim, top-k
            lambda: relops.tpch_waiting_orders(spark, SF),
            ["BroadcastHashJoin", "HashAggregate",
             "TakeOrderedAndProject", "!CartesianProduct"],
        ),
        "corpus_compaction_plan": (
            # per-(lang, shard) prefix-sum window + one groupBy; no joins
            lambda: corpusops.compaction_plan(spark, SF),
            ["Window", "HashAggregate", "!SortMergeJoin",
             "!BroadcastHashJoin", "!CartesianProduct"],
        ),
        "web_crawl_frontier": (
            # per-host top-k window; host index windows the DISTINCT host
            # dim and broadcasts back — fact table never globally sorted
            lambda: webclean.crawl_frontier(spark, SF),
            ["Window", "BroadcastHashJoin", "!SortMergeJoin"],
        ),
        "events_markov_transitions": (
            # lag window + pair count on the stream; the normalizer window
            # exchanges only the aggregated |types|^2 table
            lambda: relops.events_markov_transitions(spark, SF),
            ["Window", "HashAggregate", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "corpus_bigram_lm": (
            # one corpus scan: vocab + normalizer derive from the persisted
            # count table (InMemoryTableScan), V broadcast as 1 row
            lambda: corpusops.bigram_lm(spark, SF),
            ["InMemoryTableScan", "TakeOrderedAndProject",
             "!SortMergeJoin", "!CartesianProduct"],
        ),
        "corpus_kmv_intersect": (
            # per-pair union sketch via WindowGroupLimit; pair table is a
            # 10-row broadcast, never a corpus self-join
            lambda: webgraph.kmv_intersect(spark, SF),
            ["Window", "BroadcastHashJoin", "!CartesianProduct"],
        ),
        "dedup_simhash_pairs": (
            # banded candidates (equi-join, hot-band cap) + popcount-table
            # Hamming verify as a projection; returned DF is checkpointed
            # so assert on the signature+band stage upstream via cand
            lambda: dedup.simhash_pairs(spark, SF),
            ["!CartesianProduct"],
        ),
        "tpch_small_qty_revenue": (
            # part dim broadcast; per-part agg + join-back co-partitioned
            lambda: relops.tpch_small_qty_revenue(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_lca": (
            # ontology-sized: closure loop + pair join + argmin window
            lambda: hierarchy.lca_pairs(spark),
            ["Window", "HashAggregate"],
        ),
        "tpch_bloom_prune": (
            # W-row bitset broadcast onto the probe side; membership is a
            # map-side bitwise AND — never a product
            lambda: relops.bloom_prune_suppliers(spark, SF),
            ["BroadcastHashJoin", "!CartesianProduct"],
        ),
        "corpus_hybrid_rrf": (
            # fusion runs on two <= topk lists: rank windows + one tiny
            # full-outer join; the heavy lifting stays in the retrievers
            lambda: corpusops.hybrid_rrf(spark, SF),
            ["Window", "!CartesianProduct"],
        ),
        "corpus_profile": (
            # ALL columns profiled in one scan: countDistinct expands in
            # a single (sort-)aggregate chain — no per-column rescan joins
            lambda: webclean.corpus_profile(spark, SF),
            ["Expand", "SortAggregate", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "events_quantile_sketch": (
            # one partial-agg (type, bin) shuffle; the cumulative window
            # rides the grouped key — no join, no product
            lambda: relops.events_quantile_sketch(spark, SF),
            ["HashAggregate", "Window", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "events_zorder_key": (
            # clustering-key computation is a pure projection: no Exchange
            lambda: relops.events_zorder_key(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "corpus_line_dedup": (
            # intra-doc span dedup is pure row-local array work: no Exchange
            lambda: webclean.line_dedup(spark, SF),
            ["!Exchange", "codegen id"],
        ),
        "corpus_blocklist_filter": (
            # constant-fan suffix explode + broadcast rule join; the only
            # exchange is the per-doc longest-rule aggregation
            lambda: webclean.blocklist_filter(spark, SF),
            ["BroadcastHashJoin", "!SortMergeJoin", "!CartesianProduct"],
        ),
        "kg_walk_skipgrams": (
            # bounded offset-explode pairing: equi-join on (walk, step),
            # then one map-side-combinable pair count — no product
            lambda: graphalgo.q_walk_skipgrams(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "kg_simrank": (
            # wedge equi-join candidates; the s2 expansion is two more
            # equi-joins over the checkpointed s1 pairs — never a product
            lambda: graphalgo.q_simrank(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "web_anchor_entity_links": (
            # anchors extracted in the scan projection (Generate), alias
            # lexicon broadcast, one map-side-combinable (host, CUI) count
            lambda: webgraph.anchor_entity_links(spark, SF),
            ["Generate", "BroadcastHashJoin", "HashAggregate",
             "!SortMergeJoin", "!CartesianProduct"],
        ),
        "emb_dim_corr_top": (
            # d^2-bounded gram + broadcast moment joins + TakeOrdered top-k
            lambda: emblinalg.dim_corr_top(spark, SF),
            ["TakeOrderedAndProject", "BroadcastHashJoin",
             "!SortMergeJoin"],
        ),
        "tpch_product_profit": (
            # part + supplier⋈nation broadcast onto the fact scan; one
            # orderkey join + the small (nation, year) aggregate
            lambda: relops.tpch_product_profit(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "tpch_parts_supplier": (
            # fact collapsed to DISTINCT (part, supp) before dims attach;
            # anti-join + dim join both broadcast
            lambda: relops.tpch_parts_supplier(spark, SF),
            ["HashAggregate", "BroadcastHashJoin", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "tpch_potential_promotion": (
            # type-filtered part list broadcast into the year-pruned fact
            # scan; HAVING threshold shrinks to a broadcast semi-join
            lambda: relops.tpch_potential_promotion(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_betweenness": (
            # forward/backward sweeps are checkpointed per level; the
            # returned plan is the delta union + grouped sum — no product
            lambda: graphalgo.q_betweenness(spark, SF),
            ["HashAggregate", "Union", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "emb_knn_graph": (
            # per-cell exact-int64 pair scoring in ONE Arrow-grouped
            # applyInPandas (never corpus^2); mutual flag is an equi-join
            # of the k*n kNN edge set
            lambda: simsearch.knn_graph(spark, SF, use_cache=False),
            ["FlatMapGroupsInPandas", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        # --- round-3 ninth-batch additions ---
        "web_boilerplate_strip": (
            # explode once; boiler set via (host, chunk) partial agg; the
            # removal is an anti-join, never a product
            lambda: webclean.boilerplate_strip(spark, SF),
            ["Generate", "HashAggregate", "!CartesianProduct"],
        ),
        "text_ccnet_buckets": (
            lambda: textstats.ccnet_buckets(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "corpus_dup_spans": (
            # sliding windows explode + ONE window-key agg + per-doc island
            # merge window (partitioned by doc_id, never a global sort)
            lambda: webclean.dup_spans(spark, SF),
            ["Generate", "Window", "!CartesianProduct", "!Sort [", ],
        ),
        "kg_edge_history": (
            # temporal annotations ride the SAME pair-join groupBy as the
            # static edge build; the incidence input is the session-cached
            # checkpoint (lang pushdown audited once at its builder), so
            # the plan starts from the in-memory scan
            lambda: relations.q_edge_history(spark, SF),
            ["HashAggregate", "BroadcastHashJoin", "!CartesianProduct"],
        ),
        "kg_edge_provenance": (
            lambda: relations.q_edge_provenance(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "corpus_cdc_chunks": (
            # content-defined boundaries via per-doc running window; chunk
            # dup-rate via one chunk-key partial agg
            lambda: webclean.cdc_chunks(spark, SF),
            ["Generate", "Window", "HashAggregate", "!CartesianProduct"],
        ),
        "text_distinct_ngrams": (
            lambda: textstats.distinct_ngrams(spark, SF),
            ["Generate", "HashAggregate",
             "ReadSchema: struct<text:string,source:string>"],
        ),
        "kg_ontology_reduction": (
            # literal closure self-join: broadcast joins + broadcast
            # anti-join, no exchange-heavy SMJ on the tiny metadata tables
            lambda: hierarchy.ontology_reduction(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!SortMergeJoin",
             "!CartesianProduct"],
        ),
        "web_trustrank_edges": (
            # the trust iteration's edge build: anchor synthesis explode +
            # distinct — the only corpus-scale stage of q_trustrank
            lambda: webgraph._intra_edges(spark, SF),
            ["Generate", "HashAggregate",
             "ReadSchema: struct<doc_id:bigint,text:string>"],
        ),
        "kg_shortest_path_tree": (
            # parent assignment over the checkpointed BFS table: equi-joins
            # (checkpoint scans carry no stats, so Catalyst picks SMJ —
            # the scale-correct side anyway: visited is graph-sized) + one
            # min() agg, no product
            lambda: graphalgo.q_shortest_path_tree(spark, SF),
            ["SortMergeJoin", "Union", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "events_decay_topk": (
            # scan prunes to (ts, event_type); weights are LUT+shift
            # expressions; one partial-agg shuffle
            lambda: relops.events_decay_topk(spark, SF),
            ["HashAggregate",
             "ReadSchema: struct<ts:timestamp_ntz,event_type:string>"],
        ),
        "corpus_inverted_index": (
            lambda: corpusops.inverted_index(spark, SF),
            ["Generate", "HashAggregate",
             "ReadSchema: struct<doc_id:bigint,text:string>"],
        ),
        "corpus_phrase_search": (
            # two posting lists equi-joined on doc_id; adjacency is a
            # row-local array intersection
            lambda: corpusops.phrase_search(spark, SF),
            ["Generate", "HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "events_item_similarity": (
            # per-user pair self-join is an equi-join on user_id; counts
            # partial-agg; cosine normalization via two broadcast joins
            lambda: relops.events_item_similarity(spark, SF),
            ["HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "kg_metapath_counts": (
            # typed-midpoint equi-join over the cached triple build
            lambda: webkg.q_metapath_counts(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "text_code_switch": (
            # map-only: chunk classification + row-local entropy MUST ride
            # the scan with zero exchanges
            lambda: textstats.code_switch(spark, SF),
            ["ReadSchema: struct<doc_id:bigint,text:string>", "!Exchange"],
        ),
        "events_ab_test": (
            lambda: relops.events_ab_test(spark, SF),
            ["HashAggregate",
             "ReadSchema: struct<user_id:bigint,event_type:string>"],
        ),
        "kg_harmonic": (
            # landmark BFS feeds ONE keyed aggregation; integer LCM weights
            # mean no float accumulation crosses the exchange
            lambda: graphalgo.q_harmonic(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_topo_layers": (
            # driver-side longest-path DP: the layering enters the plan
            # as a literal scan — no joins, no exchanges at all
            lambda: hierarchy.topo_layers(spark),
            ["!Exchange", "!SortMergeJoin", "!BroadcastHashJoin"],
        ),
        "events_ewma": (
            # EWMA as lag() columns riding ONE per-user sort — exactly one
            # Window, no self-join
            lambda: relops.events_ewma(spark, SF),
            ["Window", "!Join"],
        ),
        "corpus_kneser_ney": (
            # all KN statistics derive from the aggregated bigram table;
            # the type total is a broadcast 1-row; final top-k TakeOrdered
            lambda: corpusops.kneser_ney(spark, SF),
            ["HashAggregate", "TakeOrderedAndProject", "!CartesianProduct"],
        ),
        "ann_jl_topk": (
            # sketch shortlist then exact rerank: broadcast 1-row query,
            # two stacked TakeOrdereds, no shuffle of the vectors
            lambda: simsearch.jl_topk(spark, SF),
            ["BroadcastNestedLoopJoin", "TakeOrderedAndProject",
             "!SortMergeJoin"],
        ),
        "events_window_hll": (
            # register maxima are a plain partial-agg groupBy; nothing
            # nested-loop shaped anywhere
            lambda: relops.events_window_hll(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "er_phonetic_keys": (
            # vocab distinct + row-local soundex: scan reads ONLY text
            lambda: er.phonetic_keys(spark, SF),
            ["ReadSchema: struct<text:string>", "HashAggregate"],
        ),
        "er_phonetic_pairs": (
            # blocking is an equi-join on the 4-char code — never all-pairs
            lambda: er.phonetic_pairs(spark, SF),
            ["!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "events_k_anonymity": (
            # two stacked partial aggs on low-cardinality QI keys, no sort
            lambda: relops.events_k_anonymity(spark, SF),
            ["HashAggregate", "!Window", "!Join"],
        ),
        "text_heaps_law": (
            # the ~log2(N)-row checkpoint list joins via broadcast theta
            # (INTENDED BroadcastNestedLoop: tiny build side by design)
            lambda: textstats.heaps_law(spark, SF),
            ["BroadcastNestedLoopJoin", "HashAggregate", "!SortMergeJoin"],
        ),
        "corpus_bpe_fertility": (
            # composed-projection merges + one source-key rollup
            lambda: corpusops.bpe_fertility(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_coreness_round": (
            # H-index round: the neighbor-rank window partitions by the
            # NODE (fan-out = degree) — never a global single-partition
            # sort (the public loop localCheckpoints between rounds, so the
            # round builder is what carries the plan)
            lambda: graphalgo._coreness_round(
                graphalgo._edges(spark, SF, 2),
                graphalgo._edges(spark, SF, 2)
                .groupBy("src")
                .agg(F.count(F.lit(1)).cast("bigint").alias("val")),
            ),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "events_peak_concurrency": (
            # sweep line: within-day windows + the days-sized offset table
            # broadcast back; no corpus-wide single-partition window
            lambda: relops.events_peak_concurrency(spark, SF),
            ["Window", "BroadcastHashJoin"],
        ),
        "kg_skew_report": (
            # ranked window runs over the TakeOrdered top-10 only
            lambda: graphalgo.q_skew_report(spark, SF),
            ["TakeOrderedAndProject", "Window"],
        ),
        "emb_anisotropy": (
            # posexplode + 64-row partial agg; the 1-row total crossJoins
            # back via broadcast — no nested-loop over data
            lambda: simsearch.anisotropy(spark, SF),
            ["HashAggregate", "Generate", "!SortMergeJoin"],
        ),
        "emb_pair_cosine_hist": (
            # offset pairing IS an equi-join: hash join, never Cartesian
            lambda: simsearch.pair_cosine_hist(spark, SF),
            ["!CartesianProduct", "HashAggregate"],
        ),
        "corpus_bloom_fpr": (
            # k-way bit semi-join against the register relation: hash joins
            # on the bit key, no filter object on the driver, no Cartesian
            lambda: corpusops.bloom_fpr(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "emb_intrinsic_dim": (
            # composes the cell-blocked kNN graph; the rollup is one 1-row
            # aggregate — no second corpus-wide join
            lambda: simsearch.intrinsic_dim(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "corpus_contamination_report": (
            # both passes broadcast the eval split; roll-up joins run over
            # flagged sets only
            lambda: corpusops.contamination_report(spark, SF),
            ["BroadcastHashJoin", "!SortMergeJoin"],
        ),
        "web_outlink_entropy": (
            # rides the link-graph cache: InMemory/checkpoint scan + one
            # host-keyed groupBy, no corpus rescan
            lambda: webgraph.outlink_entropy(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "events_rfm_segments": (
            # one user-keyed shuffle + 1-row exactq quartile broadcast; the
            # only Window is the cumulative sum over the VALUE HISTOGRAM
            # (bounded by the measure domain), never an ntile over users
            lambda: relops.events_rfm_segments(spark, SF),
            ["HashAggregate", "Window", "!SortMergeJoin"],
        ),
        "er_tfidf_pairs": (
            # rare-token blocking + weighted-dot equi-joins: hash joins
            # only, never all-pairs
            lambda: er.tfidf_pairs(spark, SF),
            ["!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "events_props_profile": (
            # from_json map explode rides the scan; dominant type is a
            # window over the keys-sized table
            lambda: relops.events_props_profile(spark, SF),
            ["Generate", "HashAggregate"],
        ),
        "corpus_shingle_growth": (
            # first-seen bucket is one grouped MIN — no self-join, no sort
            lambda: corpusops.shingle_growth(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!Window"],
        ),
        "events_benford": (
            # one (type, digit) partial agg; per-type total is a window
            # over the <=9-rows-per-type aggregate, never the raw log
            lambda: statops.events_benford(spark, SF),
            ["HashAggregate", "Window", "!SortMergeJoin"],
        ),
        "events_pettitt": (
            # two per-type window sorts (rank by value, prefix-sum by
            # time) — same budget as events_cusum; peak join is |types|
            lambda: statops.events_pettitt(spark, SF),
            ["Window", "!CartesianProduct"],
        ),
        "events_acf": (
            # raw log collapses to (type, hour) in one partial agg; spine
            # + lead windows ride the tiny hourly aggregate
            lambda: statops.events_acf(spark, SF),
            ["HashAggregate", "Window", "Generate"],
        ),
        "text_yule_k": (
            # explode -> term count (one shuffle), spectrum + fold on the
            # type table; scan prunes to text only
            lambda: textstats.yule_k(spark, SF),
            ["ReadSchema: struct<text:string>", "HashAggregate",
             "!Window", "!SortMergeJoin"],
        ),
        "corpus_cluster_topics": (
            # kmeans assignment is the map-only argmin; token counts one
            # shuffle; idf/total ride window + 1-row broadcast over the
            # (k x types) aggregate
            lambda: curate.cluster_topics(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "corpus_mmr_topk": (
            # shortlist via TakeOrdered off ONE corpus pass; final table
            # is a 5-id pushed-down point lookup
            lambda: curate.mmr_topk(spark, SF),
            ["PushedFilters", "!SortMergeJoin"],
        ),
        "metric_sample_kl": (
            # sampler is a map-only predicate; both count tables are tiny
            # source-keyed partial aggs; totals are 1-row broadcasts
            lambda: curate.sample_kl(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!SortMergeJoin"],
        ),
        "events_mann_kendall": (
            # the operator's returned DF is an eager localCheckpoint scan
            # (lineage truncation); audit the constituent instead: the
            # hourly collapse is ONE partial agg off the scan and the
            # O(H^2) sign-pair join is an event_type equi-join over the
            # tiny hourly aggregate — no Cartesian anywhere
            lambda: (lambda s: s.alias("a").join(
                s.alias("b"),
                (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.hr") < F.col("b.hr"))))(
                statops._hourly_series(spark, SF)),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "events_theil_sen": (
            # same checkpoint note; the median sort windows the PAIR
            # table partitioned per type, never the raw log — audited on
            # the slope-rank composition rebuilt from the shared hourly
            # series
            lambda: (lambda s, W: s.alias("a").join(
                s.alias("b"),
                (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.hr") < F.col("b.hr")))
                .select(F.col("a.event_type").alias("event_type"),
                        (F.col("b.c") - F.col("a.c")).alias("slope_micro"))
                .withColumn("rn", F.row_number().over(
                    W.partitionBy("event_type").orderBy("slope_micro"))))(
                statops._hourly_series(spark, SF),
                __import__("pyspark.sql", fromlist=["Window"]).Window),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "corpus_lexrank": (
            # sentence chunking rides the scan (Generate); the similarity
            # join is doc-local equi-keyed — no Cartesian / nested-loop
            lambda: corpusops.lexrank_sentences(spark, SF),
            ["Generate", "HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "shard_rendezvous_plan": (
            # HRW argmax is a scan-projection expression: ONE shuffle
            # (the 8-row shard groupBy), no join, no window over the log
            lambda: shardops.rendezvous_plan(spark, SF),
            ["ReadSchema: struct<doc_id:bigint,text:string>",
             "HashAggregate", "!SortMergeJoin", "!BroadcastHashJoin"],
        ),
        "corpus_priority_sample": (
            # the ranked stage is an eager localCheckpoint (lineage cut);
            # the estimator itself aggregates k checkpointed rows against
            # the 1-row tau broadcast — audit THAT composition
            lambda: trainprep.priority_sample_audit(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!CartesianProduct"],
        ),
        "events_delete_plan": (
            # victim flag is a scan expression; ONE partition-key groupBy
            lambda: relops.events_delete_plan(spark, SF),
            ["HashAggregate", "!Window", "!SortMergeJoin",
             "!BroadcastHashJoin"],
        ),
        "metric_join_size_est": (
            # two key-count aggregates + a broadcast-joinable key join;
            # the estimated join itself never executes
            lambda: metrics.join_size_est(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!SortMergeJoin"],
        ),
        "kg_amie_rules": (
            # rule bodies are entity-id equi-joins over the distinct fact
            # set; predicate-level rollups are 4x4-sized
            lambda: relations.q_amie_rules(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_triple_confidence": (
            # bounded per-doc pair self-join + exact integer micro-nat agg
            lambda: relations.q_triple_confidence(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_weak_supervision": (
            # same shuffle shape as q_llr_scores: one pair groupBy +
            # broadcast marginals; the three-LF vote is a map projection
            lambda: relations.q_weak_supervision_vote(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_domain_range_audit": (
            # two broadcast semtype lookups + one schema-sized rollup
            lambda: relations.q_domain_range_audit(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "text_sentence_stats": (
            # map-only array expressions riding the scan
            lambda: textstats.sentence_stats(spark, SF),
            ["ReadSchema: struct<doc_id:bigint,text:string>",
             "!Exchange", "!BroadcastHashJoin"],
        ),
        "text_fasttext_score": (
            # hashed-bucket scoring is a scan projection, shuffle-free
            lambda: textstats.fasttext_score(spark, SF),
            ["ReadSchema: struct<doc_id:bigint,text:string>", "!Exchange"],
        ),
        "kg_truth_discovery": (
            # Sums iterations: integer groupBy per bipartite side + an
            # equi-join; per-source aggregates broadcast back
            lambda: relations.q_truth_discovery(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_conflict_resolution": (
            # one slot-partitioned support window + map-side slot rollup
            lambda: relations.q_conflict_resolution(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "metric_retrieval_ndcg": (
            # both rankings are TakeOrdered k-row sets; stats are 1-row
            # broadcasts — nothing beyond the corpus scan is big
            lambda: metrics.retrieval_ndcg(spark, SF),
            ["TakeOrderedAndProject", "HashAggregate"],
        ),
        "corpus_doc_skyline": (
            # grid prune: tiny bucket aggregate broadcast back; exact pass
            # windows run on the pruned survivor set only
            lambda: trainprep.doc_skyline(spark, SF),
            ["BroadcastHashJoin", "Window", "!CartesianProduct",
             "!SortMergeJoin"],
        ),
        "kg_entity_salience": (
            # occurrence scan + broadcast link lookup into ONE (doc, CUI)
            # groupBy; doc lengths join back on doc_id
            lambda: relations.q_entity_salience(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "metric_confidence_ece": (
            # two sparse pair sets equi-joined, 10-bin integer rollup
            lambda: metrics.confidence_ece(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "corpus_prf_expansion": (
            # explode + rollup touch only the k ranked docs; final cut is
            # a TakeOrdered
            lambda: corpusops.prf_expansion(spark, SF),
            ["Generate", "TakeOrderedAndProject", "HashAggregate"],
        ),
        "metric_triple_classification": (
            # bounded negative-sampling join + predicate-keyed aggregates
            # + broadcast 4-row threshold join
            lambda: kgembed.q_triple_classification(spark, SF),
            ["HashAggregate", "BroadcastHashJoin", "!CartesianProduct"],
        ),
        "events_fd_candidates": (
            # per-candidate expand + two-phase distinct aggregate; union
            # of 1-row results
            lambda: relops.events_fd_candidates(spark, SF),
            ["HashAggregate", "Union", "!SortMergeJoin"],
        ),
        "events_column_entropy": (
            # per-column value-keyed partial agg then 1-row rollup
            lambda: relops.events_column_entropy(spark, SF),
            ["HashAggregate", "Union", "!SortMergeJoin",
             "!BroadcastHashJoin"],
        ),
        "metric_selectivity_est": (
            # 1-row stats broadcast over the scan, B-row bucket groupBy,
            # filtered count — no windows, no big joins
            lambda: metrics.selectivity_est(spark, SF),
            ["HashAggregate", "!SortMergeJoin", "!Window"],
        ),
        "events_grouping_sets": (
            # Expand feeding ONE partial-aggregated shuffle — not four
            # scans unioned
            lambda: relops.events_grouping_sets(spark, SF),
            ["Expand", "HashAggregate", "!Union", "!SortMergeJoin"],
        ),
        "mm_video_neardup": (
            # Arrow decode lane; candidates only via the frame-hash
            # equi-join (df-capped) — never a clip-pair cross join
            lambda: multimodal.video_neardup_pairs(spark, SF),
            ["MapInPandas", "HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "kg_context_patterns": (
            # bounded pair join + token-array re-join; top-k window over
            # the label-pair aggregate only
            lambda: relations.q_context_patterns(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "metric_gap_ablation": (
            # two bounded extraction chains + a 3-col distinct join
            lambda: relations.q_gap_ablation(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_rule_inference": (
            # broadcast rule joins on the predicate column; chain body is
            # the capped z equi-join; new-fact check is one anti-join
            lambda: relations.q_rule_inference(spark, SF),
            ["BroadcastHashJoin", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "events_seq_patterns": (
            # stream collapses to the (user, type) partial agg before the
            # bounded per-user self-join; both marginals broadcast
            lambda: relops.events_seq_patterns(spark, SF),
            ["HashAggregate", "BroadcastHashJoin", "!CartesianProduct"],
        ),
        "events_sax_motifs": (
            # both windows run on the (type, hour) aggregate, never the
            # raw stream; motif count is map-side combinable
            lambda: statops.events_sax_motifs(spark, SF),
            ["Window", "HashAggregate"],
        ),
        "events_stl_decompose": (
            # rows-frame trend window on the hourly aggregate; 24-row
            # seasonal profile broadcast back
            lambda: statops.events_stl_decompose(spark, SF),
            ["Window", "BroadcastHashJoin", "HashAggregate"],
        ),
        "kg_pathsim": (
            # support-thresholded pair join + broadcast diagonal; no
            # all-pairs anywhere
            lambda: relations.q_pathsim(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_sage_agg": (
            # one edge self-equi-join against the degree agg; pooling
            # reuses the edge shuffle key
            lambda: graphalgo.q_sage_agg(spark, SF),
            ["HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "mm_audio_fingerprint": (
            # row-local HOF fingerprints; candidates only via the
            # df-capped fingerprint equi-join
            lambda: multimodal.audio_fingerprint_pairs(spark, SF),
            ["HashAggregate", "!CartesianProduct",
             "!BroadcastNestedLoop"],
        ),
        "events_zonemap_prune": (
            # rank-based integer cut boundaries broadcast back as a 1-row
            # table; the only Window is the cumulative sum over the cents
            # HISTOGRAM (price-domain bounded), never a corpus sort
            lambda: relops.events_zonemap_prune(spark, SF),
            ["HashAggregate", "BroadcastNestedLoop", "Window"],
        ),
        "kg_kge_scorecard": (
            # four map-only scoring lanes unioned under a literal tag; the
            # eval aggregate is partial-agg combinable (4 output rows)
            lambda: kgembed.q_kge_scorecard(spark, SF),
            ["Union", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_mention_qualifiers": (
            # one token posexplode feeds both mention and cue filters; the
            # proximity join is doc-keyed (position band as residual) —
            # never a cross join
            lambda: webkg.q_mention_qualifiers(spark, SF),
            ["Generate", "HashAggregate", "!CartesianProduct"],
        ),
        "shard_ring_plan": (
            # assignment is a literal-array expression on the scan (zero
            # shuffle before the 8-row groupBy); no join against a ring
            # table, no window over the corpus
            lambda: shardops.ring_plan(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!SortMergeJoin"],
        ),
        "kg_incremental_update": (
            # delta lane: snapshot filter evaluated in the codegen'd Filter
            # directly on the scan, BELOW the MapInPandas NER stage (at
            # deployment: Iceberg partition pruning); merge is one
            # full-outer join of two pre-aggregated pair tables
            lambda: kgdelta.incremental_update(spark, SF),
            ["MapInPandas", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_temporal_edges": (
            # derived crawl_day rides the shared doc_cui substrate; one
            # grouped (min, max, count-distinct) shuffle on the pair key
            lambda: kgdelta.temporal_edges(spark, SF),
            ["HashAggregate", "!CartesianProduct", "!BroadcastNestedLoop"],
        ),
        "kg_salt_plan": (
            # lexicon-sized per-CUI count; the total attaches as the
            # labeled 1-row broadcast (BroadcastNestedLoopJoin)
            lambda: kgdelta.salt_plan(spark, SF),
            ["HashAggregate", "BroadcastNestedLoop", "!CartesianProduct"],
        ),
        "kg_entity_trend": (
            # lag window PARTITIONED by CUI over the bounded week series —
            # never a single-partition corpus window
            lambda: kgdelta.entity_trend(spark, SF),
            ["Window", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_nil_clusters": (
            # vocab-sized surface aggregate left-joined to the per-surface
            # best score; mention scan feeds it once
            lambda: kgdelta.nil_clusters(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
        "kg_alias_candidates": (
            # NIL surface set broadcast onto the mention incidence; the
            # co-mention join is doc-keyed with per-doc-CUI-bounded
            # fan-out — no cartesian, no sort-merge against the corpus
            lambda: kgdelta.alias_candidates(spark, SF),
            ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
        ),
        "kg_source_diversity": (
            # source column rides the doc-keyed pair join; two stacked
            # grouped aggregations, HHI folded as integer expressions
            lambda: kgdelta.source_diversity(spark, SF),
            ["HashAggregate", "!CartesianProduct"],
        ),
    }

    lines = [
        "# PLANS — physical-plan evidence for the headline queries\n",
        "Generated by tools/explain_report.py (`.explain(\"formatted\")` at "
        "sf0.01).\nAsserted properties: filter pushdown to the parquet scan, "
        "column-pruned\nReadSchema, BroadcastHashJoin for lookup joins, "
        "WholeStageCodegen spans.\n",
        AUDIT_SECTION,
    ]
    failed = []
    for name, (factory, fragments) in checks.items():
        plan = plan_of(factory())
        # "frag" must appear; "!frag" must NOT appear
        missing = [
            f
            for f in fragments
            if ((f[1:] in plan) if f.startswith("!") else (f not in plan))
        ]
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failed.append((name, missing))
        print(f"{status:40s} {name}")
        # summarize the interesting lines only
        keep = [
            ln
            for ln in plan.splitlines()
            if re.search(
                r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|"
                r"BroadcastNestedLoop|TakeOrderedAndProject|"
                r"codegen id|Exchange|Window|HashAggregate",
                ln,
            )
        ]
        lines.append(f"\n## {name} — {status}\n\n```")
        lines.extend(keep[:40])
        lines.append("```")

    plans_path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    # preserve the hand-audited tail (sections reviewed manually, not in
    # the checks dict) across regenerations
    tail = ""
    marker = "# Hand-audited sections"
    if os.path.exists(plans_path):
        prev = open(plans_path).read()
        idx = prev.find(marker)
        if idx != -1:
            tail = "\n\n" + prev[idx:].rstrip() + "\n"
    with open(plans_path, "w") as fh:
        fh.write("\n".join(lines) + "\n" + tail)
    print("\nwrote PLANS.md")
    if failed:
        print(f"FAILED checks: {failed}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
