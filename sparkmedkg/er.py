"""Entity resolution over the crawl corpus: blocked sorted-neighborhood
candidate generation + edit-distance verify, and survivorship (canonical
record construction) over near-dup clusters.

The reference canonicalizes entities only by exact CUI identity
(/root/reference/pymedgraph/graph/neo4jconnector.py MERGE-by-id); a
web-scale KG build also needs record-level ER: finding records that are
the *same entity* despite textual noise, then collapsing each cluster to
one canonical survivor.  Both stages here are DuckDB-oracle-gated.

Sorted-neighborhood at scale: the textbook method globally sorts all
records and slides a window — a global total order is a single-partition
bottleneck on a cluster, so this implementation uses the standard
*blocked* variant: records are hashed into blocks by a normalized key
prefix, sorted within each block (per-block window = per-key shuffle,
fully parallel), and paired within ``W`` positions via an offset-explode
EQUI-join (never a range/theta join).  Multi-pass SNM (a second pass with
a rotated key) is the recall lever at scale; one deterministic pass is
gated here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SN_WINDOW = 4          # neighborhood size (pairs within W-1 positions)
SN_PREFIX = 4          # block key: first chars of the normalized text
LEV_PREFIX = 64        # edit distance computed on this normalized prefix
LEV_MAX = 16           # emit pairs at or below this distance


def _norm(col):
    """Lowercased text with whitespace collapsed — the ER sort key base."""
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def _sql_norm(expr: str) -> str:
    return rf"regexp_replace(lower({expr}), '\s+', ' ', 'g')"


def sorted_neighborhood(
    spark: SparkSession,
    sf_dir: str,
    window: int = SN_WINDOW,
    lev_max: int = LEV_MAX,
) -> DataFrame:
    """(a, b, lev) candidate duplicate pairs: records sharing a block
    (normalized-text prefix), within ``window`` positions in the
    block-local sort order, whose normalized-prefix edit distance is at
    most ``lev_max``.  a < b.

    One shuffle on the block key (row_number window), then an equi-join on
    (block, rn + offset) built by exploding the 1..W-1 offset array — the
    join never degenerates to a range predicate, and per-block work is
    |block| * (W-1).  The levenshtein verify runs on a fixed 64-char
    normalized prefix so per-pair cost is bounded."""
    from sparkmedkg.session import widen_scan

    docs = widen_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", _norm(F.col("text")).alias("norm"))
    keyed = docs.select(
        "doc_id",
        F.substring("norm", 1, SN_PREFIX).alias("block"),
        F.substring("norm", 1, LEV_PREFIX).alias("sig"),
        F.col("norm").alias("sk"),
    )
    w = Window.partitionBy("block").orderBy("sk", "doc_id")
    ranked = keyed.withColumn("rn", F.row_number().over(w))
    left = ranked.select(
        "block",
        F.col("doc_id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        "rn",
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("off"),
    ).withColumn("rn_b", F.col("rn") + F.col("off"))
    right = ranked.select(
        "block",
        F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("rn").alias("rn_b"),
    )
    pairs = left.join(right, ["block", "rn_b"]).withColumn(
        "lev", F.levenshtein("sig_a", "sig_b")
    )
    return (
        pairs.where(F.col("lev") <= lev_max)
        .select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
            "lev",
        )
        .distinct()
    )


def sql_sorted_neighborhood(
    window: int = SN_WINDOW, lev_max: int = LEV_MAX
) -> str:
    norm = _sql_norm("text")
    return f"""
WITH keyed AS (
  SELECT doc_id,
         substring({norm}, 1, {SN_PREFIX}) AS block,
         substring({norm}, 1, {LEV_PREFIX}) AS sig,
         {norm} AS sk
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY block ORDER BY sk, doc_id) AS rn
  FROM keyed
),
pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b,
         levenshtein(l.sig, r.sig) AS lev
  FROM ranked l
  JOIN ranked r
    ON l.block = r.block
   AND r.rn - l.rn BETWEEN 1 AND {window - 1}
)
SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b, lev
FROM pairs WHERE lev <= {lev_max}
"""


# ---------------------------------------------------------------------------
# Survivorship: canonical record per near-dup cluster.
# ---------------------------------------------------------------------------

def survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rep_id, cluster_size, canon_text_id, canon_source, n_langs): one
    canonical record per near-dup cluster (dedup.dedup_clusters), built
    with deterministic survivorship rules — the longest member's text wins
    (ties to the smallest doc_id via a unique max_by key), the
    lexicographically smallest source wins, language variety is counted.

    The cluster table is orders of magnitude smaller than the corpus (only
    docs in >= 1 near-dup pair), so the member-attribute join broadcasts
    and the rollup is one small aggregation — the corpus-scale work
    remains dedup_clusters' single prefix join."""
    from sparkmedkg import dedup

    members = dedup.dedup_clusters(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang", "n_chars"
    )
    joined = members.join(docs, "doc_id").withColumn(
        # unique per member: longest text wins, ties to smallest doc_id
        "pick_key",
        F.col("n_chars") * F.lit(2**32) - F.col("doc_id"),
    )
    return joined.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.expr("max_by(doc_id, pick_key)").alias("canon_text_id"),
        F.min("source").alias("canon_source"),
        F.countDistinct("lang").alias("n_langs"),
    )


def sql_survivorship() -> str:
    # the proven dedup_clusters oracle (brute-force pairs + recursive-CTE
    # closure) wrapped as a members CTE, then the same survivorship rollup
    from sparkmedkg.dedup import sql_dedup_clusters

    members = sql_dedup_clusters().strip()
    return f"""
WITH members AS ({members}),
joined AS (
  SELECT m.rep_id, d.doc_id, d.source, d.lang,
         d.n_chars * 4294967296 - d.doc_id AS pick_key
  FROM members m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT rep_id, COUNT(*) AS cluster_size,
       arg_max(doc_id, pick_key) AS canon_text_id,
       MIN(source) AS canon_source,
       COUNT(DISTINCT lang) AS n_langs
FROM joined GROUP BY rep_id
"""


# ---------------------------------------------------------------------------
# Phonetic blocking (simplified Soundex) — spelling-variant candidate pairs.
# ---------------------------------------------------------------------------

SOUNDEX_MAP = "01230120022455012623010202"  # a..z -> classic Soundex digits
PHON_MIN_LEN = 4   # tokens shorter than this are too ambiguous to block
PHON_LEV_MAX = 2   # verify: edit distance bound inside a phonetic block


def _soundex(tok) -> "F.Column":
    """Simplified Soundex over a lowercase alpha token — classic digit
    map, adjacent-duplicate collapse, vowel drop, first letter + 3 digits
    zero-padded.  (h/w are folded with vowels rather than skipped — the
    one simplification vs the 1918 spec, applied identically in the SQL
    twin.)  Pure JVM expression: translate + HOF filter, no UDF."""
    m = F.translate(tok, "abcdefghijklmnopqrstuvwxyz", SOUNDEX_MAP)
    arr = F.split(m, "")
    kept = F.filter(
        arr,
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(arr, F.greatest(i, F.lit(1)))),
    )
    digits = F.filter(F.slice(kept, 2, 2_000_000), lambda d: d != "0")
    return F.concat(
        F.upper(F.substring(tok, 1, 1)),
        F.rpad(F.substring(F.array_join(digits, ""), 1, 3), 3, "0"),
    )


def _sql_soundex(tok: str) -> str:
    m = f"translate({tok}, 'abcdefghijklmnopqrstuvwxyz', '{SOUNDEX_MAP}')"
    kept = (
        f"[{m}[i] for i in generate_series(1, len({m})) "
        f"if i = 1 OR {m}[i] <> {m}[i-1]]"
    )
    digits = f"list_filter(({kept})[2:], d -> d <> '0')"
    # COALESCE: DuckDB's array_to_string([]) is NULL, Spark's is '' — the
    # all-vowel-tail case ('key' -> K000) must not produce a NULL code.
    return (
        f"upper({tok}[1]) || "
        f"rpad(substr(COALESCE(array_to_string({digits}, ''), ''), 1, 3), "
        f"3, '0')"
    )


def phonetic_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, code): the simplified-Soundex code for every distinct alpha
    token of length >= PHON_MIN_LEN in the corpus — the blocking-key
    table phonetic_pairs joins on, gated separately because the code
    expression (translate + HOF collapse + pad) is the cross-engine
    risk surface; the pair join above it is a plain equi-join.  The
    synthetic vocabulary is phonetically disjoint (every code maps to
    one token, so phonetic_pairs is empty on the testdata by
    construction); variant-bearing vocabularies exercise the pair path
    via the unit test's robert/rupert fixture."""
    from sparkmedkg.session import widen_scan

    toks = (
        widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .where(
            F.col("tok").rlike("^[a-z]+$")
            & (F.length("tok") >= PHON_MIN_LEN)
        )
        .distinct()
    )
    return toks.select("tok", _soundex(F.col("tok")).alias("code"))


def sql_phonetic_keys() -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT w AS tok
  FROM documents, LATERAL unnest(string_split(lower(text), ' ')) t(w)
  WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= {PHON_MIN_LEN}
)
SELECT tok, {_sql_soundex('tok')} AS code FROM toks
"""


def phonetic_pairs(
    spark: SparkSession, sf_dir: str, lev_max: int = PHON_LEV_MAX
) -> DataFrame:
    """(tok_a, tok_b, code, lev): spelling-variant candidate pairs —
    distinct corpus tokens that SOUND alike (same simplified-Soundex
    code) and are within ``lev_max`` edits.  The phonetic complement to
    sorted_neighborhood's prefix blocking: 'filter'/'philter' share no
    prefix but share F436.  Typo/variant mining for lexicon curation and
    ER blocking-key design.

    Scale: blocking runs on the DISTINCT token vocabulary (orders of
    magnitude below the corpus — one explode + one distinct shuffle),
    the code is a row-local JVM expression, and the pair join is an
    equi-join on the 4-char code; the levenshtein verify touches only
    same-code pairs.  Zipfian vocabularies keep phonetic buckets small
    (they group spellings, not occurrences), so no hot-key cap is
    needed where containment-style shingle joins want one."""
    coded = phonetic_keys(spark, sf_dir)
    a = coded.select(F.col("tok").alias("tok_a"), "code")
    b = coded.select(F.col("tok").alias("tok_b"), "code")
    return (
        a.join(b, "code")
        .where(F.col("tok_a") < F.col("tok_b"))
        .withColumn("lev", F.levenshtein("tok_a", "tok_b"))
        .where(F.col("lev") <= lev_max)
        .select("tok_a", "tok_b", "code", F.col("lev").cast("bigint").alias("lev"))
    )


def sql_phonetic_pairs(lev_max: int = PHON_LEV_MAX) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT w AS tok
  FROM documents, LATERAL unnest(string_split(lower(text), ' ')) t(w)
  WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= {PHON_MIN_LEN}
),
coded AS (SELECT tok, {_sql_soundex('tok')} AS code FROM toks)
SELECT a.tok AS tok_a, b.tok AS tok_b, a.code,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS lev
FROM coded a JOIN coded b ON a.code = b.code
WHERE a.tok < b.tok AND levenshtein(a.tok, b.tok) <= {lev_max}
"""


# ---------------------------------------------------------------------------
# Meta-blocking: weighted comparison-graph pruning (Papadakis et al.).
# ---------------------------------------------------------------------------

MB_BLOCK_CAP = 50   # block purging: drop shingle blocks with df > cap


def metablocking(
    spark: SparkSession, sf_dir: str, block_cap: int = MB_BLOCK_CAP
) -> DataFrame:
    """(a, b, cbs, keep): the meta-blocking comparison graph — candidate
    record pairs weighted by how many blocks they co-occur in (CBS,
    common-blocks scheme), with Weighted Edge Pruning: ``keep`` marks
    pairs at or above the mean edge weight.  Token/shingle blocking
    over-generates (any shared phrase makes a pair); meta-blocking keeps
    the redundancy SIGNAL — pairs sharing many blocks are likelier
    matches — and prunes the long tail of single-block coincidences
    before the expensive pairwise verify stage.  Blocks are the word
    3-shingles of dedup.doc_shingles, purged of stop-phrase blocks with
    document frequency > ``block_cap`` (block purging caps per-block
    pair fan-out at cap^2/2, the standard scale guard).

    Scale: one DF count on the shingle table (map-side combinable), the
    pair generation is an equi-join restricted to surviving blocks
    (bounded by cap per block, never corpus^2), the CBS weight one
    shuffle keyed on (a, b), and the WEP threshold a broadcast 1-row
    aggregate.  The prune decision is exact integer arithmetic —
    keep iff cbs * n_edges >= total_weight — so the flag is
    bit-identical across engines (no double mean)."""
    from sparkmedkg import dedup

    sh = dedup.doc_shingles(spark, sf_dir)
    blocks = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= block_cap))
        .select("shingle")
    )
    kept = sh.join(blocks, "shingle")
    a = kept.select(F.col("doc_id").alias("a"), "shingle")
    b = kept.select(F.col("doc_id").alias("b"), "shingle")
    edges = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    tot = edges.agg(
        F.sum("cbs").alias("w_total"), F.count(F.lit(1)).alias("n_edges")
    )
    return (
        edges.join(F.broadcast(tot))
        .select(
            "a",
            "b",
            "cbs",
            (F.col("cbs") * F.col("n_edges") >= F.col("w_total")).alias(
                "keep"
            ),
        )
    )


def sql_metablocking(block_cap: int = MB_BLOCK_CAP) -> str:
    from sparkmedkg import dedup

    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, unnest({dedup._sql_shingles()}) AS shingle FROM documents
),
blocks AS (
  SELECT shingle FROM (
    SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
  ) WHERE df BETWEEN 2 AND {block_cap}
),
kept AS (SELECT doc_id, shingle FROM sh JOIN blocks USING (shingle)),
edges AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS cbs
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tot AS (SELECT SUM(cbs) AS w_total, COUNT(*) AS n_edges FROM edges)
SELECT a, b, cbs,
       cbs * n_edges >= w_total AS keep
FROM edges, tot
"""


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood join (Bocek et al.): all pairs within edit
# distance 1 on the record signature.
# ---------------------------------------------------------------------------

FASTSS_LEN = 12  # signature length — bounds the neighborhood at LEN+1 keys


def fastss_pairs(
    spark: SparkSession, sf_dir: str, sig_len: int = FASTSS_LEN
) -> DataFrame:
    """(a, b, lev): every record pair whose normalized ``sig_len``-char
    signature is within edit distance 1, found WITHOUT any similarity
    scan: each record emits its signature plus all single-character
    deletions (sig_len + 1 keys), and two signatures at edit distance
    <= 1 are guaranteed to collide on at least one key (FastSS / deletion
    neighborhoods) — the exact-recall complement to the heuristic
    sorted-neighborhood and phonetic blockers, which can MISS true pairs
    outside their window/code.

    Plan: the neighborhood explode is row-local (HOF transform, no UDF);
    candidates come from ONE variant-key equi-join over the exploded
    table; the levenshtein verify runs on the 12-char signatures only
    (bounded per pair).  Key skew (a popular prefix) is the containment
    operator's hot-key problem — the signature join key is short enough
    to bucket-count and cap at true web scale (documented; exact here,
    mirrored by the oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring(_norm(F.col("text")), 1, sig_len).alias("sig")
    )
    variants = F.concat(
        F.array(F.col("sig")),
        F.transform(
            F.sequence(F.lit(1), F.length("sig")),
            lambda p: F.concat(
                F.col("sig").substr(F.lit(1), p - F.lit(1)),
                F.col("sig").substr(p + F.lit(1), F.lit(sig_len)),
            ),
        ),
    )
    keyed = docs.select(
        "doc_id", "sig", F.explode(F.array_distinct(variants)).alias("v")
    )
    cand = (
        keyed.alias("l")
        .join(keyed.alias("r"), "v")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.sig").alias("sa"),
            F.col("r.sig").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("lev", F.levenshtein("sa", "sb"))
        .where(F.col("lev") <= 1)
        .select("a", "b", F.col("lev").cast("bigint").alias("lev"))
    )


def sql_fastss_pairs(sig_len: int = FASTSS_LEN) -> str:
    sig = f"substring({_sql_norm('text')}, 1, {sig_len})"
    return f"""
WITH sigs AS (SELECT doc_id, {sig} AS sig FROM documents),
keyed AS (
  SELECT doc_id, sig,
         unnest(list_distinct(
           [sig] || [substring(sig, 1, p - 1) ||
                     substring(sig, p + 1, {sig_len})
                     for p in generate_series(1, len(sig))])) AS v
  FROM sigs
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS sa, r.sig AS sb
  FROM keyed l JOIN keyed r ON l.v = r.v AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(levenshtein(sa, sb) AS BIGINT) AS lev
FROM cand WHERE levenshtein(sa, sb) <= 1
"""


# ---------------------------------------------------------------------------
# TF-IDF-weighted cosine blocking join (weighted record similarity).
# ---------------------------------------------------------------------------

TFIDF_DF_CAP = 40     # rare-token block: candidate keys with df <= cap
TFIDF_TAU = 0.5       # emit threshold on the weighted cosine


def tfidf_pairs(
    spark: SparkSession,
    sf_dir: str,
    df_cap: int = TFIDF_DF_CAP,
    tau: float = TFIDF_TAU,
) -> DataFrame:
    """(a, b, n_shared, cos): record pairs whose IDF-WEIGHTED token
    cosine is >= tau — the standard record-linkage similarity where
    matching on a rare token ("xq7-batch-serial") means far more than on
    a common one, which unweighted Jaccard (ppjoin) treats identically.

    Candidates come from the RARE-token block (df <= df_cap keys only —
    fan-out per key bounded by the cap, the metablocking argument); the
    weighted dot is then computed over ALL shared tokens of each
    candidate pair via a second token equi-join, so the score is exact
    even though blocking looked at rare keys only.  Blocking recall
    contract: a pair with NO shared rare token is never considered —
    at tau >= 0.5 a qualifying pair almost always shares one, and the
    oracle applies the identical rule, so the gate checks the algorithm.

    Determinism: idf weights are integer-quantized per token
    (floor(ln(N/df)*1000 + 0.5)), so per-pair dots and per-doc norms are
    exact BIGINT sums (order-free); ONE double sqrt+division at emit."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " +"))).alias("tok")
    )
    df_tbl = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    w = dt.join(F.broadcast(df_tbl), "tok").select(
        "doc_id",
        "tok",
        "df",
        F.floor(F.log(F.lit(float(n_docs)) / F.col("df")) * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    ).persist()
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("n2")
    )
    rare = w.where(F.col("df") <= df_cap)
    cand = (
        rare.alias("l")
        .join(rare.alias("r"), "tok")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .distinct()
    )
    dots = (
        cand.join(w.select(F.col("doc_id").alias("a"), "tok", F.col("q").alias("qa")), "a")
        .join(w.select(F.col("doc_id").alias("b"), "tok", F.col("q").alias("qb")), ["b", "tok"])
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(F.col("qa") * F.col("qb")).cast("bigint").alias("dot"),
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        (F.col("na") * F.col("nb")).cast("double")
    )
    out = (
        dots.join(norms.select(F.col("doc_id").alias("a"), F.col("n2").alias("na")), "a")
        .join(norms.select(F.col("doc_id").alias("b"), F.col("n2").alias("nb")), "b")
        .where(cos >= tau)
        .select("a", "b", "n_shared", F.round(cos, 6).alias("cos"))
    )
    # eager-materialize the (sparse) pair result so the weighted-token
    # cache can be released before returning the lazy handle (the
    # relations.q_pagerank convention)
    out = out.localCheckpoint(eager=True)
    w.unpersist()
    return out


def sql_tfidf_pairs(
    df_cap: int = TFIDF_DF_CAP, tau: float = TFIDF_TAU
) -> str:
    return f"""
WITH dt AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), ' +')))
           AS tok
  FROM documents
),
dftbl AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
w AS (
  SELECT dt.doc_id, dt.tok, f.df,
         CAST(floor(ln((SELECT COUNT(*) FROM documents)::DOUBLE / f.df)
                    * 1000 + 0.5) AS BIGINT) AS q
  FROM dt JOIN dftbl f ON f.tok = dt.tok
),
norms AS (SELECT doc_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
rare AS (SELECT * FROM w WHERE df <= {df_cap}),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM rare l JOIN rare r ON l.tok = r.tok AND l.doc_id < r.doc_id
),
dots AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(wa.q * wb.q) AS BIGINT) AS dot
  FROM cand c
  JOIN w wa ON wa.doc_id = c.a
  JOIN w wb ON wb.doc_id = c.b AND wb.tok = wa.tok
  GROUP BY c.a, c.b
)
SELECT d.a, d.b, d.n_shared,
       round(d.dot::DOUBLE / sqrt((na.n2 * nb.n2)::DOUBLE), 6) AS cos
FROM dots d
JOIN norms na ON na.doc_id = d.a
JOIN norms nb ON nb.doc_id = d.b
WHERE d.dot::DOUBLE / sqrt((na.n2 * nb.n2)::DOUBLE) >= {tau}
"""
