"""Mention detection: dictionary-trie NER over web-page text.

Re-expresses the reference's scispaCy NER stage (entityrecognition.py:43-85)
as a vectorized ``mapInPandas`` stage:

- the alias index is a Spark broadcast; the token trie built from it is an
  **executor singleton** (built once per Python worker per broadcast, the
  analogue of loading the spaCy model once per process, manager.py:22-25);
- Schwartz-Hearst abbreviation detection resolves short forms to long forms
  before linking (entityrecognition.py:25-26 semantics);
- matches are per-document deduplicated and lower-cased
  (entityrecognition.py:54-64, 73-74).

Two match modes:
- ``longest`` (default, NER-like): greedy leftmost-longest non-overlapping —
  'seizure disorder' suppresses the inner 'seizure'.
- ``all``: every alias occurrence at word boundaries (SQL-oracle-equivalent
  to a LIKE-join; used by the DuckDB correctness gate).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_ABBR_RE = re.compile(r"\(([A-Za-z][A-Za-z0-9]{1,9})\)")

MENTION_SCHEMA = "url string, mention string, resolved string, node_label string"

# executor-singleton trie cache. The broadcast payload is a (token, pairs)
# tuple where the token is minted once at broadcast time (uuid — unique per
# broadcast, never reused, unlike CPython's id(bc)), so the per-batch lookup
# is O(1) instead of re-hashing the full alias payload. Bounded: oldest
# entries are evicted, so at most a handful of tries live per worker.
_TRIE_CACHE: dict[str, dict] = {}
_TRIE_CACHE_MAX = 4
# broadcast-lexicon guard: ~3M UMLS-scale aliases broadcast fine; beyond
# this, route through the join-based matcher instead of the driver collect.
MAX_ALIAS_ROWS = 5_000_000


def tokenize(text_lower: str) -> list[str]:
    """Lower-case word tokens. No offsets: the trie match and per-doc dedup
    only need token text, and findall is ~3x finditer+tuple building — the
    single hottest line of the whole job (it runs once per document)."""
    return _TOKEN_RE.findall(text_lower)


def build_trie(alias_index: list[tuple[str, str]]) -> dict:
    """Token-level trie: {token: {...}, LEAF: (alias, label)}."""
    root: dict = {}
    for alias, label in alias_index:
        node = root
        for tok in alias.split():
            node = node.setdefault(tok, {})
        node["\0"] = (alias, label)
    return root


def _unwrap(bc) -> tuple[str, list[tuple[str, str]]]:
    v = bc.value
    if isinstance(v, tuple) and len(v) == 2 and isinstance(v[0], str):
        return v
    # legacy raw-list broadcast (tests): fall back to a content key
    return repr(v), v


def _get_trie(bc) -> dict:
    key, pairs = _unwrap(bc)
    trie = _TRIE_CACHE.get(key)
    if trie is None:
        while len(_TRIE_CACHE) >= _TRIE_CACHE_MAX:
            _TRIE_CACHE.pop(next(iter(_TRIE_CACHE)))
        trie = build_trie(pairs)
        _TRIE_CACHE[key] = trie
    return trie


def schwartz_hearst(text: str) -> dict[str, str]:
    """Simplified Schwartz-Hearst (2003): map short form -> long form.

    For each ``... long form (SF) ...`` pattern, scan the preceding tokens
    right-to-left aligning the short form's characters; the long form starts
    at the token containing the first character of the short form, which must
    sit at a token start.
    """
    out: dict[str, str] = {}
    lower = text.lower()
    for m in _ABBR_RE.finditer(text):
        sf = m.group(1)
        if sf.lower() == sf and " " in sf:
            continue
        window = lower[: m.start()].rstrip()
        # candidate: at most min(|sf|+5, 2|sf|) trailing tokens
        toks = window.split()
        max_words = min(len(sf) + 5, len(sf) * 2)
        cand = " ".join(toks[-max_words:]) if toks else ""
        lf = _best_long_form(cand, sf.lower())
        if lf:
            out[sf.lower()] = lf
    return out


def _best_long_form(cand: str, sf: str) -> str | None:
    li = len(cand) - 1
    si = len(sf) - 1
    while si >= 0:
        c = sf[si]
        if not c.isalnum():
            si -= 1
            continue
        while li >= 0 and (
            cand[li] != c
            or (si == 0 and li > 0 and cand[li - 1].isalnum())
        ):
            li -= 1
        if li < 0:
            return None
        li -= 1
        si -= 1
    start = li + 1
    return cand[start:].strip() or None


def find_mentions(
    text: str,
    trie: dict,
    mode: str = "longest",
) -> list[tuple[str, str, str]]:
    """Return per-doc-deduped (mention, resolved, label) tuples."""
    lower = text.lower()
    # Schwartz-Hearst only fires on "(SF)" patterns — skip the regex scan
    # and dict build entirely for the (majority of) texts with no paren
    abbr_map = schwartz_hearst(text) if "(" in text else {}
    toks = tokenize(lower)
    found: set[tuple[str, str, str]] = set()
    i = 0
    n = len(toks)
    while i < n:
        node = trie
        j = i
        matches = []  # (end_index_exclusive, alias, label)
        while j < n and toks[j] in node:
            node = node[toks[j]]
            j += 1
            if "\0" in node:
                alias, label = node["\0"]
                matches.append((j, alias, label))
        if matches:
            if mode == "longest":
                end, alias, label = matches[-1]
                found.add((alias, abbr_map.get(alias, alias), label))
                i = end
            else:  # all occurrences, overlapping allowed
                for _, alias, label in matches:
                    found.add((alias, abbr_map.get(alias, alias), label))
                i += 1
        else:
            i += 1
    return sorted(found)


def detect_mentions(
    docs: DataFrame,
    alias_bc,
    mode: str = "longest",
    id_col: str = "url",
    text_col: str = "text",
    lang_filter: str | None = "en",
) -> DataFrame:
    """docs -> mentions(url, mention, resolved, node_label) via mapInPandas."""
    if lang_filter is not None and "lang" in docs.columns:
        docs = docs.where(F.col("lang") == lang_filter)
    src = docs.select(F.col(id_col).alias("url"), F.col(text_col).alias("text"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = _get_trie(alias_bc)
        for pdf in batches:
            urls, mentions, resolveds, labels = [], [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                for mention, resolved, label in find_mentions(text, trie, mode):
                    urls.append(url)
                    mentions.append(mention)
                    resolveds.append(resolved)
                    labels.append(label)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "mention": pd.Series(mentions, dtype="object"),
                    "resolved": pd.Series(resolveds, dtype="object"),
                    "node_label": pd.Series(labels, dtype="object"),
                }
            )

    return src.mapInPandas(fn, MENTION_SCHEMA)


# ---------------------------------------------------------------------------
# JVM-expression mention detection (the e2e hot lane).
#
# Dictionary matching does not need Python at all: tokenization is a
# split/filter projection, occurrence detection is posexplode + broadcast
# lexicon join (the relations.mention_occurrences shape, proven match-set
# equal to the trie in test_relations), and greedy leftmost-longest
# selection is an expression-level aggregate over each doc's (tiny)
# occurrence list.  The ONLY Python left on this lane is the per-doc
# Schwartz-Hearst abbreviation map, which runs on '('-containing docs
# only (~12% of the fixture corpus) and scans no tokens.
#
# ``detect_mentions`` (mapInPandas) remains as the seam for model-scored
# NER (SURVEY.md §2.7 N1/N2) and as the cross-lane equality baseline.
# ---------------------------------------------------------------------------

ABBR_SCHEMA = "url string, sf string, lf string"


def abbr_pairs(docs: DataFrame, id_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """(url, sf, lf): per-doc Schwartz-Hearst short->long form pairs.
    Pre-filtered to docs containing '(' — the pattern can't fire
    elsewhere — so the Arrow lane touches a sliver of the corpus."""
    src = docs.where(F.instr(F.col(text_col), "(") > 0).select(
        F.col(id_col).alias("url"), F.col(text_col).alias("text")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sfs, lfs = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                for sf, lf in schwartz_hearst(text).items():
                    urls.append(url)
                    sfs.append(sf)
                    lfs.append(lf)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "sf": pd.Series(sfs, dtype="object"),
                    "lf": pd.Series(lfs, dtype="object"),
                }
            )

    return src.mapInPandas(fn, ABBR_SCHEMA)


def alias_label_df(spark: SparkSession, aliases: DataFrame,
                   concepts: DataFrame) -> DataFrame:
    """(alias, label, toks, n_toks, first_tok) lexicon for the JVM matcher
    — the DataFrame twin of ``broadcast_alias_index``.  Deduped by token
    sequence with max(alias, label) winning, mirroring the trie's
    last-insertion-wins over sorted pairs (build_trie)."""
    pairs = (
        aliases.join(concepts.select("CUI", "semtype"), "CUI")
        .select("alias", F.col("semtype").alias("label"))
        .distinct()
    )
    return _lexicon(pairs)


def alias_label_df_local(spark: SparkSession,
                         pairs: list[tuple[str, str]]) -> DataFrame:
    """Lexicon DataFrame from a driver-side (alias, label) list."""
    return _lexicon(
        spark.createDataFrame(sorted(set(pairs)), "alias string, label string")
    )


def _lexicon(pairs: DataFrame) -> DataFrame:
    toks = F.filter(F.split("alias", " "), lambda x: x != "")
    return (
        pairs.withColumn("toks", toks)
        .groupBy("toks")
        .agg(F.max(F.struct("alias", "label")).alias("m"))
        .select(
            F.col("m.alias").alias("alias"),
            F.col("m.label").alias("label"),
            "toks",
            F.size("toks").alias("n_toks"),
            F.col("toks")[0].alias("first_tok"),
        )
    )


def _lexmap(lexicon: DataFrame) -> DataFrame:
    """ONE row: map first_tok -> array<struct(toks, n_toks, alias, label)>.
    Cross-joined (broadcast, 1 row) onto the doc stream so matching is a
    pure per-row expression — the JVM analogue of the broadcast trie."""
    return (
        lexicon.groupBy("first_tok")
        .agg(
            F.collect_list(
                F.struct("toks", "n_toks", "alias", "label")
            ).alias("cs")
        )
        .groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("first_tok", "cs"))
            ).alias("lexmap")
        )
    )


# All word-boundary alias occurrences in one expression: for token i, the
# candidates sharing its first token come from the lexmap; a candidate
# matches iff the token slice starting at i equals its token sequence.
# neg_end = -(i + n_toks) so array_sort's (start asc, neg_end asc) order is
# exactly (start asc, longest first) for the greedy scan.
_MATCHES_EXPR = """
flatten(
  transform(ws, (w, i) ->
    transform(
      filter(ifnull(lexmap[w], array()),
             c -> slice(ws, i + 1, c.n_toks) == c.toks),
      c -> struct(i AS start, -(i + c.n_toks) AS neg_end,
                  c.alias AS mention, c.label AS label))))
"""

# greedy leftmost-longest over the (start asc, longest-first)-sorted match
# list: accept a match iff it starts at or after the cursor (= end of the
# last accepted match) — exactly find_mentions's positional scan, including
# longest-wins at equal start (the longest sorts first and moves the cursor
# past its shorter siblings).
_GREEDY_EXPR = """
aggregate(
  array_sort(ms),
  struct(0 AS cursor,
         cast(array() AS array<struct<mention:string,label:string>>) AS kept),
  (acc, x) -> IF(x.start >= acc.cursor,
                 struct(-x.neg_end AS cursor,
                        concat(acc.kept,
                               array(struct(x.mention AS mention,
                                            x.label AS label))) AS kept),
                 acc),
  acc -> acc.kept
)
"""

_ALL_EXPR = """
transform(ms, x -> struct(x.mention AS mention, x.label AS label))
"""


def detect_mentions_jvm(
    docs: DataFrame,
    lexicon: DataFrame,
    mode: str = "longest",
    id_col: str = "url",
    text_col: str = "text",
    lang_filter: str | None = "en",
) -> DataFrame:
    """JVM twin of ``detect_mentions``: same (url, mention, resolved,
    node_label) rows (asserted lane-equal in test_ner), no Python on the
    token path.

    Plan shape: the ENTIRE per-doc match — tokenize, occurrence scan,
    greedy leftmost-longest selection, per-doc dedup — is one projection
    over a 1-row broadcast lexicon map (no explode of the token stream,
    no exchange).  The only shuffle on the lane is the
    abbreviation-resolution join against the '('-docs-only
    Schwartz-Hearst mapInPandas output, and it moves mention-sized rows.

    MEASURED (local[32], round 3): this lane is 3-5x SLOWER than the
    Arrow trie lane for dictionary matching — 3.3s vs 0.8s on 100k
    300-byte docs, 4.6s vs 1.0s on 20k 3-8KB pages — because Catalyst
    evaluates higher-order-function lambdas interpreted (per-token
    per-candidate), while the CPython trie walk is a dict probe per
    token.  It therefore exists as the measured alternative and the
    no-Python-workers option, NOT the default; ``detect_mentions``
    (mapInPandas) is the hot lane, and relations.mention_occurrences is
    the join-based formulation for beyond-broadcast lexicons."""
    if lang_filter is not None and "lang" in docs.columns:
        docs = docs.where(F.col("lang") == lang_filter)
    src = docs.select(
        F.col(id_col).alias("url"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull() & (F.col("text") != ""))
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    words = src.select("url", toks.alias("ws")).crossJoin(
        F.broadcast(_lexmap(lexicon))
    )
    if mode == "longest":
        kept = F.expr(_GREEDY_EXPR)
    elif mode == "all":
        kept = F.expr(_ALL_EXPR)
    else:  # pragma: no cover - contract guard
        raise ValueError(f"unknown match mode: {mode}")
    sel = (
        words.select("url", F.expr(_MATCHES_EXPR).alias("ms"))
        .where(F.size("ms") > 0)
        .select("url", F.explode(F.array_distinct(kept)).alias("k"))
        .select(
            "url",
            F.col("k.mention").alias("mention"),
            F.col("k.label").alias("node_label"),
        )
    )
    abbr = abbr_pairs(docs, id_col=id_col, text_col=text_col)
    return sel.join(
        abbr,
        (sel["url"] == abbr["url"]) & (sel["mention"] == abbr["sf"]),
        "left",
    ).select(
        sel["url"],
        "mention",
        F.coalesce(F.col("lf"), F.col("mention")).alias("resolved"),
        "node_label",
    )


def broadcast_alias_index_local(
    spark: SparkSession, pairs: list[tuple[str, str]]
):
    """Broadcast a locally-known (alias, label) index without a Spark job —
    for lexicons that are driver-side constants. For lookup tables read from
    parquet/Iceberg use ``broadcast_alias_index``."""
    import uuid

    return spark.sparkContext.broadcast(
        (uuid.uuid4().hex, sorted(set(pairs)))
    )


def broadcast_alias_index(
    spark: SparkSession, aliases: DataFrame, concepts: DataFrame
):
    """Collect the (small) alias table + semtype label and broadcast it.

    Label per alias = semtype of its CUI (ambiguous aliases in the fixture
    ontology always agree on semtype, matching the reference where the label
    comes from the NER model, not the linker).

    The collect is bounded by MAX_ALIAS_ROWS: a broadcast lexicon must fit
    in executor memory anyway (UMLS-scale ~3M aliases is a few hundred MB
    and passes; a web-scale entity dictionary beyond the cap should be
    restructured as an equi-join against the token stream — see
    relations.mention_occurrences for that formulation).
    """
    import uuid

    limited = (
        aliases.join(concepts.select("CUI", "semtype"), "CUI")
        .select("alias", "semtype")
        .distinct()
        .limit(MAX_ALIAS_ROWS + 1)
    )
    rows = limited.collect()
    if len(rows) > MAX_ALIAS_ROWS:
        raise ValueError(
            f"alias index exceeds MAX_ALIAS_ROWS={MAX_ALIAS_ROWS}; "
            "use the join-based matcher (relations.mention_occurrences) "
            "for dictionaries too large to broadcast"
        )
    index = sorted({(r["alias"], r["semtype"]) for r in rows})
    return spark.sparkContext.broadcast((uuid.uuid4().hex, index))
