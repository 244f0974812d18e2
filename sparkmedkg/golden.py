"""Pure-Python golden oracle: a slow, obviously-correct implementation of the
reference pipeline semantics (FIXTURES.md §3).

Deliberately implemented *differently* from the Spark path (regex scan over
every alias instead of a trie; Python floats instead of JVM expressions) so
the pytest P/R >= 0.95 comparison is a genuine cross-check, not a tautology.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from sparkmedkg import ontology as onto
from sparkmedkg.fixtures import HTML_PREFIX, HTML_SUFFIX, topic_of_url
from sparkmedkg.ner import schwartz_hearst

LINK_THRESHOLD = 0.7
LINK_TOP_K = 5
SELECT_MIN_SCORE = 0.85
TOP_N = 15
CUI_N = 4


def extract_text(html: bytes) -> str:
    s = bytes(html).decode("utf-8")
    assert s.startswith(HTML_PREFIX.decode()) and s.endswith(HTML_SUFFIX.decode())
    return s[len(HTML_PREFIX):-len(HTML_SUFFIX)]


def _alias_patterns():
    pats = []
    seen = set()
    for alias, _cui, _ in onto.ALIASES:
        if alias in seen:
            continue
        seen.add(alias)
        pats.append((alias, re.compile(r"(?<![a-z0-9])" + re.escape(alias) + r"(?![a-z0-9])")))
    return pats


_SEMTYPE = {c[0]: c[3] for c in onto.CONCEPTS}
_CANON = {c[0]: c[1] for c in onto.CONCEPTS}
_DEFN = {c[0]: c[2] for c in onto.CONCEPTS}
_ALIAS_CUIS: dict[str, list[str]] = {}
for _a, _c, _ in onto.ALIASES:
    _ALIAS_CUIS.setdefault(_a, []).append(_c)
_ALIAS_LABEL = {a: _SEMTYPE[cuis[0]] for a, cuis in _ALIAS_CUIS.items()}
_PATTERNS = _alias_patterns()


def find_mentions(text: str, mode: str = "longest") -> set[tuple[str, str, str]]:
    """(mention, resolved, label) per doc — regex-scan + leftmost-longest."""
    lower = text.lower()
    abbr = schwartz_hearst(text)
    spans = []
    for alias, pat in _PATTERNS:
        for m in pat.finditer(lower):
            spans.append((m.start(), -(m.end() - m.start()), alias))
    out = set()
    if mode == "all":
        for _, _, alias in spans:
            out.add((alias, abbr.get(alias, alias), _ALIAS_LABEL[alias]))
        return out
    spans.sort()
    cursor = -1
    for start, neglen, alias in spans:
        if start < cursor:
            continue
        out.add((alias, abbr.get(alias, alias), _ALIAS_LABEL[alias]))
        cursor = start + (-neglen)
    return out


def trigram_set(s: str) -> set[str]:
    s = s.lower()
    if len(s) <= 3:
        return {s}
    return {s[i : i + 3] for i in range(len(s) - 2)}


def cosine(a: str, b: str) -> float:
    ga, gb = trigram_set(a), trigram_set(b)
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / math.sqrt(len(ga) * len(gb))


def link_mention(mention: str, resolved: str) -> list[tuple[str, str, float]]:
    """[(source=mention, CUI, score)] — top-k above threshold."""
    cands = []
    for cui in _ALIAS_CUIS.get(resolved, []):
        score = cosine(resolved, _CANON[cui])
        if score >= LINK_THRESHOLD:
            cands.append((score, cui))
    cands.sort(key=lambda t: (-t[0], t[1]))
    return [(mention, cui, score) for score, cui in cands[:LINK_TOP_K]]


def run(doc_rows: list[tuple]) -> dict:
    """Full golden pipeline over (url, warc_ts, html, text, lang) rows."""
    mentions = set()  # (url, mention, resolved, label)
    for url, _ts, html, text, lang in doc_rows:
        if lang != "en":
            continue
        extracted = extract_text(html)
        assert extracted == text, f"text invariant broken for {url}"
        for mention, resolved, label in find_mentions(text):
            mentions.add((url, mention, resolved, label))

    links = {}  # (source, CUI) -> (score, name, defn)
    for _url, mention, resolved, _label in mentions:
        for source, cui, score in link_mention(mention, resolved):
            links[(source, cui)] = (score, _CANON[cui], _DEFN[cui])

    # A1: top-15 DISEASE mentions by doc frequency (tie: mention asc)
    freq = Counter(m for _u, m, _r, lbl in mentions if lbl == "DISEASE")
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    top_entities = [m for m, _n in ranked]

    # A2: per entity top-4 CUIs with score > 0.85 (tie: CUI asc)
    selected = set()
    for ent in top_entities:
        cands = sorted(
            (
                (-score, cui)
                for (src, cui), (score, _n, _d) in links.items()
                if src == ent and score > SELECT_MIN_SCORE
            ),
        )[:CUI_N]
        selected.update(cui for _s, cui in cands)

    genes = set()
    snomed = set()
    cfs = set()
    for cui in selected:
        mg = onto.MEDGEN.get(cui)
        if not mg:
            continue
        for g in mg["genes"]:
            genes.add((cui, g))
        for saui, text_, scui, sab in mg["snomed"]:
            snomed.add((cui, saui, text_, scui, sab))
        for fcui, ftype, fname, fdef in mg["clinical_features"]:
            cfs.add((cui, fcui, ftype, fname, fdef))

    gene_names = {g for _c, g in genes}
    proteins = set()  # (gene, Entry)
    matched_entries = set()
    for row in onto.UNIPROT:
        prim = row["GenePrimary"]
        if prim in gene_names:
            proteins.add((prim, row["Entry"]))
            matched_entries.add(row["Entry"])
    for g in gene_names:
        if any(p[0] == g for p in proteins):
            continue
        for row in onto.UNIPROT:
            syn = f' {row["GeneNames"].lower()} '
            if f" {g.lower()} " in syn:
                proteins.add((g, row["Entry"]))
                matched_entries.add(row["Entry"])

    go = set()  # (Entry, name, GoID, GoType)
    for row in onto.UNIPROT:
        if row["Entry"] not in matched_entries:
            continue
        for col, gtype in (
            ("go_molecular_function", "molecular function"),
            ("go_biological_process", "biological process"),
            ("go_cellular_component", "cellular component"),
        ):
            cell = row[col]
            if not cell:
                continue
            for seg in cell.split(";"):
                m = re.match(r"^(.*?)\s*\[GO:(\d+)\]\s*$", seg.strip())
                if not m:
                    continue
                go.add((row["Entry"], m.group(1).strip(), f"GO:{m.group(2)}", gtype))

    # connected components over alias-sharing CUIs (min-CUI canonical)
    parent = {c[0]: c[0] for c in onto.CONCEPTS}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for cuis in _ALIAS_CUIS.values():
        for other in cuis[1:]:
            ra, rb = find(cuis[0]), find(other)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    canonical = {c: find(c) for c in parent}

    # triples across all 8 levels
    triples = set()
    for r in doc_rows:
        if r[4] == "en":
            triples.add(("SearchTerm", topic_of_url(r[0]), "CONTAINS", "Paper", r[0]))
    for url, mention, _res, label in mentions:
        triples.add(("Paper", url, "CONTAINS", label, mention))
    mention_label = {m: lbl for _u, m, _r, lbl in mentions}
    for (src, cui) in links:
        triples.add((mention_label[src], src, "CONTAINS", "UMLS", cui))
    for cui, g in genes:
        triples.add(("UMLS", cui, "CONTAINS", "Gene", g))
    for cui, saui, *_ in snomed:
        triples.add(("UMLS", cui, "CONTAINS", "SnomedConcept", saui))
    for cui, fcui, *_ in cfs:
        triples.add(("UMLS", cui, "CONTAINS", "ClinicalFeature", fcui))
    for g, entry in proteins:
        triples.add(("Gene", g, "CONTAINS", "Protein", entry))
    for entry, _name, goid, _gt in go:
        triples.add(("Protein", entry, "CONTAINS", "GO", goid))

    return {
        "mentions": mentions,
        "links": links,
        "top_entities": top_entities,
        "selected_cuis": selected,
        "genes": genes,
        "snomed": snomed,
        "clinical_features": cfs,
        "proteins": proteins,
        "go": go,
        "canonical": canonical,
        "triples": triples,
    }


def precision_recall(expected: set, actual: set) -> tuple[float, float]:
    if not actual:
        return (1.0 if not expected else 0.0, 0.0 if expected else 1.0)
    tp = len(expected & actual)
    return tp / len(actual), tp / len(expected) if expected else 1.0
