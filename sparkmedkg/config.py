"""Job config parsing + pipeline-DAG validation.

Re-expresses the reference manager's request parsing (manager.py:131-240):
same required keys, same defaults (Snomed/clinicalFeatures/meshTerms default
False, n_articles defaults to a max cap, delete_graph False), same strict
linear hierarchy with the same error messages (test_manager.py:55-58).
Driver-side plain Python — not a Spark op.
"""

from __future__ import annotations

import json

PIPE_HIERARCHY = ["pubmed", "ner", "medGen", "uniProt"]
REQUIRED_REQUEST_ARGS = ["disease", "pipelines"]
DEFAULT_MAX_ARTICLES = 500  # reference localconfig.json:8


def check_pipeline(pipes: list[str]) -> None:
    """Each enabled pipe requires its predecessor (manager.py:220-240)."""
    rev = PIPE_HIERARCHY[::-1]
    for i, p in enumerate(rev):
        if p in pipes and i + 1 < len(rev):
            if rev[i + 1] not in pipes:
                raise RuntimeError(
                    "Pipe '{p}' is set in request but required predecessor "
                    "pipe '{pp}' is missing.".format(p=p, pp=rev[i + 1])
                )


def parse_request(request_json: str | dict, max_articles: int = DEFAULT_MAX_ARTICLES):
    """Returns (disease_lower, pipe_run_cfg) — manager.py:131-191 semantics."""
    data = request_json.copy() if isinstance(request_json, dict) else json.loads(request_json)
    if not isinstance(data, dict):
        raise RuntimeError(f"Missing required parameters in request: {REQUIRED_REQUEST_ARGS}")
    missing = [k for k in REQUIRED_REQUEST_ARGS if k not in data]
    if missing:
        raise RuntimeError(f"Missing required parameters in request: {missing}")
    disease = data.pop("disease")
    cfg = {
        "n_articles": data.get("n_articles", max_articles),
        "delete_existing_graph": data.get("delete_graph", False),
    }
    pipes = {}
    for pipe, v in data["pipelines"].items():
        if v.get("run"):
            if pipe == "medGen":
                for k in ("Snomed", "clinicalFeatures"):
                    v.setdefault(k, False)
            if pipe == "pubmed":
                v.setdefault("meshTerms", False)
            pipes[pipe] = v
    cfg["pipelines"] = pipes
    check_pipeline(list(pipes.keys()))
    return disease.lower(), cfg
