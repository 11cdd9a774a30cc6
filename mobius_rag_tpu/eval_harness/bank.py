"""Query-bank loader.

Format-compatible with the reference's banks (eval/queries_cmhc.yaml:
bank_version + queries[] with id/persona/query/expected/golden_answer/
must_facts/bonus_facts/forbidden_facts/golden_citation), including the
expected-key folding the reference does at load (eval/run.py:68-87 —
rubric fields are folded INTO the `expected` dict; skipping this
silently disables rubric judging, SURVEY 'gaps to remember')."""
from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Any

import yaml

from mobius_rag_tpu.config import get_config

_RUBRIC_KEYS = ("golden_answer", "must_facts", "bonus_facts", "forbidden_facts",
                "golden_citation", "expected_contour")


@dataclasses.dataclass
class BankQuery:
    id: str
    query: str
    persona: str = ""
    payer_specificity: str = ""
    expected: dict[str, Any] = dataclasses.field(default_factory=dict)
    notes: str = ""
    raw: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def must_facts(self) -> list[str]:
        return list(self.expected.get("must_facts") or [])

    @property
    def bonus_facts(self) -> list[str]:
        return list(self.expected.get("bonus_facts") or [])

    @property
    def forbidden_facts(self) -> list[str]:
        return list(self.expected.get("forbidden_facts") or [])

    @property
    def golden_answer(self) -> str:
        return self.expected.get("golden_answer") or ""


@dataclasses.dataclass
class Bank:
    name: str
    version: str
    sha: str
    queries: list[BankQuery]


def load_bank(path_or_name: str) -> Bank:
    """Load a bank by path, or by short name resolved against
    Config.eval_bank_dir (reference banks) then the built-in data dir."""
    cfg = get_config()
    candidates = [path_or_name]
    if not os.path.exists(path_or_name):
        base = path_or_name if path_or_name.endswith(".yaml") else f"{path_or_name}.yaml"
        candidates = [
            os.path.join(cfg.eval_bank_dir, base),
            os.path.join(cfg.eval_bank_dir, f"queries_{path_or_name}.yaml"),
            os.path.join(os.path.dirname(__file__), "..", "data", base),
            os.path.join(os.path.dirname(__file__), "..", "data", f"bank_{path_or_name}.yaml"),
        ]
    path = next((c for c in candidates if os.path.exists(c)), None)
    if path is None:
        raise FileNotFoundError(f"no bank found for {path_or_name!r} in {candidates}")

    with open(path, "rb") as f:
        blob = f.read()
    raw = yaml.safe_load(blob) or {}
    queries = []
    for item in raw.get("queries", []):
        expected = dict(item.get("expected") or {})
        # fold rubric fields into expected (run.py:68-87 contract)
        for key in _RUBRIC_KEYS:
            if key in item and key not in expected:
                expected[key] = item[key]
        queries.append(BankQuery(
            id=str(item.get("id", f"q{len(queries)}")),
            query=item.get("query", ""),
            persona=item.get("persona", ""),
            payer_specificity=item.get("payer_specificity", ""),
            expected=expected,
            notes=item.get("notes", ""),
            raw=item,
        ))
    return Bank(
        name=os.path.basename(path),
        version=str(raw.get("bank_version", "unversioned")),
        sha=hashlib.sha256(blob).hexdigest()[:16],
        queries=queries,
    )
