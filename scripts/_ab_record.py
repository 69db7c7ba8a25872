"""Shared sink for A/B scripts: merge a section into repo-root
ab_last.json, which bench.py folds into the BENCH record's ``ab`` key
(VERDICT r4 #8 — A/B conclusions must be machine-comparable round over
round, not BENCH.md prose)."""

from __future__ import annotations

import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PATH = os.path.join(_ROOT, "ab_last.json")


def record(section: str, payload: dict) -> None:
    data = {}
    if os.path.exists(_PATH):
        try:
            with open(_PATH) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            data = {}
    data[section] = payload
    with open(_PATH, "w") as f:
        json.dump(data, f, separators=(",", ":"))
        f.write("\n")
