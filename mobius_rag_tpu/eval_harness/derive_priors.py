"""Calibration matrix → router priors (reference: eval/derive_priors.py:26).

Takes the per-(strategy × query_class) cells produced by calibrate() and
rewrites data/router_priors.json's numeric fields (accuracy,
accuracy_std, recall_capacity) while keeping shapes/speed/cost from the
existing file; bumps priors_version with the calibration id.
"""
from __future__ import annotations

import json
from typing import Any

from mobius_rag_tpu.query.router import _default_priors_path


def derive_priors(matrix: dict[str, Any], calib_id: str,
                  priors_path: str | None = None,
                  out_path: str | None = None,
                  min_n: int = 3) -> dict[str, Any]:
    """Cells with n < min_n keep their previous values (small-sample
    cells would otherwise whipsaw the router; same caution as the
    reference's 'we'll re-measure once the bandit has accumulated')."""
    path = priors_path or _default_priors_path()
    with open(path) as f:
        priors = json.load(f)

    updated = 0
    for sid, classes in matrix.items():
        if sid not in priors["priors"]:
            continue
        for qc, cell in classes.items():
            if qc not in priors["priors"][sid] or cell.get("n", 0) < min_n:
                continue
            dst = priors["priors"][sid][qc]
            dst["accuracy"] = cell["accuracy"]
            dst["accuracy_std"] = max(cell["accuracy_std"], 0.02)
            dst["recall_capacity"] = cell["recall"]
            updated += 1

    priors["priors_version"] = f"calib-{calib_id[:8]}"
    dest = out_path or path
    with open(dest, "w") as f:
        json.dump(priors, f, indent=2)
    return {"updated_cells": updated, "priors_version": priors["priors_version"],
            "path": dest}
