"""F14: recursive automation-result stringification.

``automation_result`` is an unbounded recursive tree (node types per the
reference's pattern match at ``distill4_normalize.py:223-284``: root /
condition / spell / target / target_iteration / attack / save / damage /
temphp / ieffect / remove_ieffect / check). Spark's type system cannot
express unbounded recursion, so the column stays a JSON string and the walk
is an Arrow-batched pandas UDF — the engine's documented Python edge
(SURVEY.md section 2.8). Everything around it (filtering, grouping,
joining the narration back) stays in the JVM.

The narration text is this engine's own formulation; it preserves the
*structure* the reference extracts (hit/miss/crit, save pass/fail, damage
sign, temp HP, effect add/remove, checks/contests, per-target iteration
with a tracked current target), not its exact strings.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _walk(node, target: str | None, out: list[str]) -> None:
    if node is None:
        return
    if isinstance(node, list):
        for child in node:
            _walk(child, target, out)
        return
    if not isinstance(node, dict):
        return
    ntype = node.get("type")
    children = node.get("children") or node.get("results") or []

    if ntype == "target_iteration":
        if node.get("target_type") == "self":
            target = "self"
        elif node.get("target_index") is not None:
            target = f"target {node['target_index']}"
        _walk(children, target, out)
        return
    if ntype == "attack":
        who = f" on {target}" if target else ""
        if node.get("did_crit"):
            out.append(f"critical hit{who}")
        elif node.get("did_hit"):
            out.append(f"hit{who}")
        else:
            out.append(f"miss{who}")
    elif ntype == "save":
        ability = (node.get("ability") or "").removesuffix("Save").strip()
        verdict = "succeeds" if node.get("did_save") else "fails"
        out.append(f"{ability} save {verdict}".strip())
    elif ntype == "damage":
        amount = node.get("amount") or 0
        if amount >= 0:
            out.append(f"{amount} damage to {target or 'target'}")
        else:
            out.append(f"{-amount} healing to {target or 'target'}")
    elif ntype == "temphp":
        out.append(f"{node.get('amount', 0)} temporary HP")
    elif ntype == "ieffect":
        out.append(f"effect added: {node.get('effect', node.get('name', ''))}")
    elif ntype == "remove_ieffect":
        out.append(f"effect removed: {node.get('effect', node.get('name', ''))}")
    elif ntype == "check":
        skill = node.get("skill_name", "")
        if node.get("contest_skill_name"):
            out.append(f"{skill} contest vs {node['contest_skill_name']}")
        else:
            out.append(f"{skill} check")
    # root / condition / spell / target: structural only
    _walk(children, target, out)


def narrate_tree(json_str: str | None) -> str | None:
    """Narrate one automation_result JSON tree (None-safe)."""
    if json_str is None:
        return None
    try:
        tree = json.loads(json_str)
    except (ValueError, TypeError):
        return None
    out: list[str] = []
    _walk(tree, None, out)
    return "; ".join(out)


# returnType as a DataType instance: a DDL string would be parsed at import
# time, which requires an active SparkSession.
@pandas_udf(StringType())
def narrate_automation(results: pd.Series) -> pd.Series:
    """Arrow-batched narration of automation_result JSON strings."""
    return results.map(narrate_tree)
