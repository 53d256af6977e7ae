"""One-shot round-5 README ledger rewrite (run after the full sf0.1
drive): mark the r5 driver head with `r5*`, refresh the sf0.1 column to
r5 for every query the full sf0.1 drive just verified, and append rows
for the two queries new in round 5."""
import re
import sys

sys.path.insert(0, "/root/repo")

from fireball_data_processing_spark import queries as catalog

ordered = list(catalog.queries())
head50 = set(ordered[:50])
oracles = catalog.oracle_sql()

# names verified by the sf0.1 drive log (sanity: all 130)
log = open("/tmp/drive_r5_sf01.log").read()
matched = set(re.findall(r"(\w+): MATCH", log))
rows_only = set(re.findall(r"(\w+): rows-only", log))
assert not re.search(r": FAIL", log), "sf0.1 drive had failures"
assert len(matched) + len(rows_only) == len(ordered), (
    len(matched),
    len(rows_only),
    len(ordered),
)

src = open("/root/repo/README.md").read()
lines = src.split("\n")
out = []
in_ledger = False
seen = set()
for ln in lines:
    m = re.match(r"^\| `([a-z0-9_]+)` \| (oracle|rows-only) \| ([^|]+) \| ([^|]+) \|$", ln)
    if m and "driver rounds" not in ln:
        name, check, rounds_cell, sf_cell = m.groups()
        if name in matched or name in rows_only:
            in_ledger = True
            seen.add(name)
            rounds_cell = rounds_cell.strip()
            if name in head50:
                rounds_cell += " r5*"
            sf_cell = "r5 MATCH" if name in matched else "r5 rows"
            ln = f"| `{name}` | {check} | {rounds_cell} | {sf_cell} |"
    out.append(ln)

new_rows = []
for name in ("corpus_diversity_probe", "gopher_quality_gate"):
    assert name not in seen
    check = "oracle" if name in oracles else "rows-only"
    sf_cell = "r5 MATCH" if name in matched else "r5 rows"
    new_rows.append(f"| `{name}` | {check} | r5* (new in r5) | {sf_cell} |")

# insert the new rows right after the ledger header separator
txt = "\n".join(out)
anchor = "| `heuristics_matrix` |"
idx = txt.index(anchor)
txt = txt[:idx] + "\n".join(new_rows) + "\n" + txt[idx:]

open("/root/repo/README.md", "w").write(txt)
print("ledger rows updated:", len(seen), "+", len(new_rows), "new; head50 marked:",
      len(head50 & (matched | rows_only)))
