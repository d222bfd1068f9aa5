"""Merge N solo ScaleBench runs into the committed SCALE_BENCH.json:
per-cell MIN of each sec_<scale> column (the Bench min-of-N convention
applied to the scale ladder — see SCALING.md "two solo runs, per-cell
min"), growth ratios recomputed from the merged cells. Deterministic
extras (rows, pairs, probed-list counts) are asserted equal across
runs; timing-derived extras (rows_per_sec_<scale>) are recomputed
from the merged sec so the artifact stays self-consistent.

Usage: python3 tools/merge_scale.py out.json run1.json run2.json [...]
"""
import json
import sys

out_path, run_paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in run_paths]
for r in runs[1:]:
    assert [row["op"] for row in r] == [row["op"] for row in runs[0]], \
        "runs must cover identical op lists in order"

merged = []
for rows in zip(*runs):
    a = rows[0]
    m = {}
    scales = [k[4:] for k in a if k.startswith("sec_")]
    for k in a:
        if k.startswith("sec_"):
            m[k] = min(r[k] for r in rows)
        elif k.startswith("time_ratio_") or k.startswith("rows_per_sec_"):
            continue  # recomputed below from the merged cells
        elif isinstance(a[k], int) or k.startswith("rows_"):
            vals = {r[k] for r in rows}
            assert len(vals) == 1, \
                f"{a['op']}.{k} differs across runs: {sorted(vals)}"
            m[k] = a[k]
        else:
            m[k] = a[k]
    for s in scales:
        if f"rows_per_sec_{s}" in a:
            m[f"rows_per_sec_{s}"] = round(m[f"rows_{s}"] / m[f"sec_{s}"], 3)
    base = m["sec_" + scales[0]]
    for s in scales[1:]:
        m[f"time_ratio_{s}_vs_{scales[0]}"] = round(m["sec_" + s] / base, 2)
    merged.append(m)

with open(out_path, "w") as f:
    f.write("[\n" + ",\n".join(json.dumps(r) for r in merged) + "\n]\n")

for r in merged:
    if r["op"] in ("image_neardup", "knn_join_exact", "hnsw_delete_bulk",
                   "hnsw_delete_lazy", "index_ingest", "ivf_blocked_join",
                   "label_noise_audit"):
        print(json.dumps(r))
