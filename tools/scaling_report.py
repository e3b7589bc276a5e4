#!/usr/bin/env python3
"""Per-row low-core scaling report (VERDICT r15 #8).

Reads the last same-sf bench ledger entries for two cpu counts (default
32 and 8) and emits SCALING_r16.json: per-row 8c/32c wall ratios, the
rows nearest 1.0 (fixed-cost-bound at this sf), and the rows that scale.
Run:  python3 tools/scaling_report.py [out.json]
"""
import json, sys, math

LEDGER = "/root/repo/bench_history.jsonl"
SF = "/root/testdata/sf0.1"
out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALING_r16.json"

entries = []
for line in open(LEDGER):
    try:
        e = json.loads(line)
    except Exception:
        continue
    if e.get("sf") == SF and isinstance(e.get("queries"), dict):
        entries.append(e)

def last_for(cpus, n=2):
    """min-combine the last n same-cpu entries: one loaded run must not
    fabricate (or hide) a serial row"""
    picked = [e for e in reversed(entries)
              if int(e.get("cpus", -1)) == cpus][:n]
    if not picked:
        return None
    q = {}
    for e in picked:
        for k, v in e["queries"].items():
            if isinstance(v, (int, float)):
                q[k] = min(q.get(k, v), v)
    out = dict(picked[0])
    out["queries"] = q
    out["value"] = min(e["value"] for e in picked)
    out["n_runs_combined"] = len(picked)
    return out

e32, e8 = last_for(32), last_for(8)
if not e32 or not e8:
    sys.exit("need both 32c and 8c ledger entries at %s" % SF)

rows = {}
for k, v32 in e32["queries"].items():
    v8 = e8["queries"].get(k)
    if isinstance(v32, (int, float)) and isinstance(v8, (int, float)) and v32 > 0:
        rows[k] = round(v8 / v32, 3)

ranked = sorted(rows.items(), key=lambda kv: kv[1])
geo = math.exp(sum(math.log(r) for r in rows.values()) / len(rows))
heavy = {k: r for k, r in rows.items()
         if e32["queries"][k] >= 1.0 or e8["queries"][k] >= 1.0}
report = {
    "sf": SF, "cpus_main": 32, "cpus_low": 8,
    "total_32c": e32["value"], "total_8c": e8["value"],
    "loadavg0_32c": e32.get("loadavg0"), "loadavg0_8c": e8.get("loadavg0"),
    "geomean_ratio": round(geo, 3),
    "n_rows": len(rows),
    "heavy_rows_ratio": dict(sorted(heavy.items(), key=lambda kv: -kv[1])),
    "most_serial": dict(ranked[:12]),
    "best_scaling": dict(ranked[-12:]),
    "per_query": rows,
    "note": ("ratio = wall_8c / wall_32c; 4.0 = perfect CPU scaling, "
             "~1.0 = fixed-cost-bound at this sf (driver actions, "
             "scheduling, fork) — expected for sub-second rows at sf0.1"),
}
json.dump(report, open(out_path, "w"), indent=1)
print("wrote", out_path)
print("totals 32c=%.1f 8c=%.1f geomean ratio %.3f" %
      (e32["value"], e8["value"], geo))
print("heavy-row ratios:", report["heavy_rows_ratio"])
