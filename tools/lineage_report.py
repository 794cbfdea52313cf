"""Lineage report: summarize a flagship/pretrain run's checkpoint
markers — the per-partition provenance the north rule requires, in one
readable table (the deployment-status-view analog of the reference,
vectorize-cli deployment/mod.rs).

Usage: python tools/lineage_report.py <out_dir>
"""

from __future__ import annotations

import glob
import json
import os
import sys


def report(out_dir: str) -> str:
    markers = sorted(glob.glob(os.path.join(out_dir, "_markers", "*.json")))
    if not markers:
        return f"no lineage markers under {out_dir}/_markers"
    lines = [
        f"{'group':<16} {'rows':>10} {'tokens':>12} {'dur_s':>7} "
        f"{'files':>5}  routes"
    ]
    tot_rows = tot_tokens = tot_dur = 0.0
    for m in markers:
        with open(m) as f:
            d = json.load(f)
        routes = d.get("route_rows") or {}
        routes_s = ",".join(f"{k}={v}" for k, v in sorted(routes.items()))
        gid = d.get("group_id") or os.path.basename(m).removesuffix(".json")
        rows = d.get("rows", 0)
        tokens = d.get("tokens", 0)
        dur = d.get("duration_sec", 0.0)
        nfiles = len(d.get("input_files") or [])
        lines.append(
            f"{gid:<16} {rows:>10,} {tokens:>12,} {dur:>7.2f} "
            f"{nfiles:>5}  {routes_s}"
        )
        tot_rows += rows
        tot_tokens += tokens
        tot_dur += dur
    lines.append(
        f"{'TOTAL':<16} {int(tot_rows):>10,} {int(tot_tokens):>12,} "
        f"{tot_dur:>7.2f}"
    )
    mpath = os.path.join(out_dir, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            met = json.load(f)
        lines.append("\nper-stage NodeMetrics (run-level):")
        for comp in sorted(met):
            c = met[comp]
            lines.append(
                f"  {comp:<28} rows={c.get('rows', 0):>10,} "
                f"bytes={int(c.get('bytes', 0)):>13,} "
                f"batches={c.get('batches', 0):>5} "
                f"errors={c.get('errors', 0)}"
            )
    apath = os.path.join(out_dir, "alerts.json")
    if os.path.exists(apath):
        with open(apath) as f:
            for a in json.load(f):
                lines.append(a)
    return "\n".join(lines)


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    print(report(sys.argv[1]))
