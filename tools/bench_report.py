"""Render a BENCH markdown section from a bench artifact — the per-round
tables in BENCH.md are GENERATED with this tool, so the documented numbers
are byte-traceable to the artifact (`BENCH_r{N}.json` from the driver, or a
raw one-line JSON from `python bench.py`).

Usage:
    python tools/bench_report.py BENCH_r03.json
    python tools/bench_report.py /tmp/bench_local.json --label "local run"
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    # driver artifact shape wraps the bench output under "parsed"
    return data.get("parsed", data)


def render(d: dict, label: str, source: str) -> str:
    q = d["queries"]
    names = list(q)
    half = (len(names) + 1) // 2
    lines = [
        f"{label}: **{d['value']} s across {len(names)} queries** at "
        f"`{d.get('sf', '?')}`, {d.get('cpus', '?')} cpus, "
        f"docs_per_sec {d.get('docs_per_sec', '?')} "
        f"(source: `{source}`, rendered by `tools/bench_report.py`).",
        "",
        "| query | sec | | query | sec |",
        "|---|---|---|---|---|",
    ]
    for i in range(half):
        left = f"{names[i]} | {q[names[i]]}"
        j = half + i
        right = f"{names[j]} | {q[names[j]]}" if j < len(names) else " | "
        lines.append(f"| {left} | | {right} |")
    for key in ("skew_guard", "setsim_gram_cap", "band_salt", "host_cpu"):
        if key in d:
            lines += ["", f"`{key}`: `{json.dumps(d[key])}`"]
    return "\n".join(lines)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--label", default="Headline per-query wall time")
    args = p.parse_args()
    print(render(load(args.artifact), args.label, args.artifact))


if __name__ == "__main__":
    main()
