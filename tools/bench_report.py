"""Render a BENCH markdown section from a bench artifact — the per-round
tables in BENCH.md are GENERATED with this tool, so the documented numbers
are byte-traceable to the artifact (`BENCH_r{N}.json` from the driver, or a
raw one-line JSON from `python bench.py`).

When pointed at a `BENCH_r{N}_local.json` and the canonical driver artifact
`BENCH_r{N}.json` exists next to it, the tool switches to the canonical
file (the round-4 verdict flagged a table rendered from the local close-run
while the authoritative driver artifact said otherwise); `--allow-local`
keeps the explicit path.

Usage:
    python tools/bench_report.py BENCH_r04.json
    python tools/bench_report.py /tmp/bench_local.json --label "local run"
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path


def resolve(path: str, allow_local: bool) -> str:
    m = re.fullmatch(r"(.*BENCH_r\d+)_local\.json", path)
    if m and not allow_local:
        canonical = Path(m.group(1) + ".json")
        if canonical.exists():
            print(
                f"# {path} is a local close-run; rendering the canonical "
                f"driver artifact {canonical} instead (--allow-local overrides)",
                file=sys.stderr,
            )
            return str(canonical)
    return path


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    # driver artifact shape wraps the bench output under "parsed"
    return data.get("parsed", data)


def _cell(name: str, q: dict, detail: dict) -> str:
    if name in detail:
        d = detail[name]
        return f"{name} | {d['median']} ({d['min']}–{d['max']}, k={d['k']})"
    return f"{name} | {q[name]}"


def render(d: dict, label: str, source: str) -> str:
    q = d["queries"]
    detail = d.get("queries_detail", {})
    names = list(q)
    half = (len(names) + 1) // 2
    lines = [
        f"{label}: **{d['value']} s across {len(names)} queries** at "
        f"`{d.get('sf', '?')}`, {d.get('cpus', '?')} cpus, "
        f"docs_per_sec {d.get('docs_per_sec', '?')} "
        f"(source: `{source}`, rendered by `tools/bench_report.py`"
        + ("; per-query warm lower-medians, spread in parens" if detail else "")
        + ").",
        "",
        "| query | sec | | query | sec |",
        "|---|---|---|---|---|",
    ]
    for i in range(half):
        left = _cell(names[i], q, detail)
        j = half + i
        right = _cell(names[j], q, detail) if j < len(names) else " | "
        lines.append(f"| {left} | | {right} |")
    for key in ("skew_guard", "setsim_gram_cap", "band_salt", "host_cpu"):
        if key in d:
            lines += ["", f"`{key}`: `{json.dumps(d[key])}`"]
    return "\n".join(lines)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--label", default="Headline per-query wall time")
    p.add_argument("--allow-local", action="store_true")
    args = p.parse_args()
    path = resolve(args.artifact, args.allow_local)
    print(render(load(path), args.label, path))


if __name__ == "__main__":
    main()
