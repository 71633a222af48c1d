"""Generate QUERIES.md — the user-facing catalog of every registered
query — from the live registry. Deterministic output; the test suite
regenerates it and fails if the committed file is stale.

    python tools/gen_query_catalog.py            # rewrite QUERIES.md
    python tools/gen_query_catalog.py --check    # exit 1 if stale
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def render() -> str:
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans import (
        registry,
    )

    lines = [
        "# Query catalog",
        "",
        "Auto-generated from the registry by `tools/gen_query_catalog.py` —",
        "do not edit by hand. Every row is runnable via",
        "`python -m cryptopulse_real_time_arbitrage_detection_lakehouse_spark"
        " query <name>` and (oracle rows) is hash-compared against its DuckDB",
        "twin in `tests/test_oracle_queries.py`.",
        "",
    ]
    names = sorted(registry.all_queries())
    n_oracle = sum(1 for n in names if registry.get(n).oracle is not None)
    lines.append(
        f"{len(names)} queries, {n_oracle} with ANSI-SQL oracles, "
        f"{len(names) - n_oracle} rows-only."
    )
    lines.append("")
    by_tag: dict[str, int] = {}
    for n in names:
        for t in registry.get(n).tags:
            by_tag[t] = by_tag.get(t, 0) + 1
    lines.append(
        "Tags: "
        + ", ".join(f"{t} ({c})" for t, c in sorted(by_tag.items()))
        + "."
    )
    lines.append("")
    for name in names:
        spec = registry.get(name)
        oracle = "oracle" if spec.oracle else "rows-only"
        lines.append(f"## `{name}`")
        lines.append("")
        lines.append(f"*{', '.join(spec.tags)}* — {oracle}")
        lines.append("")
        lines.append(spec.doc.strip())
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> int:
    out = REPO / "QUERIES.md"
    content = render()
    if "--check" in sys.argv:
        if not out.exists() or out.read_text() != content:
            print("QUERIES.md is stale — run python tools/gen_query_catalog.py")
            return 1
        print("QUERIES.md is up to date")
        return 0
    out.write_text(content)
    print(f"wrote {out} ({content.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
