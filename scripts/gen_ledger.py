#!/usr/bin/env python3
"""Regenerate SURVEY.md's §2E implementation-ledger table from source.

The site convention (round 12 and earlier, now machine-checked): each
batch key's site is the line of the `Q(` / `Q.noOracle(` call whose
first string-literal argument is the key — i.e. where the Spark plan
and its oracle are paired. InventorySpec re-derives the same mapping in
Scala and fails the build if SURVEY.md drifts from it, so run

    python3 scripts/gen_ledger.py --write

whenever an operator moves or lands. Without --write it prints the
fresh table to stdout and exits 1 if SURVEY.md is stale (0 if current).
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft"
SURVEY = ROOT / "SURVEY.md"

# `Q(` or `Q.noOracle(` with the q_* name literal on the same or next line.
DECL = re.compile(r'\bQ(?:\.noOracle)?\(\s*\n?\s*"(q_[a-z0-9_]+)"')


def collect_sites():
    sites = {}
    for path in sorted(SRC.rglob("*.scala")):
        text = path.read_text()
        for m in DECL.finditer(text):
            key = m.group(1)
            line = text.count("\n", 0, m.start()) + 1
            rel = path.relative_to(SRC).as_posix()
            if key in sites:
                sys.exit(f"duplicate declaration of {key}: "
                         f"{sites[key]} and {rel}:{line}")
            sites[key] = f"{rel}:{line}"
    return sites


def render(sites):
    keys = sorted(sites)
    rows = []
    for i in range(0, len(keys), 2):
        cells = []
        for k in keys[i:i + 2]:
            cells += [k, f"`{sites[k]}`"]
        while len(cells) < 4:
            cells += [""]
        rows.append("| " + " | ".join(cells) + " |")
    header = "| batch key | site | batch key | site |\n|---|---|---|---|"
    return header + "\n" + "\n".join(rows) + "\n"


def main():
    sites = collect_sites()
    table = render(sites)
    text = SURVEY.read_text()
    # the table block: from its header row through the last consecutive |-row
    m = re.search(
        r"\| batch key \| site \| batch key \| site \|\n\|---\|---\|---\|---\|\n(?:\|[^\n]*\|\n)+",
        text)
    if not m:
        sys.exit("SURVEY.md: ledger table header not found")
    if m.group(0) == table:
        print(f"SURVEY.md ledger current ({len(sites)} keys)")
        return 0
    if "--write" in sys.argv:
        SURVEY.write_text(text[:m.start()] + table + text[m.end():])
        print(f"SURVEY.md ledger rewritten ({len(sites)} keys)")
        return 0
    print(table)
    print("SURVEY.md ledger is STALE — rerun with --write", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
