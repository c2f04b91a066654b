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

# StreamInventory entries: (key, file, member, note) — the streaming
# table's source of truth (round-16 verdict ask #2).
INVENTORY = SRC / "streaming/StreamInventory.scala"
ENTRY = re.compile(
    r'Entry\("(s_[a-z0-9_]+)",\s*"([^"]+)",\s*"([^"]+)",\s*"([^"]*)"\)')


def resolve_member(rel_file, member):
    """file:line of the unique top-level declaration of `member`."""
    path = SRC / rel_file
    if not path.exists():
        sys.exit(f"StreamInventory: no such file {rel_file}")
    # Anchored to top-level indentation (object members sit at 0-2
    # spaces; a same-named val/def nested inside a method body is
    # deeper and must NOT win), and accepting visibility modifiers so
    # adding `private[graft]` to an inventoried member stays loud
    # (round-17 advice) instead of silently resolving to a shadow.
    pat = re.compile(
        r"^ {0,2}(?:(?:private|protected)(?:\[\w+\])?\s+)?(?:final\s+)?"
        r"(?:def|class|object|val)\s+" +
        re.escape(member) + r"\b", re.M)
    text = path.read_text()
    hits = [text.count("\n", 0, m.start()) + 1 for m in pat.finditer(text)]
    if len(hits) != 1:
        sys.exit(f"StreamInventory: {member} resolves to {len(hits)} "
                 f"declarations in {rel_file} (need exactly 1)")
    return f"{rel_file}:{hits[0]}"


def collect_stream():
    text = INVENTORY.read_text()
    entries = ENTRY.findall(text)
    keys = [e[0] for e in entries]
    if len(set(keys)) != len(keys):
        sys.exit("StreamInventory: duplicate pipeline keys")
    return [(k, resolve_member(f, m), m, note) for k, f, m, note in entries]


def render_stream(entries):
    header = ("| pipeline | site | what |\n|---|---|---|")
    rows = [f"| {k} | `{site}` (`{m}`) | {note} |"
            for k, site, m, note in entries]
    return header + "\n" + "\n".join(rows) + "\n"


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


def replace_block(text, pattern, table, what, n):
    m = re.search(pattern, text)
    if not m:
        sys.exit(f"SURVEY.md: {what} table header not found")
    if m.group(0) == table:
        print(f"SURVEY.md {what} ledger current ({n} keys)")
        return text, False
    if "--write" in sys.argv:
        print(f"SURVEY.md {what} ledger rewritten ({n} keys)")
        return text[:m.start()] + table + text[m.end():], True
    print(table)
    print(f"SURVEY.md {what} ledger is STALE — rerun with --write",
          file=sys.stderr)
    return text, None


def main():
    sites = collect_sites()
    stream = collect_stream()
    text = SURVEY.read_text()
    text, ch1 = replace_block(
        text,
        r"\| batch key \| site \| batch key \| site \|\n\|---\|---\|---\|---\|\n(?:\|[^\n]*\|\n)+",
        render(sites), "batch", len(sites))
    text, ch2 = replace_block(
        text,
        r"\| pipeline \| site(?: \| what)? \|\n\|---\|---(?:\|---)?\|\n(?:\|[^\n]*\|\n)+",
        render_stream(stream), "streaming", len(stream))
    if ch1 is None or ch2 is None:
        return 1
    if ch1 or ch2:
        SURVEY.write_text(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
