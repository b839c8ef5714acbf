#!/usr/bin/env python3
"""Round-close gate: benchmark numbers cited in the docs must match the
recorded bench artifact.

Convention (the round-10 verdict's task #2, widened per round 11's
task #7): every benchmark number in the four doc files (README.md,
docs/SCALE.md, docs/CATALOG.md, docs/PLANS.md) lives on a line that
NAMES its recorded key (a concrete key or a `family_*` wildcard) from
ANY recorded key family — m1_*, zorder_*, ann_*, bpe_*, cc_*, spill_*,
and every other prefix the bench artifact carries. This script:

  1. loads the recorded key/value map — docs/BENCH_FULL.json (written
     by graft.Bench) if present, else the newest BENCH_r*.json stdout
     tail (which only preserves m1_* keys — the full artifact is the
     real gate);
  2. derives the set of recorded key-family PREFIXES and scans the doc
     files for claim lines (lines naming a key of any recorded family)
     and extracts every DECORATED number on them: ratios
     ("3.5x"/"3.5×"), latencies ("10.2 ms", "0.238 s"), recalls
     ("recall@10 0.975"), and ranges ("37-50 ms");
  3. for each claim, requires a recorded key of the same unit class
     among the line's cited keys whose value the claim matches —
     ranges by containment, single numbers within TOL — and FAILS loud
     otherwise.

A key name with no number is always fine (key-only citation). A number
on a line with no recorded-family key is not checked — the convention
is that bench claims must name their key, and the judge reads
unexplained numbers as drift.
"""
import glob
import json
import os
import re
import sys

TOL = 0.10  # single-number tolerance vs the recorded value; anything
            # more volatile must be cited as a RANGE (containment) or
            # retired as a claim — the round-10 verdict's rule

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = [os.path.join(ROOT, p) for p in
        ("README.md", "docs/SCALE.md", "docs/CATALOG.md", "docs/PLANS.md")]


def load_recorded():
    """(source_name, {key: value}) from BENCH_FULL.json or newest tail."""
    full = os.path.join(ROOT, "docs/BENCH_FULL.json")
    if os.path.exists(full):
        with open(full) as f:
            data = json.load(f)
        kvs = dict(data.get("scale", {}))
        kvs.update({k: v for k, v in data.get("headline", {}).items()
                    if isinstance(v, (int, float))})
        if kvs:
            return "docs/BENCH_FULL.json", kvs
    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not benches:
        print("no recorded bench artifact found", file=sys.stderr)
        sys.exit(2)
    latest = benches[-1]
    with open(latest) as f:
        tail = json.load(f).get("tail", "")
    kvs = {m.group(1): float(m.group(2)) for m in re.finditer(
        r'"(m1_[a-z0-9_]+)":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)', tail)}
    return os.path.basename(latest), kvs


def unit_class(key):
    if "ms_per_query" in key:
        return "ms"
    if "recall" in key:
        return "recall"
    if re.search(r"(_x$|_x_)", key) or any(
            t in key for t in ("speedup", "amortization", "amp", "ratio")):
        return "x"
    if key.endswith("_sec") or "_sec_" in key:
        return "s"
    return "plain"


NUM = r"\d{1,3}(?:,\d{3})*(?:\.\d+)?|\d+(?:\.\d+)?"
NUM = "(?:%s)" % NUM
DASH = r"[–—-]"  # en/em dash or hyphen


def extract_claims(line):
    """[(unit, lo, hi, text)] — single numbers have lo == hi."""
    claims = []
    # strip markdown bold and approximation markers for matching
    s = re.sub(r"[*`~≈]", "", line)

    def add(unit, lo, hi, text):
        claims.append((unit, float(str(lo).replace(",", "")),
                       float(str(hi).replace(",", "")), text))

    # guards: the number must start a token (so "PQ8x256" / "4×4-block"
    # never read as ratios) and the unit must end one
    pre = r"(?<![\w.])"
    xunit = r"[x×](?![a-zA-Z0-9])"
    # ranges first, removing them so singles don't re-match their ends
    for unit, suffix in (("x", xunit), ("ms", r"ms\b"), ("s", r"s\b")):
        rx = re.compile(r"%s(%s)%s(%s)\s*%s" % (pre, NUM, DASH, NUM, suffix))
        for m in rx.finditer(s):
            add(unit, m.group(1), m.group(2), m.group(0))
        s = rx.sub(" ", s)
    for m in re.finditer(r"%s(%s)\s*%s" % (pre, NUM, xunit), s):
        add("x", m.group(1), m.group(1), m.group(0))
    for m in re.finditer(r"%s(%s)\s*ms\b" % (pre, NUM), s):
        add("ms", m.group(1), m.group(1), m.group(0))
    for m in re.finditer(r"%s(%s)\s*s\b" % (pre, NUM), s):
        # "0.238 s" is a latency claim; "8 segments" etc never match
        add("s", m.group(1), m.group(1), m.group(0))
    for m in re.finditer(r"recall@\d+\s*[=:]?\s*(0\.\d+)", s):
        add("recall", m.group(1), m.group(1), m.group(0))
    return claims


def main():
    source, recorded = load_recorded()
    if not recorded:
        print("recorded artifact %s carries no m1_* keys" % source,
              file=sys.stderr)
        sys.exit(2)
    # every recorded key family is a claim anchor, not just m1_* —
    # docs/SCALE.md cites zorder_*/ann_*/bpe_*/cc_*/spill_* keys too.
    # Anchors are (a) any m1_* token (the legacy hard guarantee: an m1
    # citation matching nothing recorded fails), (b) EXACT recorded key
    # names from every family, (c) explicit `family_*` wildcards of
    # recorded families. Bare family prefixes are deliberately NOT
    # anchors: the recorded families include generic words (docs, cand,
    # verify, value, total), and anchoring on them would hard-fail the
    # gate on ordinary prose that cites no bench claim. (On the
    # stdout-tail fallback only m1_* keys survive, so the anchor set
    # degenerates to the old behavior there.)
    prefixes = sorted({k.split("_")[0] for k in recorded if "_" in k})
    # single-token keys (the headline scalars: value, spread, canary)
    # are English words — never anchors
    exact = sorted((k for k in recorded if "_" in k), key=len, reverse=True)
    alts = [r"m1_[a-z0-9_*]+"]
    if exact:
        alts.append(r"(?:%s)\b" % "|".join(map(re.escape, exact)))
    if prefixes:
        alts.append(r"(?:%s)_[a-z0-9_]*\*" % "|".join(map(re.escape, prefixes)))
    key_rx = re.compile(r"\b(?:%s)" % "|".join(alts))
    failures = []
    checked = 0
    skipped = 0
    for path in DOCS:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            lines = f.readlines()
        # markdown wraps: a claim's number and its key can land on
        # different physical lines — scan per BLOCK (a table row, or a
        # bullet/paragraph up to the next blank line or new list item)
        blocks = []  # (first_lineno, text)
        cur, cur_start = [], 1
        for i, raw in enumerate(lines, 1):
            starts_new = (not raw.strip()) or \
                raw.lstrip().startswith(("- ", "* ", "#", "|"))
            if starts_new and cur:
                blocks.append((cur_start, " ".join(cur)))
                cur = []
            if raw.strip():
                if not cur:
                    cur_start = i
                cur.append(raw.strip())
        if cur:
            blocks.append((cur_start, " ".join(cur)))
        for i, line in blocks:
            pats = key_rx.findall(line)
            if not pats:
                continue
            cited = set()
            for p in pats:
                rx = re.compile("^" + re.escape(p).replace(r"\*", ".*") + "$")
                cited.update(k for k in recorded if rx.match(k))
            if not cited:
                # the cited key family isn't in the recorded artifact.
                # Against the full artifact (BENCH_FULL.json, written by
                # every successful full bench run) that means the docs
                # cite keys the bench no longer emits — a FAILURE; a
                # truncated stdout-tail fallback genuinely can't check
                # the block, so there it's only a skip.
                n = len(extract_claims(line))
                if n and source.endswith("BENCH_FULL.json"):
                    failures.append(
                        "%s:%d cites %s but the full artifact records no "
                        "such key (%d unchecked claims)"
                        % (os.path.relpath(path, ROOT), i,
                           "/".join(pats), n))
                else:
                    skipped += n
                continue
            for unit, lo, hi, text in extract_claims(line):
                checked += 1
                cands = {k: recorded[k] for k in cited
                         if unit_class(k) == unit}
                ok = False
                for k, v in cands.items():
                    if lo != hi:
                        ok = ok or (lo <= v <= hi)
                    else:
                        ok = ok or (abs(v - lo) <= TOL * max(abs(v), 1e-12))
                if not ok:
                    near = ", ".join("%s=%.4g" % (k, v)
                                     for k, v in sorted(cands.items())) or \
                        "(no cited %s-class key recorded)" % unit
                    failures.append(
                        "%s:%d claim '%s' does not match recorded %s [%s]"
                        % (os.path.relpath(path, ROOT), i, text.strip(),
                           source, near))
    for f in failures:
        print("FAIL " + f)
    print("%d claims checked against %s: %d stale (%d skipped — key "
          "family absent from the recorded artifact)"
          % (checked, source, len(failures), skipped))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
