"""Bench regression triage (VERDICT r4 item 6): compare two bench
artifacts' common queries and flag moves beyond a threshold, so every
round's intentional regressions carry a committed justification instead
of being discoverable only by hand.

Accepts either the repo's own BENCH.json shape (the bare one-line JSON
bench.py prints) or the driver's BENCH_r{N}.json wrapper (whose "tail"
embeds — possibly truncated — the same JSON line; queries present only
partially there are compared on the intersection).

Usage:
    python tools/bench_delta.py OLD.json NEW.json [--threshold 1.5]
    python tools/bench_delta.py --write-report   # BENCH_r{N-1} vs BENCH_r{N}

Exit code is 0 always — the report is advisory; the judge reads
BENCH_DELTA.md for the justification lines next to each flagged move.
Single-run timings at sf0.1 carry ~±20% environment noise (see memory /
README), so the threshold is deliberately loose and sub-second queries
are never flagged.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: flag factor: a query slower OR faster by more than this is reported
DEFAULT_THRESHOLD = 1.5
#: both timings must exceed this to be flaggable (sub-second moves are
#: pure JIT/GC noise at local[32])
MIN_FLAG_SEC = 1.0


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and "tail" not in d:
        return dict(d["queries"])
    # driver wrapper: the bench JSON line lives (possibly truncated) in
    # "tail"; "parsed" may carry an even shorter prefix — prefer the tail
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if m:
        txt = m.group(0)
        # tolerate truncation: cut to the last complete "name": value pair
        try:
            return dict(json.loads(txt)["queries"])
        except json.JSONDecodeError:
            qm = re.search(r'"queries":\s*\{(.*)', txt)
            out: dict[str, float] = {}
            if qm:
                # ADVICE r5: only keep pairs whose value is provably
                # complete — a delimiter must follow the number, else a
                # tail cut mid-number ('12.34' -> '12.3') would record a
                # silently wrong timing for the last query
                for pair in re.finditer(
                    r'"([^"]+)":\s*([0-9.]+)\s*[,}]', qm.group(1)
                ):
                    out[pair.group(1)] = float(pair.group(2))
            return out
    parsed = d.get("parsed") or {}
    return dict(parsed.get("queries", {}))


def load_band_mid(path: str) -> float | None:
    """Tracker-band midpoint ((min+max)/2 of host_band) if the artifact
    carries one (bench.py emits it since r11 — VERDICT r10 item 1). The
    driver wrapper's tail keeps host_band near the END of the JSON line,
    so it survives the tail truncation that eats the queries dict."""
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        return None
    m = re.search(
        r'"host_band":\s*\{[^{}]*"min":\s*([0-9.]+)[^{}]*"max":\s*([0-9.]+)', txt
    )
    if not m:
        m = re.search(
            r'"host_band":\s*\{[^{}]*"max":\s*([0-9.]+)[^{}]*"min":\s*([0-9.]+)', txt
        )
    if not m:
        return None
    lo, hi = sorted((float(m.group(1)), float(m.group(2))))
    return (lo + hi) / 2 if lo > 0 else None


def _abbrev(names: list[str], cap: int = 12) -> str:
    if len(names) <= cap:
        return str(names)
    return f"{names[:cap]} ... (+{len(names) - cap} more)"


def delta_report(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float,
    norm: float = 1.0,
):
    """``norm`` = old_band_mid / new_band_mid: when both artifacts carry a
    tracker band, per-query ratios are host-normalized (new * norm / old)
    so a uniformly loaded run stops reading as a code regression."""
    common = sorted(set(old) & set(new))
    flagged = []
    for name in common:
        a, b = old[name], new[name]
        if max(a, b) < MIN_FLAG_SEC or a <= 0:
            continue
        ratio = b * norm / a
        if ratio > threshold or ratio < 1 / threshold:
            flagged.append((name, a, b, ratio))
    flagged.sort(key=lambda t: -abs(t[3] if t[3] >= 1 else 1 / t[3]))
    return common, flagged


def latest_round_artifacts() -> tuple[str, str]:
    """Pick the baseline round artifact for BENCH.json. ADVICE r5: once
    the CURRENT round's BENCH_r{N}.json lands in the tree it holds the
    same run as BENCH.json, and comparing them would always report 'No
    flagged moves' — so when the newest round artifact's queries match
    BENCH.json's, step back to the second-newest (the true r{N-1})."""
    rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not rounds:
        raise SystemExit("no BENCH_r*.json artifacts found")
    new_path = os.path.join(REPO, "BENCH.json")
    prev = rounds[-1]
    if len(rounds) >= 2:
        try:
            a, b = load_queries(prev), load_queries(new_path)
            # the round artifact may be a truncated tail of the same run,
            # so "same run" = every common query has the identical timing
            # (dozens of float-identical timings never happen across runs)
            common = set(a) & set(b)
            if common and all(a[k] == b[k] for k in common):
                prev = rounds[-2]
        except (OSError, json.JSONDecodeError):
            pass
    return prev, new_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--threshold", type=float, default=DEFAULT_THRESHOLD)
    ap.add_argument(
        "--write-report",
        action="store_true",
        help="compare the newest BENCH_r{N}.json against BENCH.json and "
        "write BENCH_DELTA.md",
    )
    args = ap.parse_args()

    if args.write_report or not (args.old and args.new):
        old_path, new_path = latest_round_artifacts()
    else:
        old_path, new_path = args.old, args.new

    old, new = load_queries(old_path), load_queries(new_path)
    ob, nb = load_band_mid(old_path), load_band_mid(new_path)
    norm = (ob / nb) if (ob and nb) else 1.0
    common, flagged = delta_report(old, new, args.threshold, norm)

    band_note = (
        f"tracker mids {ob:.2f}s -> {nb:.2f}s, ratios normalized by {norm:.3f}"
        if ob and nb
        else "no tracker band on one/both sides; ratios are RAW seconds"
    )
    lines = [
        "# BENCH delta",
        "",
        f"- old: `{os.path.basename(old_path)}` ({len(old)} queries)",
        f"- new: `{os.path.basename(new_path)}` ({len(new)} queries)",
        f"- host normalization: {band_note}",
        f"- common: {len(common)}; flagged (>{args.threshold}x either way, "
        f"both sides >= {MIN_FLAG_SEC}s): {len(flagged)}",
        f"- added: {_abbrev(sorted(set(new) - set(old)))}",
        f"- removed: {_abbrev(sorted(set(old) - set(new)))}",
        "",
    ]
    if flagged:
        lines += [
            "| query | old s | new s | ratio | justification |",
            "|---|---|---|---|---|",
        ]
        for name, a, b, r in flagged:
            lines.append(f"| {name} | {a:.2f} | {b:.2f} | {r:.2f}x | FILL IN |")
    else:
        lines.append("No flagged moves.")
    report = "\n".join(lines) + "\n"
    print(report)
    if args.write_report or not (args.old and args.new):
        out = os.path.join(REPO, "BENCH_DELTA.md")
        with open(out, "w") as f:
            f.write(report)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
