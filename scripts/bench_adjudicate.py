#!/usr/bin/env python
"""Adjudication summary for a driver bench record vs the committed snapshot.

Every round the driver re-runs bench.py and its record lands as
BENCH_r{N}.json; on this box (see BASELINE.md's noise-band section) that
record frequently crosses a hypervisor-steal storm or an ambient-slow
window, and the round's first task is deciding adopt-vs-supersede. This
script prints the decision inputs in one shot:

  python scripts/bench_adjudicate.py BENCH_r14.json [BENCH.json]

* headline ratio + per-query median ratio (candidate vs committed);
* the scan-floor ratio — the ambient tell steal can't see;
* the insert micro's kept-run steal summary + gate-exhausted flag — the
  storm tell (a record whose own micro_stats carry >1.5% steal on kept
  runs has adjudicated itself);
* movers >1.4x with their ratios, split sub-second vs heavier (sub-second
  shapes swing 1.3-1.6x on floor-elevated windows at ~0% steal — see
  BASELINE.md);
* a one-line verdict: ADOPT if the candidate is cleaner and not slower,
  else SUPERSEDE with the evidence to quote.

Reads committed evidence only as presented in the two files; mutates
nothing.
"""

from __future__ import annotations

import json
import statistics
import sys

SUBSEC_NOISE = 1.4  # movers above this get listed; see BASELINE.md band
MICRO = "micro_insert_100k_1024"
FLOOR = "micro_insert_scan_floor"


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # the driver's wrapper shape keeps the bench line under "tail"
    if "queries" not in d and "tail" in d:
        raise SystemExit(
            f"{path} is a driver wrapper without a full queries map; "
            "adjudicate against the driver-written BENCH.json instead"
        )
    # any other shape missing the two decision inputs would otherwise die
    # later with a bare KeyError in main() (ADVICE r14)
    missing = [k for k in ("queries", "value") if k not in d]
    if missing:
        raise SystemExit(
            f"{path} lacks {missing} — not a bench record this script can "
            "adjudicate (expected bench.py's one-line JSON shape)"
        )
    return d


def micro_summary(d: dict, name: str) -> str:
    ms = d.get("micro_stats", {}).get(name)
    if not ms:
        return "no micro_stats"
    kept = ms.get("steal_pct", [])
    # a degenerate record (all runs steal-rejected) has empty arrays;
    # diagnose instead of crashing in min() (ADVICE r14)
    if not ms.get("runs") or not kept:
        return (
            "empty kept-run arrays (every run rejected?) — "
            f"{len(ms.get('steal_rejected_runs', []))} rejected"
            f"{', GATE EXHAUSTED' if ms.get('steal_gate_exhausted') else ''}"
        )
    return (
        f"best {min(ms['runs']):.4f}s, kept-run steal "
        f"{min(kept):.2f}-{max(kept):.2f}%"
        f"{', GATE EXHAUSTED' if ms.get('steal_gate_exhausted') else ''}"
        f" ({len(ms.get('steal_rejected_runs', []))} rejected)"
    )


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    cand = load(sys.argv[1])
    base = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH.json")

    cq, bq = cand["queries"], base["queries"]
    common = [k for k in cq if k in bq and bq[k]]
    ratios = {k: cq[k] / bq[k] for k in common}
    med = statistics.median(ratios.values())
    headline = cand["value"] / base["value"]

    def floor_best(d: dict) -> float | None:
        ms = d.get("micro_stats", {}).get(FLOOR)
        return min(ms["runs"]) if ms else None

    cf, bf = floor_best(cand), floor_best(base)

    print(f"headline: {cand['value']:.1f}s vs {base['value']:.1f}s "
          f"= {headline:.3f}x   median per-query {med:.3f}x over {len(common)}")
    if cf and bf:
        print(f"scan floor: {cf:.4f}s vs {bf:.4f}s = {cf / bf:.2f}x "
              "(ambient tell; >1.3x = slow window even at 0% steal)")
    print(f"insert micro (candidate): {micro_summary(cand, MICRO)}")
    print(f"insert micro (committed): {micro_summary(base, MICRO)}")

    movers = sorted(
        ((k, r) for k, r in ratios.items() if r > SUBSEC_NOISE),
        key=lambda x: -x[1],
    )
    for k, r in movers:
        tag = "sub-second" if bq[k] < 1.0 else "HEAVY"
        print(f"  mover {k}: {bq[k]:.3f} -> {cq[k]:.3f} = {r:.2f}x [{tag}]")

    cms = cand.get("micro_stats", {}).get(MICRO, {})
    stormy = cms.get("steal_gate_exhausted") or any(
        s > 1.5 for s in cms.get("steal_pct", [])
    )
    slow = (cf / bf > 1.3) if (cf and bf) else False
    heavy = [k for k, r in movers if bq[k] >= 1.0]
    if headline <= 1.0 and not stormy:
        # the floor tell and heavy movers still qualify an otherwise-adoptable
        # candidate (ADVICE r14): a floor-elevated window can hand a faster
        # headline to a record whose per-query values shouldn't become priors
        caveats = []
        if slow:
            caveats.append(
                f"scan floor {cf / bf:.2f}x the committed pass — "
                "floor-elevated window; re-check sub-second priors"
            )
        if heavy:
            caveats.append(
                f"HEAVY movers >1.4x despite faster headline: {heavy} — "
                "retime before trusting those rows"
            )
        print("VERDICT: ADOPT — candidate is not slower and its own "
              "micro evidence is quiet"
              + ("".join(f"\n  CAVEAT: {c}" for c in caveats)))
    else:
        why = []
        if stormy:
            why.append("kept-run steal >1.5% / gate exhausted in its own "
                       "micro_stats")
        if slow:
            why.append(f"scan floor {cf / bf:.2f}x the committed pass")
        if headline > 1.0:
            why.append(f"headline {headline:.2f}x slower")
        print("VERDICT: SUPERSEDE — " + "; ".join(why) +
              ". Keep the committed snapshot; record this row in PARITY "
              "with the numbers above.")


if __name__ == "__main__":
    main()
