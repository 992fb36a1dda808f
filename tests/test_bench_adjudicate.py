"""Pin scripts/bench_adjudicate.py's two verdict paths (r14).

The adjudication script is round-start tooling: it reads a driver bench
record + the committed snapshot and prints the adopt-vs-supersede
decision inputs (headline/median ratios, scan-floor ratio, the record's
own kept-run steal, >1.4x movers). These tests feed it synthetic records
and pin that a quiet-not-slower candidate reads ADOPT while a
storm-marked or slower one reads SUPERSEDE with the right evidence
named.
"""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = "/root/repo/scripts/bench_adjudicate.py"


def _record(value, queries, insert_runs, insert_steal, exhausted,
            floor_runs):
    return {
        "metric": "headline_total_sec", "value": value, "unit": "sec",
        "queries": dict(queries), "n_errors": 0,
        "micro_stats": {
            "micro_insert_100k_1024": {
                "runs": insert_runs, "steal_pct": insert_steal,
                "steal_rejected_runs": [],
                "steal_gate_exhausted": exhausted,
            },
            "micro_insert_scan_floor": {
                "runs": floor_runs, "steal_pct": [0.0] * len(floor_runs),
                "steal_rejected_runs": [],
                "steal_gate_exhausted": False,
            },
        },
    }


def _run(tmp_path, cand, base):
    cp, bp = tmp_path / "cand.json", tmp_path / "base.json"
    cp.write_text(json.dumps(cand))
    bp.write_text(json.dumps(base))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(cp), str(bp)],
        capture_output=True, text=True, check=True,
    )
    return out.stdout


BASE = _record(
    100.0, {"q1": 1.0, "q2": 0.5}, [0.33, 0.32], [0.1, 0.0], False,
    [0.07, 0.08],
)


def test_quiet_not_slower_candidate_reads_adopt(tmp_path):
    cand = _record(
        98.0, {"q1": 0.98, "q2": 0.49}, [0.32, 0.31], [0.2, 0.1], False,
        [0.071, 0.08],
    )
    out = _run(tmp_path, cand, BASE)
    assert "VERDICT: ADOPT" in out


def test_storm_marked_candidate_reads_supersede_with_steal_evidence(tmp_path):
    cand = _record(
        111.0, {"q1": 1.6, "q2": 0.5}, [0.8, 0.75], [12.0, 9.0], True,
        [0.07, 0.08],
    )
    out = _run(tmp_path, cand, BASE)
    assert "VERDICT: SUPERSEDE" in out
    assert "steal" in out
    # the 1.6x sub-second mover is listed with its ratio
    assert "mover q1" in out and "1.60x" in out


def test_floor_elevated_candidate_names_the_ambient_tell(tmp_path):
    cand = _record(
        125.0, {"q1": 1.3, "q2": 0.6}, [0.33, 0.34], [0.1, 0.0], False,
        [0.21, 0.22],
    )
    out = _run(tmp_path, cand, BASE)
    assert "VERDICT: SUPERSEDE" in out
    assert "scan floor 3.00x" in out
