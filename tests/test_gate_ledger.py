"""Driver-gate ledger invariants (r14).

The correctness gate checks only the FIRST 50 ``queries()`` entries per
round, so coverage is an ordering discipline (policy in
``__spark_entry__.queries()``'s docstring). The judge re-derives the
cross-round union every round with an ad-hoc script; this test commits
the same tripwires so a bad rotation fails locally BEFORE the driver
records it:

* every declared query either already has a driver CORRECTNESS row
  (union over CORRECTNESS_r*.json) or sits in the current first 50
  (born-gating — a new query must gate from birth, never slip to 51+
  unchecked);
* no query's LATEST driver row is red — a latest-red query must re-gate
  (be in the first 50), not rotate away from the evidence;
* the declared surface and the oracle map stay key-identical (the
  driver pairs them positionally by key);
* the flagship stays first (the one fixed slot every round's policy
  keeps).

No Spark session needed — this reads the committed ledger and the entry
module's dicts only.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402


def _ledger() -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a row, that row was fully green)."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, green)
    return latest


def test_every_query_is_ledgered_or_gating_now():
    qs = list(entry_mod.queries())
    ledger = _ledger()
    gate = set(qs[:50])
    unledgered = [q for q in qs if q not in ledger and q not in gate]
    assert not unledgered, (
        f"never driver-checked and not in the current gate: {unledgered} — "
        "born-gating requires new queries in the first 50"
    )


def test_no_latest_red_query_rotated_out_of_the_gate():
    qs = list(entry_mod.queries())
    ledger = _ledger()
    gate = set(qs[:50])
    stranded = [
        q for q, (_, green) in ledger.items()
        if not green and q in qs and q not in gate
    ]
    assert not stranded, (
        f"latest driver row is RED but not re-gating: {stranded}"
    )


def test_declared_surface_matches_oracle_map_exactly():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) == set(osql)
    assert len(qs) >= 50, "gate policy assumes at least 50 entries"


def test_flagship_keeps_the_first_slot():
    assert next(iter(entry_mod.queries())) == "knn_topk"
