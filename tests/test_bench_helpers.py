"""bench.py harness helpers — pure-Python, no Spark session needed.

The retime/storm-rejection machinery decides what lands in the committed
BENCH snapshot, so its parsing and filtering logic deserves pins: a bug
here silently contaminates (or silently hides) performance numbers.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_load_prior_times_reads_own_and_driver_shapes(tmp_path, monkeypatch):
    # own shape: top-level queries map
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q_a": 1.5, "q_b": 0.2}})
    )
    # driver shape: parsed null, payload (front-truncated) in tail
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            {
                "parsed": None,
                "tail": 'ncated..., "q_a": 0.9, "q_c": 2.0}, "sf": "0.1"}',
            }
        )
    )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    prior = bench.load_prior_times({"q_a", "q_b", "q_c"})
    assert prior == {"q_a": 0.9, "q_b": 0.2, "q_c": 2.0}


def test_load_prior_times_filters_unknown_names(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q_a": 1.0, "n_errors": 3.0}})
    )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench.load_prior_times({"q_a"}) == {"q_a": 1.0}


def test_load_prior_times_filters_by_scale_factor(tmp_path, monkeypatch):
    # sf0.001 record must NOT contribute priors to an sf0.1 run (its times
    # are 10-100x lower — mixing scales made the tripwire fire falsely)
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q_a": 0.05}, "sf": "0.001"})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"queries": {"q_a": 1.2}, "sf": "0.1"})
    )
    # undeterminable sf: skipped too
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"queries": {"q_a": 0.01}}))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench.load_prior_times({"q_a"}, sf="0.1") == {"q_a": 1.2}
    # no sf argument: legacy behavior, everything contributes
    assert bench.load_prior_times({"q_a"}) == {"q_a": 0.01}


def test_detect_regressions_trips_only_past_3x_prior():
    prior = {"q_a": 1.0, "q_b": 0.5}
    results = {"q_a": 3.5, "q_b": 1.4, "q_new": 9.0}  # q_new: no prior
    reg = bench.detect_regressions(results, prior)
    assert reg == {"q_a": {"best_sec": 3.5, "prior_best_sec": 1.0}}
    # exactly-3x does not trip (strict >)
    assert bench.detect_regressions({"q_a": 3.0}, prior) == {}


def test_micro_timed_discards_storm_runs(monkeypatch):
    # deterministic "clock": five clean ~1 s runs with one 30x storm
    seq = iter([1.0, 1.01, 30.0, 0.99, 1.02, 1.0])
    monkeypatch.setattr(bench, "timed_all", lambda fn, n: [next(seq)])
    monkeypatch.setattr(bench, "wait_for_quiet", lambda tag: None)
    monkeypatch.setattr(bench, "MICRO_RUNS", 5)
    stats: dict = {}
    best = bench.micro_timed(lambda: None, stats, "m")
    rec = stats["m"]
    assert best == 0.99
    assert rec["discarded_storm_runs"] == [30.0]
    assert len(rec["runs"]) == 5
    assert rec["std"] < 0.05  # storm no longer contaminates the summary
    # r11 attribution arrays stay parallel to their run arrays
    assert len(rec["steal_pct"]) == len(rec["runs"])
    assert len(rec["discarded_steal_pct"]) == len(rec["discarded_storm_runs"])


def test_micro_timed_retroactively_discards_inflated_head(monkeypatch):
    # first runs contaminated; a later clean run reveals them as outliers
    seq = iter([10.0, 9.5, 1.0, 1.01, 0.99, 1.02, 1.0])
    monkeypatch.setattr(bench, "timed_all", lambda fn, n: [next(seq)])
    monkeypatch.setattr(bench, "wait_for_quiet", lambda tag: None)
    monkeypatch.setattr(bench, "MICRO_RUNS", 5)
    stats: dict = {}
    best = bench.micro_timed(lambda: None, stats, "m")
    rec = stats["m"]
    assert best == 0.99
    assert set(rec["discarded_storm_runs"]) == {10.0, 9.5}
    assert all(t <= 3 * 0.99 for t in rec["runs"])
    assert len(rec["steal_pct"]) == len(rec["runs"])
    assert len(rec["discarded_steal_pct"]) == len(rec["discarded_storm_runs"])


def test_load_prior_times_prefers_committed_bench_over_working_tree(
    tmp_path, monkeypatch
):
    # The script overwrites the working-tree BENCH.json on every run, so the
    # tripwire reference must come from git HEAD: a back-to-back re-run
    # comparing against its own previous (storm-inflated) output would
    # self-ratify the storm (observed r10: run 1 events block 3-9x slow,
    # run 2 read run 1's numbers as "prior" and reported zero regressions).
    import subprocess

    def git(*argv):
        subprocess.run(
            ["git", "-C", str(tmp_path), *argv],
            check=True,
            capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "HOME": str(tmp_path),
                "PATH": bench.os.environ["PATH"],
            },
        )

    git("init", "-q")
    (tmp_path / "BENCH.json").write_text(
        json.dumps({"queries": {"q_a": 0.5}, "sf": "0.1"})
    )
    git("add", "BENCH.json")
    git("commit", "-q", "-m", "committed snapshot")
    # a fresh run overwrites the working tree with a storm-inflated record
    (tmp_path / "BENCH.json").write_text(
        json.dumps({"queries": {"q_a": 4.0}, "sf": "0.1"})
    )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench.load_prior_times({"q_a"}, sf="0.1") == {"q_a": 0.5}


def test_load_prior_times_ignores_untracked_round_files(tmp_path, monkeypatch):
    # r11 fix: BENCH_r*.json priors must ALSO come from HEAD — the driver
    # writes BENCH_r{N}.json post-HEAD (untracked), so a working-tree glob
    # let a query absent from the committed BENCH.json take its tripwire
    # prior from same-session, possibly storm-inflated output.
    import subprocess

    def git(*argv):
        subprocess.run(
            ["git", "-C", str(tmp_path), *argv],
            check=True,
            capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "HOME": str(tmp_path),
                "PATH": bench.os.environ["PATH"],
            },
        )

    git("init", "-q")
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q_a": 0.5}, "sf": "0.1"})
    )
    git("add", "BENCH_r01.json")
    git("commit", "-q", "-m", "committed round record")
    # post-commit the driver drops an UNTRACKED, storm-inflated round file
    # and the working-tree copy of the committed one gets overwritten too
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q_a": 9.9}, "sf": "0.1"})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"queries": {"q_a": 4.0, "q_b": 4.0}, "sf": "0.1"})
    )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    prior = bench.load_prior_times({"q_a", "q_b"}, sf="0.1")
    assert prior == {"q_a": 0.5}  # untracked r02 (and the dirty working
    # copy of r01) contribute nothing — q_b correctly has NO prior


def test_micro_gated_primary_block_matches_headline(monkeypatch):
    # r11 fix: when the quiet-gate retime WINS, the primary micro_stats
    # block must be the retime's (min(primary.runs) == headline); the storm
    # pass stays visible under <name>_storm_pass.
    calls = {"n": 0}

    def fake_micro_timed(fn, stats, name):
        calls["n"] += 1
        if calls["n"] == 1:  # storm pass: 10x the prior
            stats[name] = {"runs": [10.0, 10.2], "mean": 10.1, "std": 0.1}
            return 10.0
        stats[name] = {"runs": [1.0, 1.1], "mean": 1.05, "std": 0.05}
        return 1.0

    monkeypatch.setattr(bench, "micro_timed", fake_micro_timed)
    monkeypatch.setattr(bench, "wait_for_quiet", lambda tag: None)
    micro_stats: dict = {}
    retimed: list = []
    prior = {"m": 1.0}

    # reproduce micro_gated's logic standalone (it closes over main()'s
    # locals); this mirrors bench.py's micro_gated body line-for-line
    def micro_gated(name, fn):
        t = bench.micro_timed(fn, micro_stats, name)
        if name in prior and t > 3 * prior[name]:
            bench.wait_for_quiet(f"retime:{name}")
            t2 = bench.micro_timed(fn, micro_stats, f"{name}_retime")
            retimed.append(name)
            if t2 < t:
                micro_stats[f"{name}_storm_pass"] = micro_stats[name]
                micro_stats[name] = micro_stats.pop(f"{name}_retime")
                micro_stats[name]["source"] = "retime"
                t = t2
            else:
                micro_stats[name]["source"] = "first_pass"
        return t

    headline = micro_gated("m", lambda: None)
    assert headline == 1.0
    assert min(micro_stats["m"]["runs"]) == headline
    assert micro_stats["m"]["source"] == "retime"
    assert micro_stats["m_storm_pass"]["runs"] == [10.0, 10.2]
    assert "m_retime" not in micro_stats
