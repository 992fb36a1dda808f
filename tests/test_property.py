"""Property-based checks (hypothesis): the collection's query pipeline
agrees with an independent NumPy brute-force oracle on ARBITRARY inputs, not
just the fixture tables — dimension guards, normalization, threshold and
tie-break semantics all at once.

derandomize=True: the same example set every run (no flaky CI), still far
wider than hand-picked cases. One shared collection-per-example would leak
Spark plans; examples are small (≤12 rows, dim ≤ 6) so each runs in ~100 ms.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nano_vectordb_rs_spark.collection import VectorCollection

DIM = 4

finite_f = st.floats(
    min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite_f, min_size=DIM, max_size=DIM).filter(
    lambda v: math.sqrt(sum(x * x for x in v)) > 1e-3
)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    vectors=st.lists(vec, min_size=1, max_size=12),
    query=vec,
    k=st.integers(min_value=1, max_value=5),
    threshold=st.one_of(st.none(), st.floats(min_value=-1.0, max_value=1.0)),
)
def test_query_matches_numpy_oracle(spark_session, vectors, query, k, threshold):
    spark = spark_session
    c = VectorCollection(spark, DIM, VectorCollection._empty_df(spark, None), None)
    ids = [f"v{i:03d}" for i in range(len(vectors))]
    c.upsert(
        spark.createDataFrame(
            list(zip(ids, vectors)), "`__id__` string, vector array<float>"
        )
    )

    got = c.query(list(query), top_k=k, better_than=threshold).collect()

    # independent oracle: float32 storage normalization, float64 scoring —
    # mirrors the engine's declared numeric contract
    m = np.array(vectors, dtype=np.float32)
    m = m / np.linalg.norm(m.astype(np.float64), axis=1, keepdims=True).astype(
        np.float32
    )
    q = np.array(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    scores = m.astype(np.float64) @ q
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
    want = [
        (ids[i], scores[i])
        for i in order
        if threshold is None or scores[i] >= threshold
    ][:k]

    assert [r["__id__"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r["__metrics__"] == pytest.approx(w[1], abs=1e-5)


@pytest.fixture(scope="module")
def spark_session(spark):
    return spark


# ---------------------------------------------------------------------------
# prefix-filter losslessness (the PPJoin bound behind ngram_jaccard_pairs)
# ---------------------------------------------------------------------------

token = st.integers(min_value=0, max_value=30)  # small alphabet → many collisions
tokset = st.frozensets(token, min_size=1, max_size=12)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(sets=st.lists(tokset, min_size=2, max_size=10))
def test_prefix_filter_never_drops_a_qualifying_pair(sets):
    """Pure-combinatorics property behind dedup.ngram_jaccard_pairs: with
    tokens ordered rarest-first (by corpus frequency, then token), any two
    sets with Jaccard >= t MUST share a token within each other's first
    n - ceil(t*n) + 1 tokens. If this bound were wrong, the candidate join
    would silently drop qualifying pairs at any scale."""
    import math as m

    t = 0.6
    freq: dict[int, int] = {}
    for s in sets:
        for tok in s:
            freq[tok] = freq.get(tok, 0) + 1

    def prefix(s):
        ordered = sorted(s, key=lambda tok: (freq[tok], tok))
        keep = len(s) - m.ceil(t * len(s)) + 1
        return set(ordered[:keep])

    prefixes = [prefix(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= t:
                assert prefixes[i] & prefixes[j], (
                    f"pair {i},{j} has J={inter/union:.3f} >= {t} but shares "
                    f"no prefix token: {sets[i]} / {sets[j]}"
                )


# --- snapshot lifecycle model check ------------------------------------------

_ID_POOL = [f"k{i}" for i in range(6)]

_up_op = st.tuples(
    st.just("upsert"),
    st.dictionaries(
        st.sampled_from(_ID_POOL),
        st.tuples(vec, st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=4,
    ),
)
_del_op = st.tuples(
    st.just("delete"), st.lists(st.sampled_from(_ID_POOL), min_size=1, max_size=3)
)
_snap_op = st.tuples(st.just("snapshot"), st.none())


@settings(max_examples=8, deadline=None, derandomize=True)
@given(ops=st.lists(st.one_of(_up_op, _del_op, _snap_op), min_size=1, max_size=6))
def test_snapshots_replay_model_state(spark_session, ops):
    """Time-travel consistency under ARBITRARY op sequences: every snapshot
    version, reopened at the end (after all later mutations), must hold
    exactly the id→(vector, tag) state a plain Python dict model recorded
    at the moment the snapshot was taken — immutability and completeness
    in one property."""
    import tempfile
    import shutil

    spark = spark_session
    tmp = tempfile.mkdtemp(prefix="nvdb_prop_snap_")
    try:
        c = VectorCollection.open(spark, DIM, f"{tmp}/col")
        model: dict[str, tuple] = {}
        snaps: dict[int, dict] = {}
        for kind, arg in ops + [("snapshot", None)]:
            if kind == "upsert":
                rows = [(i, list(v), t) for i, (v, t) in arg.items()]
                c.upsert(
                    spark.createDataFrame(
                        rows, "`__id__` string, vector array<float>, tag string"
                    )
                )
                for i, (v, t) in arg.items():
                    model[i] = (np.asarray(v, dtype=np.float32), t)
            elif kind == "delete":
                c.delete(arg)
                for i in arg:
                    model.pop(i, None)
            else:
                snaps[c.save_snapshot()] = dict(model)
        for v, want in snaps.items():
            got = {
                r["__id__"]: (np.asarray(r["vector"], dtype=np.float32), r["tag"])
                for r in VectorCollection.open_snapshot(
                    spark, DIM, f"{tmp}/col", v
                ).df.collect()
            }
            assert set(got) == set(want), f"v{v}: id sets differ"
            for i in want:
                wv = want[i][0].astype(np.float64)
                wv = (wv / np.linalg.norm(wv)).astype(np.float32)
                assert got[i][1] == want[i][1], f"v{v}/{i}: tag"
                assert np.allclose(got[i][0], wv, atol=1e-6), f"v{v}/{i}: vector"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(ops=st.lists(st.one_of(_up_op, _del_op, _snap_op), min_size=2, max_size=6))
def test_cdc_replay_reconstructs_any_later_version(spark_session, ops):
    """CDC-replay law under ARBITRARY op sequences: for consecutive snapshot
    versions (and the first→last pair), applying ``changes(vi, vj)`` to a
    fresh handle opened at vi must reproduce EXACTLY the id→(vector, tag)
    state the Python model recorded when vj was taken — the replay twin of
    test_snapshots_replay_model_state, pinning that the feed misses no
    mutation kind in any interleaving (delete-then-reinsert, repeated
    relabels, no-op versions included)."""
    import itertools
    import shutil
    import tempfile

    spark = spark_session
    tmp = tempfile.mkdtemp(prefix="nvdb_prop_cdc_")
    try:
        c = VectorCollection.open(spark, DIM, f"{tmp}/col")
        model: dict[str, tuple] = {}
        snaps: dict[int, dict] = {}
        for kind, arg in [("snapshot", None)] + ops + [("snapshot", None)]:
            if kind == "upsert":
                rows = [(i, list(v), t) for i, (v, t) in arg.items()]
                c.upsert(
                    spark.createDataFrame(
                        rows, "`__id__` string, vector array<float>, tag string"
                    )
                )
                for i, (v, t) in arg.items():
                    model[i] = (np.asarray(v, dtype=np.float32), t)
            elif kind == "delete":
                c.delete(arg)
                for i in arg:
                    model.pop(i, None)
            else:
                snaps[c.save_snapshot()] = dict(model)
        versions = sorted(snaps)
        pairs = set(itertools.pairwise(versions)) | {(versions[0], versions[-1])}
        for vi, vj in pairs:
            if vi == vj:
                continue
            replica = VectorCollection.open_snapshot(spark, DIM, f"{tmp}/col", vi)
            replica.apply_changes(c.changes(vi, vj))
            got = {
                r["__id__"]: (np.asarray(r["vector"], dtype=np.float32), r["tag"])
                for r in replica.df.collect()
            }
            want = snaps[vj]
            assert set(got) == set(want), f"replay v{vi}->v{vj}: id sets differ"
            for i in want:
                wv = want[i][0].astype(np.float64)
                wv = (wv / np.linalg.norm(wv)).astype(np.float32)
                assert got[i][1] == want[i][1], f"replay v{vi}->v{vj}/{i}: tag"
                assert np.allclose(got[i][0], wv, atol=1e-6), (
                    f"replay v{vi}->v{vj}/{i}: vector"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    ops=st.lists(
        st.one_of(
            st.just(("save",)),
            st.tuples(st.just("delete"), st.integers(min_value=0, max_value=9)),
            st.tuples(st.just("expire"), st.integers(min_value=0, max_value=4)),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_snapshot_lifecycle_matches_model(spark_session, tmp_path_factory, ops):
    """Model-based snapshot lifecycle: ARBITRARY interleavings of
    save_snapshot / delete_snapshot / expire_snapshots must keep the
    manifest, the on-disk v* dirs, and open_snapshot reachability in
    lockstep with a trivial Python model. Pins the r08 retention fixes
    (path-boundary backing guard, orphan-aware version numbering) under
    sequences no hand-written test enumerates."""
    import json as _json
    import os as _os

    spark = spark_session
    path = str(tmp_path_factory.mktemp("prop_snap") / "col")
    c = VectorCollection.open(spark, DIM, path)
    c.upsert(
        spark.createDataFrame(
            [("a", [1.0, 0.0, 0.0, 0.0])], "`__id__` string, vector array<float>"
        )
    )
    model: list[int] = []  # live versions; backing handle = max (last saved)

    for op in ops:
        if op[0] == "save":
            v = c.save_snapshot()
            assert v == (max(model) + 1 if model else 1)
            model.append(v)
        elif op[0] == "delete":
            v = op[1]
            if v in model and v != max(model):
                c.delete_snapshot(v)
                model.remove(v)
            else:
                with pytest.raises(ValueError):
                    c.delete_snapshot(v)
        else:  # expire
            keep = op[1]
            dropped = c.expire_snapshots(keep_last=keep)
            doomed = model[: len(model) - keep] if keep else list(model)
            # the version backing the handle (the newest) is skipped,
            # never an error
            expect = [v for v in doomed if not model or v != max(model)]
            assert dropped == expect
            model = [v for v in model if v not in expect]

        # invariants after EVERY op: manifest == model == on-disk dirs,
        # and exactly the live versions reopen
        assert c.snapshots() == sorted(model)
        root = path + ".snapshots"
        on_disk = sorted(
            int(d[1:])
            for d in (_os.listdir(root) if _os.path.isdir(root) else [])
            if d.startswith("v") and d[1:].isdigit()
        )
        assert on_disk == sorted(model)
        if _os.path.isdir(root):
            with open(_os.path.join(root, "manifest.json")) as f:
                assert sorted(_json.load(f)["versions"]) == sorted(model)
        for v in model:
            assert VectorCollection.open_snapshot(spark, DIM, path, v).count() == 1
        gone = set(range(1, 10)) - set(model)
        for v in list(gone)[:2]:
            with pytest.raises(ValueError):
                VectorCollection.open_snapshot(spark, DIM, path, v)
