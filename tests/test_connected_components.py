"""connected_components: distributed min-label propagation over near-dup
pairs — the pairs→groups step that finishes the dedup family.

Oracle: a driver-side union-find over the same edge list (exact, any graph).
"""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.functions.dedup import connected_components


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(int(a))] = find(int(b))
    members = {}
    for x in list(parent):
        members.setdefault(find(x), []).append(x)
    return {x: min(m) for m in members.values() for x in m}


def _run(edges, **kw):
    import ray.data as rd

    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "id_b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    out = connected_components(rd.from_arrow(t), **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["component"].astype(int)))


def test_triangle_pair_and_isolated_edge(ray_session):
    got = _run([(20, 21), (21, 22), (20, 22), (30, 31), (5, 6)])
    assert got == {20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 5: 5, 6: 5}


def test_long_chain_converges_over_many_iterations(ray_session):
    # a path graph is the worst case for min-label propagation: the label
    # crawls one hop per iteration (diameter iterations to fixpoint)
    n = 12
    got = _run([(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_chain_reversed_ids_propagates_min_upward(ray_session):
    got = _run([(i + 1, i) for i in range(8)])
    assert got == {i: 0 for i in range(9)}


def test_duplicate_and_reversed_pairs_are_deduped(ray_session):
    got = _run([(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_union_find_on_random_graph(ray_session):
    rng = np.random.default_rng(3)
    e = rng.integers(0, 200, size=(300, 2))
    e = [(int(a), int(b)) for a, b in e if a != b]
    assert _run(e) == _union_find_components(e)


def test_matches_union_find_on_sparse_graph_with_big_ids(ray_session):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 2**40, size=60, dtype=np.int64)
    e = [(int(base[i]), int(base[(i * 7 + 1) % 60])) for i in range(60)]
    e = [(a, b) for a, b in e if a != b]
    assert _run(e) == _union_find_components(e)


def test_max_iters_guard(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        _run([(i, i + 1) for i in range(10)], max_iters=2)


def test_dedup_keep_canonical_filters_non_canonical(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.dedup import dedup_keep_canonical

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
            "text": [f"d{i}" for i in range(6)],
        }
    )
    comp = pa.table(
        {
            "node": pa.array([1, 2, 4, 5], type=pa.int64()),
            "component": pa.array([1, 1, 4, 4], type=pa.int64()),
        }
    )
    out = dedup_keep_canonical(rd.from_arrow(docs), rd.from_arrow(comp)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3, 4]
    assert set(out.columns) == {"doc_id", "text"}


def test_dedup_keep_canonical_no_duplicates_passthrough(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.dedup import dedup_keep_canonical

    docs = pa.table({"doc_id": pa.array([7, 8], type=pa.int64()), "text": ["a", "b"]})
    comp = pa.table(
        {"node": pa.array([], type=pa.int64()), "component": pa.array([], type=pa.int64())}
    )
    out = dedup_keep_canonical(rd.from_arrow(docs), rd.from_arrow(comp)).to_pandas()
    assert sorted(out["doc_id"]) == [7, 8]


def test_connected_components_empty_pairs(ray_session):
    import ray.data as rd

    empty = pa.table(
        {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
    )
    out = connected_components(rd.from_arrow(empty))
    assert out.count() == 0


def test_driver_gate_and_distributed_path_agree(ray_session, monkeypatch):
    """The small-edge driver gate (numpy label propagation) and the
    distributed rounds produce identical (node, component) maps — both are
    pinned against the union-find oracle on a random graph."""
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, size=(200, 2)) if a != b]
    want = _union_find_components(edges)

    monkeypatch.setenv("MLR_CC_DRIVER_MAX", "1000000")
    assert _run(edges) == want
    monkeypatch.setenv("MLR_CC_DRIVER_MAX", "0")  # force the distributed rounds
    assert _run(edges) == want


def test_keep_canonical_broadcast_and_join_paths_agree(ray_session, monkeypatch):
    import ray.data as rd

    from meresco_lucene_ray.functions.dedup import dedup_keep_canonical

    comp = pa.table(
        {
            "node": pa.array([1, 2, 3, 7, 9], type=pa.int64()),
            "component": pa.array([1, 1, 1, 7, 7], type=pa.int64()),
        }
    )
    corpus = pa.table(
        {
            "doc_id": pa.array(list(range(12)), type=pa.int64()),
            "text": [f"t{i}" for i in range(12)],
        }
    )
    want = sorted(set(range(12)) - {2, 3, 9})

    def kept(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = dedup_keep_canonical(
            rd.from_arrow(corpus), rd.from_arrow(comp), id_col="doc_id"
        ).to_pandas()
        return sorted(out["doc_id"].astype(int))

    assert kept({"MLR_DEDUP_BROADCAST_MAX": "1000000"}) == want
    assert kept({"MLR_DEDUP_BROADCAST_MAX": "0"}) == want
