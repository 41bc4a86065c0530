"""Bipartite PageRank — mirrors
/root/reference/test/org/meresco/lucene/PageRankTest.java testDocRanks:
the exact double values after 1 and 2 iterations, and the zero-iteration
initial ranks, including the zero-edge doc (id 20)."""

from meresco_lucene_ray.cluster import _pagerank_bipartite

VECTORS = [
    (50, {0: 0.3, 2: 0.4}),
    (30, {0: 0.2, 1: 0.4}),
    (60, {0: 0.3, 1: 0.4, 2: 0.4, 4: 0.1}),
    (20, {}),  # all-zero docvector: a node with no edges
    (10, {0: 0.2, 1: 1.0, 2: 2.0, 3: 0.4}),
]


def test_initial_ranks():
    docs, terms = _pagerank_bipartite(VECTORS, iterations=0)
    P = 1.0 / 10  # 5 docs + 5 terms
    assert [d for d, _ in docs] == [50, 30, 60, 20, 10]  # stable on ties
    assert all(pr == P for _, pr in docs)
    assert [o for o, _ in terms] == [0, 1, 2, 3, 4]
    assert all(pr == P for _, pr in terms)


def test_one_iteration_exact():
    docs, terms = _pagerank_bipartite(VECTORS, iterations=1)
    assert [d for d, _ in docs] == [10, 60, 50, 30, 20]
    assert [pr for _, pr in docs] == [
        0.27325000000000005,
        0.1875416666666667,
        0.16770833333333335,
        0.16558333333333336,
        0.15000000000000002,
    ]
    assert [o for o, _ in terms] == [2, 1, 0, 3, 4]
    assert [pr for _, pr in terms] == [
        0.21800000000000003,
        0.19675000000000004,
        0.181875,
        0.15850000000000003,
        0.152125,
    ]


def test_two_iterations_exact():
    docs, terms = _pagerank_bipartite(VECTORS, iterations=2)
    assert [d for d, _ in docs] == [10, 60, 50, 30, 20]
    assert [pr for _, pr in docs] == [
        0.3908988541666667,
        0.22153015625000003,
        0.1863011979166667,
        0.18002802083333336,
        0.15000000000000002,
    ]
    assert [o for o, _ in terms] == [2, 1, 0, 3, 4]
    assert [pr for _, pr in terms] == [
        0.31058270833333335,
        0.25215583333333336,
        0.20902630208333337,
        0.17322625000000003,
        0.15398526041666669,
    ]


def test_zero_weight_entries_create_no_nodes():
    # explicit 0.0 entries behave exactly like absent ones (PageRank.add
    # only links docvector[ord] > 0.0)
    with_zeros = [(50, {0: 0.3, 1: 0.0, 2: 0.4}), (30, {0: 0.2, 1: 0.4})]
    without = [(50, {0: 0.3, 2: 0.4}), (30, {0: 0.2, 1: 0.4})]
    assert _pagerank_bipartite(with_zeros) == _pagerank_bipartite(without)
