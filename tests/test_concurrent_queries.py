"""Concurrent clients over ONE IndexSearcher (the bench drives 32 threads
through the engine): mixed query shapes — plain, sorted, faceted, dedup,
fused dedup+facets, composed filters — must return exactly what sequential
execution returns; the collector LRU and diagnostic fields are the only
shared driver state and must not corrupt results."""

from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ
from meresco_lucene_ray.query.ast import BoolQ, Occur, RangeQ


@pytest.fixture(scope="module")
def conc_searcher(ray_session, tmp_path_factory):
    import ray.data as rd

    n = 300
    rows = {
        "__id__": [f"d{i:04d}" for i in range(n)],
        "text": ["common " + ("hit " * (1 + (i * 7) % 6)) for i in range(n)],
        "grp": pa.array([f"k{i % 30:02d}" for i in range(n)]),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(n)]),
        "prio": pa.array([(i * 3) % 17 for i in range(n)], type=pa.int64()),
    }
    d = str(tmp_path_factory.mktemp("conc") / "idx")
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("grp", "lang", "prio"), num_shards=4
    )
    build_index(rd.from_arrow(pa.table(rows)), d, cfg)
    return IndexSearcher(d, num_actors=2, num_cpus=0.25)


def _snapshot(res):
    t = res.hits
    return (
        res.total,
        res.total_with_duplicates,
        tuple(sorted(t.column_names)),
        tuple(tuple(t[c].to_pylist()) for c in sorted(t.column_names)),
        None if not res.drilldown_data else {
            k: tuple(sorted(v.items(), key=lambda kv: (str(kv[0]),)))
            for k, v in res.drilldown_data.items()
        },
    )


def test_concurrent_queries_match_sequential(conc_searcher):
    s = conc_searcher
    tasks = [
        lambda: s.execute(TermQ("hit"), stop=10),
        lambda: s.execute(TermQ("hit"), stop=10, sort=[("prio", True, None)],
                          stored_fields=("prio",)),
        lambda: s.execute(TermQ("common"), stop=0, facets=["lang"]),
        lambda: s.execute(TermQ("hit"), stop=8, dedup_field="grp",
                          dedup_sort_field="prio"),
        lambda: s.execute(TermQ("hit"), stop=8, dedup_field="grp",
                          dedup_sort_field="prio", facets=["lang"]),
        lambda: s.execute(
            BoolQ(must=(TermQ("hit"),), filter=(RangeQ("prio", lo=5, hi=None,
                                                       include_lo=True, include_hi=True),)),
            stop=10, stored_fields=("prio",),
        ),
        lambda: s.execute(MatchAllQ(), stop=5, sort=[("prio", False, None)],
                          stored_fields=("prio",)),
    ]
    expected = [_snapshot(f()) for f in tasks]
    work = [tasks[i % len(tasks)] for i in range(84)]
    with ThreadPoolExecutor(max_workers=12) as ex:
        got = list(ex.map(lambda f: _snapshot(f()), work))
    for i, snap in enumerate(got):
        assert snap == expected[i % len(tasks)], f"task {i % len(tasks)} diverged"


def test_collector_lru_eviction_under_threads(conc_searcher):
    """The 50-entry collector/stats LRU evicts with pop(key, None): many
    distinct cached computations from concurrent threads must never raise
    even when two threads race the same eviction key."""
    s = conc_searcher
    size = 40

    def one(i):
        bs = s.collect_keys(TermQ(f"word{i}" if i % 3 else "hit"), "prio", size)
        return int(bs.sum())

    with ThreadPoolExecutor(max_workers=10) as ex:
        got = list(ex.map(one, range(120)))
    assert len(got) == 120
