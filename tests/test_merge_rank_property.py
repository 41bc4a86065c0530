"""Property test: merge ≡ rebuild for FULL BM25 ranking (S5 + Q2).

The incremental lifecycle property (test_incremental_property.py) asserts
merge_index preserves per-term docid SETS; this suite asserts the stronger
score contract: after random deletions, a merged index ranks every query
IDENTICALLY (docids and float32-quantized scores) to an index freshly
rebuilt over only the surviving documents, and both match the brute-force
BM25 oracle.  That is Lucene's stats model — deleted docs pollute df /
sum_dl only until a merge expunges them (TieredMergePolicy semantics,
/root/reference/src/org/meresco/lucene/LuceneSettings.java:157-160); after
the merge the index must be statistically indistinguishable from one that
never contained the deleted docs.

Adversarial surface: 6-word vocabulary (colliding term stats), empty docs,
deleting every doc that contains some term (df → 0 groups in the merge
encoder), deleting ALL docs, single-doc segments, merge fan-ins that leave
multiple segments (max_merge_at_once=2) vs one (8).
"""

import shutil
import uuid

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import delete_documents
from meresco_lucene_ray.index.merge import merge_index
from meresco_lucene_ray.query import BoolQ, IndexSearcher, PhraseQ, TermQ
from meresco_lucene_ray.query.oracle import BruteForceIndex

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_CASE = st.tuples(
    st.lists(  # corpus: token lists, empty docs allowed
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10),
        min_size=1,
        max_size=16,
    ),
    st.data(),
)


def _sorted_hits(pairs):
    return sorted(pairs, key=lambda x: (-round(x[1], 9), x[0]))


def _engine_top(searcher, q, k):
    res = searcher.execute(q, stop=k)
    return _sorted_hits(
        zip(res.hits["__id__"].to_pylist(), res.hits["score"].to_pylist())
    )


def _assert_same(engine, other, ctx):
    other = _sorted_hits(other)
    assert [i for i, _ in engine] == [i for i, _ in other], (ctx, engine, other)
    for (_, s1), (_, s2) in zip(engine, other):
        assert s1 == pytest.approx(s2, abs=1e-9), (ctx, engine, other)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_CASE)
def test_merge_equals_rebuild_ranking(ray_session, case):
    import ray.data as rd

    docs, data = case
    ids = [f"d{i:03d}" for i in range(len(docs))]
    texts = [" ".join(d) for d in docs]
    del_ids = data.draw(
        st.lists(st.sampled_from(ids), max_size=len(ids), unique=True),
        label="deleted ids",
    )
    fan_in = data.draw(st.sampled_from([2, 8]), label="max_merge_at_once")

    survivors = [(i, t) for i, t in zip(ids, texts) if i not in set(del_ids)]
    root = f"/tmp/mlr_mergeprop/{uuid.uuid4().hex}"
    cfg = IndexConfig(
        text_col="content", id_col="__id__", num_shards=3, store_positions=True
    )
    try:
        build_index(
            rd.from_arrow(
                pa.table({"__id__": pa.array(ids), "content": pa.array(texts)})
            ),
            f"{root}/a",
            cfg,
        )
        if del_ids:
            delete_documents(f"{root}/a", del_ids)
        merged = merge_index(
            f"{root}/a", f"{root}/m", max_merge_at_once=fan_in,
            num_actors=1, num_cpus=0.25,
        )
        assert merged.num_docs == len(survivors)

        queries = [TermQ("alpha"), TermQ("zeta"),
                   BoolQ(should=(TermQ("beta"), TermQ("gamma"))),
                   BoolQ(must=(TermQ("delta"), TermQ("eps"))),
                   PhraseQ(["alpha", "beta"])]
        k = len(docs) + 1  # full ranking

        with IndexSearcher(f"{root}/m", num_actors=1, num_cpus=0.25) as sm:
            if not survivors:
                for q in queries:
                    assert sm.execute(q, stop=k).total == 0
                return
            oracle = BruteForceIndex(
                [i for i, _ in survivors], [t for _, t in survivors]
            )
            oracle_tops = [
                oracle.top_k_or(["alpha"], k),
                oracle.top_k_or(["zeta"], k),
                oracle.top_k_or(["beta", "gamma"], k),
                oracle.top_k_and(["delta", "eps"], k),
                oracle.top_k_phrase(["alpha", "beta"], k),
            ]
            merged_tops = [_engine_top(sm, q, k) for q in queries]
            for q, got, want in zip(queries, merged_tops, oracle_tops):
                _assert_same(got, want, ("merged vs oracle", q))

            # fresh rebuild over only the survivors: statistically
            # indistinguishable from the merged index
            build_index(
                rd.from_arrow(
                    pa.table(
                        {
                            "__id__": pa.array([i for i, _ in survivors]),
                            "content": pa.array([t for _, t in survivors]),
                        }
                    )
                ),
                f"{root}/b",
                cfg,
            )
            with IndexSearcher(f"{root}/b", num_actors=1, num_cpus=0.25) as sb:
                for q, got in zip(queries, merged_tops):
                    _assert_same(
                        _engine_top(sb, q, k), got, ("rebuild vs merged", q)
                    )
    finally:
        shutil.rmtree(root, ignore_errors=True)
