"""Property test: boolean-query set algebra on random corpora.

Random query TREES — Term/Prefix/Wildcard/Range leaves under
must/should/must_not/filter — evaluated over random small corpora and
checked against an independent set-algebra oracle (fnmatch for
wildcards, token-prefix scan for prefixes, numeric compare for ranges).
Pins the Lucene matching contract the engine implements
(BooleanQuery semantics, org.apache.lucene.search; _eval_bool in
query/segment.py): must ∩ filter ∩ (should-optional when positives
exist, else ∪ should) − ∪ must_not, and a boolean with no positive
clause matches NOTHING.
"""

import fnmatch
import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, PrefixQ, TermQ, WildcardQ
from meresco_lucene_ray.query.ast import BoolQ, RangeQ

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_term = st.sampled_from(_VOCAB).map(TermQ)
_prefix = st.tuples(st.sampled_from(_VOCAB), st.integers(1, 3)).map(
    lambda t: PrefixQ(t[0][: t[1]])
)


def _wild(t):
    w, i, star = t
    pat = w[:i] + "?" + w[i + 1 :]
    return WildcardQ(pat + "*" if star else pat)


_wildcard = st.tuples(
    st.sampled_from(_VOCAB), st.integers(0, 2), st.booleans()
).map(_wild)

_range = st.tuples(
    st.one_of(st.none(), st.integers(0, 16)),
    st.one_of(st.none(), st.integers(0, 16)),
    st.booleans(),
    st.booleans(),
).map(lambda t: RangeQ("prio", t[0], t[1], t[2], t[3]))

_leaf = st.one_of(_term, _prefix, _wildcard, _range)

_bool = st.builds(
    BoolQ,
    must=st.lists(_leaf, max_size=2).map(tuple),
    should=st.lists(_leaf, max_size=2).map(tuple),
    must_not=st.lists(_leaf, max_size=2).map(tuple),
    filter=st.lists(_leaf, max_size=1).map(tuple),
)

_CORPUS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
        st.integers(0, 16),
    ),
    min_size=1,
    max_size=15,
)


def _oracle(q, docs):
    """Set of doc indexes matching q (independent of the engine)."""
    if isinstance(q, TermQ):
        return {i for i, (toks, _) in enumerate(docs) if q.term in toks}
    if isinstance(q, PrefixQ):
        return {
            i
            for i, (toks, _) in enumerate(docs)
            if any(t.startswith(q.prefix) for t in toks)
        }
    if isinstance(q, WildcardQ):
        return {
            i
            for i, (toks, _) in enumerate(docs)
            if any(fnmatch.fnmatchcase(t, q.pattern) for t in toks)
        }
    if isinstance(q, RangeQ):
        out = set()
        for i, (_, v) in enumerate(docs):
            if q.lo is not None and (v < q.lo or (v == q.lo and not q.include_lo)):
                continue
            if q.hi is not None and (v > q.hi or (v == q.hi and not q.include_hi)):
                continue
            out.add(i)
        return out
    assert isinstance(q, BoolQ)
    if not (q.must or q.should or q.filter):
        return set()  # no positive clause → matches nothing (Lucene)
    mask = None
    for sub in list(q.must) + list(q.filter):
        m = _oracle(sub, docs)
        mask = m if mask is None else (mask & m)
    if mask is None:  # pure-should
        mask = set()
        for sub in q.should:
            mask |= _oracle(sub, docs)
    for sub in q.must_not:
        mask -= _oracle(sub, docs)
    return mask


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, queries=st.lists(_bool, min_size=1, max_size=6))
def test_random_boolean_trees_match_set_algebra(ray_session, corpus, queries):
    import ray.data as rd

    ids = [f"d{i:03d}" for i in range(len(corpus))]
    tbl = pa.table(
        {
            "__id__": pa.array(ids),
            "text": pa.array([" ".join(toks) for toks, _ in corpus]),
            "prio": pa.array([v for _, v in corpus], type=pa.int64()),
        }
    )
    d = f"/tmp/mlr_boolprop/{uuid.uuid4().hex}"
    cfg = IndexConfig(
        text_col="text", id_col="__id__", stored_cols=("prio",), num_shards=2
    )
    build_index(rd.from_arrow(tbl), d, cfg)
    with IndexSearcher(d, num_actors=2, num_cpus=0.25) as s:
        for q in queries:
            want = sorted(ids[i] for i in _oracle(q, corpus))
            res = s.execute(q, stop=len(corpus) + 1)
            assert sorted(res.ids()) == want, q
            assert res.total == len(want), q
            assert s.count(q) == len(want), q
