"""Property test: relational key-set algebra vs set semantics (J7).

test_relational_serialize.py pins fixed expressions through real searchers;
hypothesis here drives RANDOM expression trees (depth ≤ 3 over And/Or/Not
and multi-core leaves) against a transparent set-algebra oracle, using fake
cores whose ``collect_keys`` answers from dict key-sets.  This referees the
runner's own logic in isolation — in particular the two subtle paths:

  * the AND pushdown (first's bitset pre-filters second's scan via a
    KeyFilterQ-wrapped query) must be a pure optimization: result sets
    identical to unfiltered intersection (JoinAndQuery.java:32-139);
  * NOT's lazy inversion evaluates its inner WITHOUT pushdown and applies
    the enclosing filter afterwards (KeyBits.java:61-92) — `A AND NOT B`
    must equal A − B for every random A, B, including NOT over NOT.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.join import RelAnd, RelLeaf, RelNot, RelOr, RelationalRunner
from meresco_lucene_ray.join.bitsets import bitset_from_keys
from meresco_lucene_ray.query.ast import BoolQ, KeyFilterQ

KEY_SPACE = 48
_QUERIES = ["q0", "q1", "q2"]
_CORES = ["A", "B"]


class FakeCore:
    """collect_keys over dict key-sets, honoring the runner's
    KeyFilterQ-wrapped pushdown shape exactly like a real searcher."""

    def __init__(self, sets):
        self.sets = sets  # {query_token: set[int]}

    def collect_keys(self, q, collect_col, size):
        filt = None
        if isinstance(q, BoolQ):
            (inner,) = q.must
            (kf,) = q.filter
            assert isinstance(kf, KeyFilterQ)
            bits = ~kf.bitset if kf.inverted else kf.bitset
            filt = set(np.flatnonzero(bits).tolist())
            q = inner
        keys = self.sets[q]
        if filt is not None:
            keys = keys & filt
        return bitset_from_keys(np.array(sorted(keys), dtype=np.int64), size)


def _leaf():
    return st.tuples(st.sampled_from(_CORES), st.sampled_from(_QUERIES)).map(
        lambda cq: RelLeaf(core=cq[0], collect_key_col="k", filter_key_col="k", query=cq[1])
    )


_EXPR = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.tuples(children, children).map(lambda ab: RelAnd(*ab)),
        st.tuples(children, children).map(lambda ab: RelOr(*ab)),
        children.map(RelNot),
    ),
    max_leaves=6,
)


def _oracle(expr, models):
    universe = set(range(KEY_SPACE))
    if isinstance(expr, RelLeaf):
        return models[expr.core][expr.query]
    if isinstance(expr, RelAnd):
        return _oracle(expr.first, models) & _oracle(expr.second, models)
    if isinstance(expr, RelOr):
        return _oracle(expr.first, models) | _oracle(expr.second, models)
    return universe - _oracle(expr.inner, models)


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_runner_matches_set_algebra(data):
    models = {
        c: {
            q: set(
                data.draw(
                    st.lists(st.integers(0, KEY_SPACE - 1), max_size=20, unique=True),
                    label=f"{c}.{q}",
                )
            )
            for q in _QUERIES
        }
        for c in _CORES
    }
    expr = data.draw(_EXPR, label="expr")
    runner = RelationalRunner(
        {c: FakeCore(models[c]) for c in _CORES}, KEY_SPACE
    )
    got = set(np.flatnonzero(runner.execute(expr).materialize()).tolist())
    assert got == _oracle(expr, models), expr

    # an external filter distributes over the whole expression
    filt = set(
        data.draw(
            st.lists(st.integers(0, KEY_SPACE - 1), max_size=30, unique=True),
            label="filter",
        )
    )
    from meresco_lucene_ray.join.bitsets import KeyBits

    fb = KeyBits(bitset_from_keys(np.array(sorted(filt), dtype=np.int64), KEY_SPACE))
    got_f = set(
        np.flatnonzero(runner.execute(expr, filter_bits=fb).materialize()).tolist()
    )
    assert got_f == (_oracle(expr, models) & filt), expr
