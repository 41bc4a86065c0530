"""Property test: the incremental lifecycle (S3/S4) on RANDOM op sequences.

The example-based incremental tests (test_incremental.py) pin one fixed
add/upsert/delete/merge script.  Hypothesis here drives a randomized
sequence of mutations — upsert batches (with in-batch duplicate ids),
delete-by-id (including ids never indexed), delete-by-query on a random
term — against a plain dict model, asserting after EVERY publish+refresh
that numDocs, per-term counts AND exact per-term docid sets match the
model, and that a final merge_index expunges tombstones without changing
any answer.  This is the reference's writer/NRT contract
(meresco/lucene/lucene.py addDocument/delete + commit semantics) under
adversarial interleavings rather than one script.
"""

import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import (
    add_documents,
    delete_by_query,
    delete_documents,
)
from meresco_lucene_ray.index.merge import merge_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
_IDS = [f"id{i}" for i in range(8)]

_doc = st.tuples(
    st.sampled_from(_IDS),
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=5).map(" ".join),
)

_op = st.one_of(
    st.tuples(st.just("upsert"), st.lists(_doc, min_size=1, max_size=4)),
    st.tuples(st.just("delete"), st.lists(st.sampled_from(_IDS), min_size=1, max_size=3)),
    st.tuples(st.just("delete_q"), st.sampled_from(_VOCAB)),
)

_SCRIPT = st.tuples(
    st.lists(_doc, min_size=1, max_size=6),  # initial build
    st.lists(_op, min_size=1, max_size=5),
)


def _tbl(rows):
    return pa.table(
        {"__id__": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )


def _apply_model(model, op):
    kind, arg = op
    if kind == "upsert":
        for i, t in arg:  # last write wins, like the tombstone chain
            model[i] = t
    elif kind == "delete":
        for i in arg:
            model.pop(i, None)
    else:  # delete_q
        for i in [i for i, t in model.items() if arg in t.split()]:
            del model[i]


def _check(searcher, model):
    assert searcher.count(MatchAllQ()) == len(model)
    for w in _VOCAB:
        want = sorted(i for i, t in model.items() if w in t.split())
        got = sorted(searcher.execute(TermQ(w), stop=50).ids())
        assert got == want, (w, got, want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=_SCRIPT)
def test_random_incremental_lifecycle(ray_session, script):
    import ray.data as rd

    initial, ops = script
    d = f"/tmp/mlr_incprop/{uuid.uuid4().hex}"
    cfg = IndexConfig(text_col="text", id_col="__id__", num_shards=2)

    model: dict[str, str] = {}
    for i, t in initial:
        model[i] = t
    # build_index ingests the raw batch; in-batch duplicate ids collapse
    # last-write-wins exactly like the upsert chain, so feed the deduped
    # table (the upsert path below exercises duplicates through tombstones).
    build_index(rd.from_arrow(_tbl(list(model.items()))), d, cfg)
    # fractional actor CPUs + explicit close(): the 4-cpu test session must
    # fit this searcher + the merger actor + the merged searcher, and a
    # failing example's pinned traceback must not leak reservations into
    # hypothesis' shrink runs (that deadlocks actor creation)
    with IndexSearcher(d, num_actors=2, num_cpus=0.25) as s:
        _check(s, model)

        for op in ops:
            kind, arg = op
            if kind == "upsert":
                # add_documents tombstones the new ids only against OLDER
                # segments (per-batch docid spaces, like Lucene's
                # updateDocument once per id); collapse in-batch duplicates
                # keep-last so the batch itself is id-unique, as the
                # reference's caller does.
                batch = list(dict(arg).items())
                add_documents(rd.from_arrow(_tbl(batch)), d, cfg)
            elif kind == "delete":
                delete_documents(d, arg)
            else:
                delete_by_query(d, TermQ(arg), searcher=s)  # reuse, no temp actor
            _apply_model(model, op)
            s.refresh()
            _check(s, model)

        # merge expunges tombstones without changing any answer
        out = f"{d}_merged"
        m = merge_index(d, out, max_merge_at_once=10, num_actors=1, num_cpus=0.25)
        assert m.num_docs == len(model)
        with IndexSearcher(out, num_actors=1, num_cpus=0.25) as s2:
            _check(s2, model)
