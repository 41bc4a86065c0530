"""Property test: top-k by sort fields + missing sentinels vs DuckDB (Q5/Q6).

The fixed oracle entry (sort_n_chars) exercises one sort spec over non-null
values; hypothesis here drives random NULLABLE int and string sort columns
with heavy ties, random 1–2-key sort specs (each direction × missing-value
policy), and random page windows, asserting:

  * the engine's FULL ordering matches DuckDB's ORDER BY under the engine's
    documented missing-value fills (numeric null → +inf or the given value;
    string null → "" or str(value) — segment.py:_sortable and
    engine.py:_sort_key_columns, mirroring fieldregistry.py:168-236), as
    the sequence of sort-key tuples, with id-set equality inside every tie
    group (the docid tiebreak is engine-internal, so ids inside a tie group
    are set-compared, not sequence-compared);
  * any page (start, stop) equals the same slice of the full ranking — the
    per-segment cut at k=stop must agree with the global merge (TopDocs
    truncation consistency).
"""

import math
import shutil
import uuid

import duckdb
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ, TermQ

_VOCAB = ["alpha", "beta", "gamma"]
_STRINGS = ["aa", "ab", "b", "ca"]

_DOC = st.tuples(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=4),
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    st.one_of(st.none(), st.sampled_from(_STRINGS)),
)

_SPEC_N = st.tuples(
    st.just("n"), st.booleans(), st.one_of(st.none(), st.just(2))
)
_SPEC_S = st.tuples(
    st.just("s"), st.booleans(), st.one_of(st.none(), st.just("ab"))
)

_CASE = st.tuples(
    st.lists(_DOC, min_size=1, max_size=18),
    st.lists(st.one_of(_SPEC_N, _SPEC_S), min_size=1, max_size=2, unique_by=lambda s: s[0]),
    st.booleans(),  # True → TermQ("alpha"), False → MatchAll
    st.tuples(st.integers(0, 6), st.integers(1, 8)),  # page (start, length)
)


def _fill(col, value, missing):
    if value is not None:
        return float(value) if col == "n" else str(value)
    if col == "n":
        return math.inf if missing is None else float(missing)
    return "" if missing is None else str(missing)


def _sql_order(spec):
    exprs = []
    for c, desc, missing in spec:
        if c == "n":
            fill = "CAST('infinity' AS DOUBLE)" if missing is None else str(float(missing))
            e = f"COALESCE(CAST(n AS DOUBLE), {fill})"
        else:
            fill = "''" if missing is None else f"'{missing}'"
            e = f"COALESCE(s, {fill})"
        exprs.append(e + (" DESC" if desc else " ASC"))
    return ", ".join(exprs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_CASE)
def test_sort_and_paging_vs_duckdb(ray_session, case):
    import ray.data as rd

    docs, spec, use_term, (start, length) = case
    ids = [f"d{i:03d}" for i in range(len(docs))]
    tbl = pa.table(
        {
            "__id__": pa.array(ids),
            "content": pa.array([" ".join(t) for t, _, _ in docs]),
            "n": pa.array([n for _, n, _ in docs], type=pa.int64()),
            "s": pa.array([s for _, _, s in docs], type=pa.string()),
        }
    )
    idx = f"/tmp/mlr_sortprop/{uuid.uuid4().hex}"
    try:
        build_index(
            rd.from_arrow(tbl),
            idx,
            IndexConfig(
                text_col="content", id_col="__id__",
                stored_cols=("n", "s"), num_shards=3,
            ),
        )
        q = TermQ("alpha") if use_term else MatchAllQ()
        with IndexSearcher(idx, num_actors=2, num_cpus=0.25) as searcher:
            full = searcher.execute(
                q, stop=len(docs) + 1, sort=list(spec), stored_fields=("n", "s")
            ).hits

            con = duckdb.connect()
            con.register("docs", tbl)
            where = "WHERE content LIKE '%alpha%'" if use_term else ""
            want = con.execute(
                f"SELECT __id__, n, s FROM docs {where} ORDER BY {_sql_order(spec)}, __id__"
            ).arrow()
            con.close()

            def keys(t):
                return [
                    tuple(
                        _fill(c, t[c][i].as_py(), missing)
                        for c, _, missing in spec
                    )
                    for i in range(t.num_rows)
                ]

            got_keys, want_keys = keys(full), keys(want)
            assert got_keys == want_keys, (spec, got_keys, want_keys)
            # id sets must agree inside every tie group
            got_ids, want_ids = full["__id__"].to_pylist(), want["__id__"].to_pylist()
            grp_got, grp_want, prev = set(), set(), None
            for k, gi, wi in zip(got_keys + [None], got_ids + [""], want_ids + [""]):
                if k != prev:
                    assert grp_got == grp_want, (spec, prev, grp_got, grp_want)
                    grp_got, grp_want, prev = set(), set(), k
                grp_got.add(gi)
                grp_want.add(wi)

            # paging: any window equals the slice of the full ranking
            page = searcher.execute(
                q, start=start, stop=start + length, sort=list(spec)
            ).hits
            assert (
                page["__id__"].to_pylist()
                == got_ids[start : start + length]
            ), (spec, start, length)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
