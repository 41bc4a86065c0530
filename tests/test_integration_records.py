"""F4-style integration fixture: records with the reference's field-name
conventions flow through SchemaPolicy into a real index, then exercise the
behaviors test/_integration/lucenetest.py asserts (totals, sorts, ranges,
dedup groups, key joins)."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.query import (
    BoolQ,
    DocValEqQ,
    IndexSearcher,
    MatchAllQ,
    RangeQ,
    TermQ,
)
from meresco_lucene_ray.schema import FieldDef, Role, SchemaPolicy

N = 50


def _records() -> pa.Table:
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "__id__": [f"main2:record:{i}" for i in range(N)],
            "field3": [
                " ".join(f"tok{rng.integers(0, 30)}" for _ in range(10)) for _ in range(N)
            ],
            "untokenized.field2": [f"value{i % 10}" for i in range(N)],
            "sorted.intfield1": pa.array([1000 + i for i in range(N)], type=pa.int64()),
            "__key__.field": pa.array([i % 7 for i in range(N)], type=pa.int64()),
            "groupfield": [str(i % 5) for i in range(N)],
        }
    )


@pytest.fixture(scope="module")
def records_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = _records()
    policy = SchemaPolicy()
    policy.register("groupfield", FieldDef(Role.KEYWORD))  # FieldRegistry.register analog
    cfg = policy.to_index_config(t.column_names, num_shards=2)
    assert cfg.text_col == "field3"
    assert policy.resolve("__key__.field").role is Role.KEY
    d = str(tmp_path_factory.mktemp("records"))
    build_index(rd.from_arrow(t), d, cfg)
    return IndexSearcher(d, num_actors=1), t


def test_keyword_and_range(records_index):
    s, t = records_index
    assert s.count(DocValEqQ("untokenized.field2", "value3")) == 5
    got = s.execute(
        BoolQ(filter=(RangeQ("sorted.intfield1", 1010, 1020, True, False),), must=(MatchAllQ(),)),
        stop=100,
    )
    assert got.total == 10


def test_sort_with_docvalues(records_index):
    s, t = records_index
    res = s.execute(MatchAllQ(), stop=5, sort=[("sorted.intfield1", True, None)])
    vals = res.hits["sorted.intfield1"].to_pylist()
    assert vals == sorted(t["sorted.intfield1"].to_pylist(), reverse=True)[:5]


def test_dedup_by_groupfield(records_index):
    s, t = records_index
    res = s.execute(
        MatchAllQ(), stop=100, dedup_field="groupfield", dedup_sort_field="sorted.intfield1"
    )
    assert res.total == 5
    assert res.total_with_duplicates == N
    counts = dict(
        zip(res.hits["groupfield"].to_pylist(), res.hits["duplicateCount"].to_pylist())
    )
    assert all(c == 10 for c in counts.values())
    # representative = max sorted.intfield1 within each group
    reps = dict(
        zip(res.hits["groupfield"].to_pylist(), res.hits["sorted.intfield1"].to_pylist())
    )
    for g, v in reps.items():
        member_vals = [
            t["sorted.intfield1"][i].as_py() for i in range(N) if t["groupfield"][i].as_py() == g
        ]
        assert v == max(member_vals)


def test_key_collection(records_index):
    s, t = records_index
    bits = s.collect_keys(DocValEqQ("untokenized.field2", "value3"), "__key__.field", 7)
    want = {t["__key__.field"][i].as_py() for i in range(N) if i % 10 == 3}
    assert set(np.flatnonzero(bits).tolist()) == want


def test_gate_hygiene():
    """Every oracle key has a query; rows-only entries are the documented set."""
    import __ray_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "media_features",
        "cluster_topdocs",
    }
    assert len(oracles) >= 32
