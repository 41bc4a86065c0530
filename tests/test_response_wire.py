"""Mirrors /root/reference/test/org/meresco/lucene/LuceneResponseToJsonTest.java
and test/luceneresponsetest.py — response JSON wire format."""

import json

import pyarrow as pa

from meresco_lucene_ray.cluster import ClusterHit, DocScore, TermScore
from meresco_lucene_ray.query.engine import SearchResult
from meresco_lucene_ray.query.response_wire import response_from_wire, response_to_wire


def _result(**kw):
    base = dict(
        total=2,
        hits=pa.table(
            {"__id__": ["id1", "id2"], "score": [0.1, 0.2]}
        ),
    )
    base.update(kw)
    return SearchResult(**base)


def test_basic_response():  # LuceneResponseToJsonTest.test
    res = _result(
        drilldown_data={"field": {"value1": 1, "value2": 5, "value2>subValue2": 1}},
        suggestions={"valeu": [("value", 10, 1)]},
    )
    wire = response_to_wire(res, core="core", times={"facetTime": 12})
    assert wire["total"] == 2
    assert wire["queryTime"] == 0
    assert wire["hits"][0] == {"id": "id1", "score": 0.1}
    assert wire["hits"][1] == {"id": "id2", "score": 0.2}

    dd = wire["drilldownData"]
    assert len(dd) == 1
    assert dd[0]["fieldname"] == "field"
    assert dd[0]["core"] == "core"
    assert dd[0]["path"] == []
    terms = dd[0]["terms"]
    assert terms[0] == {"term": "value1", "count": 1}
    assert "subterms" not in terms[0]
    assert terms[1]["term"] == "value2" and terms[1]["count"] == 5
    assert terms[1]["subterms"] == [{"term": "subValue2", "count": 1}]

    assert wire["times"] == {"facetTime": 12}
    assert wire["suggestions"] == {"valeu": ["value"]}


def test_dedup():  # testDedup
    res = SearchResult(
        total=2,
        hits=pa.table(
            {
                "__id__": ["id1", "id2"],
                "score": [0.1, 0.2],
                "duplicateCount": [2, 5],
                "__key__": ["a", "b"],
            }
        ),
        total_with_duplicates=5,
    )
    wire = response_to_wire(res, dedup_field="__key__")
    assert wire["totalWithDuplicates"] == 5
    assert wire["hits"][0]["duplicateCount"] == {"__key__": 2}
    assert wire["hits"][1]["duplicateCount"] == {"__key__": 5}
    # the group-key column is not a stored field on the wire
    assert "__key__" not in wire["hits"][0]


def test_clustering():  # testClustering
    res = SearchResult(
        total=2,
        hits=pa.table({"__id__": [], "score": []}),
        cluster_hits=[
            ClusterHit(
                id="id1",
                score=0.1,
                top_docs=[DocScore("id1", 0.1), DocScore("id2", 0.2)],
                top_terms=[TermScore("term1", 0), TermScore("term2", 1)],
            )
        ],
    )
    wire = response_to_wire(res)
    hits = wire["hits"]
    assert len(hits) == 1
    dup = hits[0]["duplicates"]
    assert dup["topDocs"] == [
        {"id": "id1", "score": 0.1}, {"id": "id2", "score": 0.2},
    ]
    assert dup["topTerms"] == [
        {"term": "term1", "score": 0.0}, {"term": "term2", "score": 1.0},
    ]


def test_hit_without_id():  # testHitWithoutId
    res = SearchResult(
        total=1, hits=pa.table({"__id__": pa.array([None], pa.string()), "score": [0.1]})
    )
    wire = response_to_wire(res)
    assert wire["hits"][0]["id"] is None


def test_stored_fields():  # testStoredFields
    res = SearchResult(
        total=1,
        hits=pa.table(
            {
                "__id__": ["id:1"],
                "score": [1.0],
                "aField": ["aValue"],
                "intField": pa.array([10], pa.int64()),
            }
        ),
    )
    wire = response_to_wire(res)
    hit = wire["hits"][0]
    assert hit["id"] == "id:1"
    assert hit["aField"] == ["aValue"]  # stored fields are arrays
    assert hit["intField"] == [10]


def test_json_round_trip():  # luceneresponsetest.testJson
    res = _result(
        drilldown_data={"field": {"a": 2, "a>b": 1}},
        total_with_duplicates=7,
        suggestions={"w": [("word", 3, 1)]},
    )
    s = json.dumps(response_to_wire(res))
    back = response_from_wire(s)
    assert back.total == 2
    assert back.hits["__id__"].to_pylist() == ["id1", "id2"]
    assert back.hits["score"].to_pylist() == [0.1, 0.2]
    assert back.drilldown_data == {"field": {"a": 2, "a>b": 1}}
    assert back.total_with_duplicates == 7
    assert back.suggestions == {"w": ["word"]}
