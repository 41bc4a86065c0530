"""Mirrors /root/reference/test/lucenetest.py — the per-core ``Lucene``
component: update/commit lifecycle, query argument protocol, readonly
guards.  The reference tests mock the HTTP transport and assert the posted
JSON; ours run the same calls end-to-end against a real index."""

import pytest

from meresco_lucene_ray.docwire import add_string_fields, add_text_fields
from meresco_lucene_ray.lucene import Lucene
from meresco_lucene_ray.query.ast import MatchAllQ, TermQ
from meresco_lucene_ray.settings import LuceneSettings


def make_core(tmp_path, ray_session, **kw):
    kw.setdefault("stored_cols", ("tag",))
    kw.setdefault("num_actors", 1)
    return Lucene(str(tmp_path / "core-idx"), name="coreA", **kw)


def add_doc(core, ident, text, tag="t"):
    fields = []
    add_text_fields(fields, ("",), 0, "content", text)
    add_string_fields(fields, ("",), 0, "tag", tag)
    core.add_document(fields, identifier=ident)


def test_add_commit_query(tmp_path, ray_session):  # testAdd + testExecuteQuery
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "alpha beta")
    add_doc(core, "id:1", "beta gamma")
    core.commit()
    res = core.execute_query({"type": "TermQuery", "term": {"field": "content", "value": "beta"}})
    assert res.total == 2
    assert sorted(res.ids()) == ["id:0", "id:1"]
    assert res.info["type"] == "Query"
    assert res.info["query"]["stop"] == 10
    # engine AST accepted directly too
    assert core.execute_query(TermQ("alpha")).total == 1


def test_add_without_identifier(tmp_path, ray_session):  # testAddWithoutIdentifier
    core = make_core(tmp_path, ray_session)
    with pytest.raises(ValueError):
        core.add_document([], identifier=None)


def test_delete(tmp_path, ray_session):  # testDelete
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "alpha beta")
    add_doc(core, "id:1", "beta gamma")
    core.commit()
    core.delete(identifier="id:0")
    core.commit()
    assert core.execute_query(MatchAllQ()).total == 1


def test_delete_by_query(tmp_path, ray_session):  # testDeleteByQuery
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "alpha beta")
    add_doc(core, "id:1", "beta gamma")
    add_doc(core, "id:2", "delta")
    core.commit()
    core.delete(lucene_query={"type": "TermQuery", "term": {"field": "content", "value": "beta"}})
    assert core.execute_query(MatchAllQ()).total == 1
    with pytest.raises(ValueError, match="specifify"):
        core.delete()  # neither identifier nor query — reference's message


def test_commit_count_autocommits(tmp_path, ray_session):  # commitCount policy
    core = make_core(tmp_path, ray_session, settings=LuceneSettings(commit_count=2))
    add_doc(core, "id:0", "alpha")
    add_doc(core, "id:1", "beta")  # second buffered update triggers commit
    assert core.num_docs() == 2


def test_prefix_search_and_fieldnames(tmp_path, ray_session):  # testPrefixSearch/-Fieldnames
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "alpha alps beta")
    core.commit()
    res = core.prefix_search("content", "al")
    assert res.hits == ["alpha", "alps"]
    res = core.prefix_search("content", "al", show_count=True)
    assert res.hits == [("alpha", 1), ("alps", 1)]
    names = core.fieldnames()
    assert names.total == len(names.hits) > 0


def test_num_docs(tmp_path, ray_session):  # testNumDocs
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "x")
    core.commit()
    assert core.num_docs() == 1
    assert core.core_info() == {"name": "coreA", "numDocs": 1}


def test_sort_keys_use_registry_missing_values(tmp_path, ray_session):
    from meresco_lucene_ray.fieldregistry import FieldRegistry

    settings = LuceneSettings(field_registry=FieldRegistry())
    core = make_core(tmp_path, ray_session, settings=settings)
    add_doc(core, "id:0", "alpha", tag="b")
    add_doc(core, "id:1", "alpha", tag="a")
    core.commit()
    res = core.execute_query(
        TermQ("alpha"), sort_keys=[{"sortBy": "tag", "sortDescending": False}]
    )
    assert res.ids() == ["id:1", "id:0"]
    sk = core.update_sort_key({"sortBy": "tag", "sortDescending": False})
    assert sk["missingValue"] == "STRING_LAST"  # registry default for strings


def test_update_settings(tmp_path, ray_session):  # testUpdateSettings / setSettings
    core = make_core(tmp_path, ray_session)
    assert core.get_settings()["commitCount"] == 100000
    core.set_settings(similarity=dict(k1=1.2, b=0.3))
    assert core.settings.similarity == {"type": "BM25Similarity", "k1": 1.2, "b": 0.3}
    core.set_settings(clustering={"strategies": [{"clusteringEps": 0.4}]})
    assert core.settings.cluster_config is not None


def test_similar_documents(tmp_path, ray_session):  # testSimilarDocs
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "alpha beta gamma")
    add_doc(core, "id:1", "alpha beta delta")
    add_doc(core, "id:2", "omega psi")
    core.commit()
    res = core.similar_documents("id:0", text="alpha beta gamma")
    assert res.ids()[0] == "id:1"  # most similar, self excluded


def test_readonly_guards(tmp_path, ray_session):  # testLuceneReadonly
    core = make_core(tmp_path, ray_session)
    add_doc(core, "id:0", "x")
    core.commit()
    ro = Lucene(str(tmp_path / "core-idx"), name="coreA", readonly=True, num_actors=1)
    assert ro.execute_query(MatchAllQ()).total == 1
    with pytest.raises(RuntimeError, match="Adding documents not allowed"):
        ro.add_document([], identifier="id:9")
    with pytest.raises(RuntimeError, match="Deleting not allowed"):
        ro.delete(identifier="id:0")
    with pytest.raises(RuntimeError, match="Changing settings not allowed"):
        ro.set_settings(similarity=dict(k1=1.0, b=0.5))


def test_facets_with_max_terms(tmp_path, ray_session):
    core = make_core(tmp_path, ray_session)
    for i, tag in enumerate(["a", "a", "b", "c"]):
        add_doc(core, f"id:{i}", "common text", tag=tag)
    core.commit()
    res = core.execute_query(
        MatchAllQ(), facets=[{"fieldname": "tag", "maxTerms": 2}]
    )
    assert res.drilldown_data["tag"] == {"a": 2, "b": 1}


def test_multi_lucene_routing_and_composed(tmp_path, ray_session):
    # multilucenetest.py: route single-core calls, execute a composed join
    from meresco_lucene_ray.join import ComposedQuery
    from meresco_lucene_ray.lucene import MultiLucene

    core_a = Lucene(
        str(tmp_path / "A"), name="coreA", stored_cols=("key",), num_actors=1
    )
    core_b = Lucene(
        str(tmp_path / "B"), name="coreB", stored_cols=("key",), num_actors=1
    )
    for ident, text, key in [("a:0", "alpha", 1), ("a:1", "beta", 2), ("a:2", "alpha beta", 3)]:
        fields = [{"type": "KeyField", "name": "key", "value": key}]
        add_text_fields(fields, ("",), 0, "content", text)
        core_a.add_document(fields, identifier=ident)
    core_a.commit()
    for ident, text, key in [("b:0", "filter", 2), ("b:1", "filter", 3), ("b:2", "other", 1)]:
        fields = [{"type": "KeyField", "name": "key", "value": key}]
        add_text_fields(fields, ("",), 0, "content", text)
        core_b.add_document(fields, identifier=ident)
    core_b.commit()

    ml = MultiLucene([core_a, core_b], default_core="coreA", key_space=16)
    # single-core routing (default + explicit)
    assert ml.execute_query(lucene_query=TermQ("alpha")).total == 2
    assert ml.execute_query(core="coreB", lucene_query=TermQ("filter")).total == 2
    assert ml.prefix_search(prefix="al", fieldname="content").hits == ["alpha"]
    assert {c["name"] for c in ml.core_info()} == {"coreA", "coreB"}

    # composed: A docs whose key matches B docs matching 'filter' (keys 2,3)
    cq = ComposedQuery(result_core="coreA", stop=10)
    cq.set_core_query("coreA", MatchAllQ())
    cq.set_core_query("coreB", TermQ("filter"))
    cq.add_match(dict(core="coreA", uniqueKey="key"), dict(core="coreB", key="key"))
    cq.validate()
    res = ml.execute_composed_query(cq)
    assert sorted(res.ids()) == ["a:1", "a:2"]
    assert res.info["type"] == "ComposedQuery"
