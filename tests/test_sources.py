"""Corpus source readers: format detection, projection, metadata hygiene,
and an end-to-end JSONL → index build."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meresco_lucene_ray.sources import read_corpus

ROWS = [
    {"doc_id": 0, "text": "alpha beta", "lang": "en"},
    {"doc_id": 1, "text": "beta gamma", "lang": "nl"},
    {"doc_id": 2, "text": "gamma delta", "lang": "en"},
]


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    df = pd.DataFrame(ROWS)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp / "docs.parquet")
    with open(tmp / "docs.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    df.to_csv(tmp / "docs.csv", index=False)
    df.to_csv(tmp / "docs.tsv", index=False, sep="\t")
    return tmp


def _sorted_rows(ds, cols=("doc_id", "text", "lang")):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df[list(cols)].to_dict("records")


def test_parquet_auto(corpus_files, ray_session):
    ds = read_corpus(str(corpus_files / "docs.parquet"))
    assert _sorted_rows(ds) == ROWS


def test_jsonl_auto(corpus_files, ray_session):
    ds = read_corpus(str(corpus_files / "docs.jsonl"))
    assert _sorted_rows(ds) == ROWS


def test_csv_and_tsv(corpus_files, ray_session):
    assert _sorted_rows(read_corpus(str(corpus_files / "docs.csv"))) == ROWS
    assert _sorted_rows(read_corpus(str(corpus_files / "docs.tsv"), format="tsv")) == ROWS


def test_projection(corpus_files, ray_session):
    for fname in ("docs.parquet", "docs.jsonl"):
        ds = read_corpus(str(corpus_files / fname), columns=["doc_id", "text"])
        assert set(ds.schema().names) == {"doc_id", "text"}


def test_schema_metadata_stripped(corpus_files, ray_session):
    # pandas-written parquet carries b'pandas' metadata; the reader drops it
    ds = read_corpus(str(corpus_files / "docs.parquet"))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    batches = ds.map_batches(
        lambda b: pa.table({"has_md": pa.array([bool(b.schema.metadata)] * len(b))}),
        batch_format="pyarrow",
    ).to_pandas()
    assert not batches["has_md"].any()


def test_ambiguous_format_raises(corpus_files, ray_session):
    with pytest.raises(ValueError, match="cannot auto-detect"):
        read_corpus([str(corpus_files / "docs.parquet"), str(corpus_files / "docs.jsonl")])


def test_jsonl_to_index_build(corpus_files, tmp_path, ray_session):
    # a non-parquet corpus still feeds the (dataset-path) index build
    from meresco_lucene_ray.index import IndexConfig, build_index
    from meresco_lucene_ray.query import IndexSearcher, TermQ

    ds = read_corpus(str(corpus_files / "docs.jsonl"))
    cfg = IndexConfig(text_col="text", id_col="doc_id", num_shards=2)
    build_index(ds, str(tmp_path / "idx"), cfg)
    s = IndexSearcher(str(tmp_path / "idx"), num_actors=1)
    res = s.execute(TermQ("beta"), stop=10)
    assert res.total == 2
