"""Regression tests for the round-3 ADVICE findings:

1. weighted_sample must drop rows with non-positive weights (w=0 gives
   -inf/NaN keys whose Arrow-sort placement is undefined and diverges from
   the SQL mirror's NULL).
2. unigram_logprob / collocations_pmi must not crash with TypeError on an
   empty corpus (Dataset.sum returns None on zero rows).
"""

import pyarrow as pa


def test_weighted_sample_drops_nonpositive_weights(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.curation import weighted_sample

    n = 40
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            # rows 0..9 have weight 0 or negative — must never be sampled
            "w": pa.array([0.0] * 5 + [-1.0] * 5 + [1.0] * (n - 10)),
        }
    )
    out = weighted_sample(rd.from_arrow(tbl), "doc_id", "w", k=25, seed=7).to_pandas()
    assert len(out) == 25
    assert (out["doc_id"] >= 10).all(), "non-positive-weight rows leaked into sample"
    # keys are all finite (no NaN/-inf placement ambiguity)
    import numpy as np

    assert np.isfinite(out["key"].to_numpy()).all()


def test_unigram_logprob_empty_corpus(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.textstats import unigram_logprob

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    ds = unigram_logprob(rd.from_arrow(empty), id_col="doc_id", text_col="text")
    assert ds.schema().names == ["doc_id", "n_tokens", "mean_nll"]
    assert len(ds.to_pandas()) == 0


def test_collocations_pmi_empty_and_below_support(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.textstats import collocations_pmi

    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = collocations_pmi(rd.from_arrow(empty), text_col="text").to_pandas()
    assert len(out) == 0

    tiny = pa.table({"text": pa.array(["alpha beta", "alpha beta gamma"])})
    out2 = collocations_pmi(rd.from_arrow(tiny), text_col="text", min_count=25).to_pandas()
    assert len(out2) == 0
