"""Training-data curation operators: PII redaction, decontamination,
stratified sampling, repetition stats, sequence packing."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.functions.curation import (
    Decontaminator,
    benchmark_shingle_set,
    decontaminate,
    redact_pii_batch,
    repetition_batch,
    seqpack_windows,
    stratified_sample_batch,
)


def _t(**cols):
    return pa.table(cols)


# ---- PII redaction ---------------------------------------------------------


def test_redact_email_ip_phone():
    t = _t(
        doc_id=[0, 1, 2],
        text=[
            "write to alice.b@corp-mail.example.com today",
            "server at 192.168.0.17 answered",
            "call 555-123-4567 or 555-000-1111 now",
        ],
    )
    out = redact_pii_batch(t)
    red = out["redacted"].to_pylist()
    assert red[0] == "write to <EMAIL> today"
    assert red[1] == "server at <IP> answered"
    assert red[2] == "call <PHONE> or <PHONE> now"
    assert out["n_pii"].to_pylist() == [1, 1, 2]


def test_redact_clean_text_untouched():
    t = _t(doc_id=[0], text=["nothing sensitive here 12 monkeys"])
    out = redact_pii_batch(t)
    assert out["redacted"].to_pylist() == ["nothing sensitive here 12 monkeys"]
    assert out["n_pii"].to_pylist() == [0]


def test_redact_replacement_not_rematched():
    # the <EMAIL> token contains no digits: ip/phone patterns can't fire on it
    t = _t(doc_id=[0], text=["x 1.2.3.4@e5.example.net y"])
    out = redact_pii_batch(t)
    assert out["n_pii"].to_pylist() == [1]
    assert out["redacted"].to_pylist() == ["x <EMAIL> y"]


# ---- decontamination -------------------------------------------------------


def test_benchmark_set_and_overlap(ray_session):
    import ray
    import ray.data as rd

    bench = rd.from_arrow(_t(doc_id=[0], text=["the quick brown fox jumps"]))
    corpus = rd.from_arrow(
        _t(
            doc_id=[1, 2, 3],
            text=[
                "lazy dog sat near the quick brown fox today",  # shares 3-grams
                "the quick red fox",  # no shared 3-gram
                "quick brown fox jumps high",  # shares two 3-grams
            ],
        )
    )
    out = (
        decontaminate(corpus, bench, shingle_n=3)
        .to_pandas()
        .set_index("doc_id")["n_overlap"]
        .to_dict()
    )
    # doc1: 'the quick brown','quick brown fox' → 2; doc3: 'quick brown fox',
    # 'brown fox jumps' → 2; doc2: 0
    assert out == {1: 2, 2: 0, 3: 2}


def test_decontaminator_distinct_shingles(ray_session):
    import ray

    bench = np.sort(
        benchmark_shingle_set(
            __import__("ray").data.from_arrow(_t(doc_id=[0], text=["a b c"])),
            shingle_n=3,
        )
    )
    d = Decontaminator(ray.put(bench), shingle_n=3)
    # repeated shingle counted ONCE (distinct overlap)
    out = d(_t(doc_id=[9], text=["a b c a b c a b c"]))
    assert out["n_overlap"].to_pylist()[0] >= 1
    # 'a b c' appears as a shingle multiple times but is one distinct hash;
    # other shingles ('b c a', 'c a b') don't overlap
    assert out["n_overlap"].to_pylist() == [1]


# ---- stratified sampling ---------------------------------------------------


def test_stratified_sample_deterministic():
    t = _t(doc_id=list(range(200)), lang=["en", "nl"] * 100)
    a = stratified_sample_batch(t)
    b = stratified_sample_batch(t)
    assert a.equals(b)
    assert 0 < len(a) < 200


def test_stratified_sample_batch_invariance():
    """The keep decision is per-row: splitting the batch changes nothing."""
    t = _t(doc_id=list(range(100)), lang=["en"] * 50 + ["nl"] * 50)
    whole = stratified_sample_batch(t)["doc_id"].to_pylist()
    parts = []
    for lo in range(0, 100, 7):
        parts.extend(
            stratified_sample_batch(t.slice(lo, 7))["doc_id"].to_pylist()
        )
    assert whole == parts


def test_stratified_sample_rates_differ_by_stratum():
    n = 3000
    t = _t(doc_id=list(range(n)), lang=["en"] * n)
    u = _t(doc_id=list(range(n)), lang=["zz"] * n)
    ka, kb = len(stratified_sample_batch(t)), len(stratified_sample_batch(u))
    # expected permille = 100 + fnv(lang) % 800 — almost surely different
    assert ka != kb


# ---- repetition stats ------------------------------------------------------


def test_repetition_fractions():
    t = _t(doc_id=[0, 1, 2], text=["a a a a", "a b c d", ""])
    out = repetition_batch(t)
    assert out["n_tokens"].to_pylist() == [4, 4, 0]
    dup_tok = out["dup_token_frac"].to_pylist()
    assert dup_tok[0] == pytest.approx(0.75)  # 1 unique of 4
    assert dup_tok[1] == 0.0
    assert dup_tok[2] == 0.0
    dup2 = out["dup_2gram_frac"].to_pylist()
    # 'a a' ×3 → 1 unique of 3 pairs
    assert dup2[0] == pytest.approx(1 - 1 / 3)
    assert dup2[1] == 0.0


def test_repetition_pairs_do_not_span_docs():
    # last token of doc0 + first token of doc1 must NOT form a pair
    t = _t(doc_id=[0, 1], text=["x y", "y x"])
    out = repetition_batch(t)
    assert out["dup_2gram_frac"].to_pylist() == [0.0, 0.0]


# ---- sequence packing ------------------------------------------------------


def test_seqpack_windows_prefix_sum(ray_session):
    import ray.data as rd

    # 10 docs × 5 tokens, budget 12 → windows by START position:
    # starts 0,5,10,15,... → window = start // 12
    t = _t(doc_id=list(range(10)), text=["a b c d e"] * 10)
    out = (
        seqpack_windows(rd.from_arrow(t), budget=12, part_size=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    starts = np.arange(10) * 5
    assert out["window"].tolist() == (starts // 12).tolist()
    assert out["n_tokens"].tolist() == [5] * 10


def test_seqpack_partition_boundaries_carry_offsets(ray_session):
    import ray.data as rd

    # ragged token counts across partition boundaries (part_size=2)
    texts = ["a", "a b b", "c", "d e f g", "h h", "i"]
    t = _t(doc_id=list(range(6)), text=texts)
    out = (
        seqpack_windows(rd.from_arrow(t), budget=4, part_size=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    n = [1, 3, 1, 4, 2, 1]
    pre = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert out["window"].tolist() == (pre // 4).tolist()
    assert out["n_tokens"].tolist() == n


# ---- BPE-ish token counting ------------------------------------------------


def test_bpe_token_count():
    from meresco_lucene_ray.functions.textstats import bpe_token_count_batch

    t = _t(doc_id=[0, 1, 2], text=["hello world  42", "", "it's x!"])
    out = bpe_token_count_batch(t)
    # 'hello',' world','  ','42' → 4 ; '' → 0 ; 'it',"'s",' x','!' → 4
    assert out["n_bpe_tokens"].to_pylist() == [4, 0, 4]


def test_entry_dicts_consistent():
    """Every queries() entry has an oracle or a documented golden pin."""
    from meresco_lucene_ray.pipelines.entries import ORACLES, QUERIES

    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == {"media_features", "cluster_topdocs"}
    assert set(ORACLES) <= set(QUERIES)
