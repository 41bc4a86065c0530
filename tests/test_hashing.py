"""Vectorized hashing kernels must stay bit-identical to the frozen round-1
scalar specs (hash_str / per-doc MinHash / SimHash / fingerprint loops)."""

import random
import string

import numpy as np
import pyarrow as pa

from meresco_lucene_ray.analysis import tokenize_batch
from meresco_lucene_ray.functions.dedup import (
    MERSENNE,
    MinHasher,
    SimHasher,
    _band_hash_rows,
)
from meresco_lucene_ray.functions.hashing import fnv1a_arrow, mersenne_mulmod
from meresco_lucene_ray.functions.textstats import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    fingerprint_batch,
    hash_str,
)


def _rand_texts(n=120, seed=3):
    rng = random.Random(seed)
    out = ["", "one", "one two", "the quick brown fox jumps", "a a a a a"]
    for _ in range(n):
        k = rng.randint(0, 30)
        out.append(
            " ".join(
                "".join(rng.choices(string.ascii_letters + string.digits + "_-.", k=rng.randint(1, 8)))
                for _ in range(k)
            )
        )
    return out


def test_fnv1a_arrow_matches_hash_str():
    rng = random.Random(1)
    strs = ["", "a", "hello world", "ü-é", "x" * 300] + [
        "".join(rng.choices(string.printable, k=rng.randint(0, 50))) for _ in range(500)
    ]
    got = fnv1a_arrow(pa.array(strs, type=pa.string()))
    exp = np.array([hash_str(s) for s in strs], dtype=np.uint64)
    assert (got == exp).all()
    # sliced + large_string + null handling
    arr = pa.array(strs[:50] + [None], type=pa.large_string())
    got2 = fnv1a_arrow(arr.slice(10))
    exp2 = np.array([hash_str(s) for s in strs[10:50] + [""]], dtype=np.uint64)
    assert (got2 == exp2).all()


def test_mersenne_mulmod_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, MERSENNE, 5000, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, 5000, dtype=np.uint64)
    got = mersenne_mulmod(a, b)
    exp = np.array([(int(x) * int(y)) % MERSENNE for x, y in zip(a, b)], dtype=np.uint64)
    assert (got == exp).all()


def test_minhash_signature_matches_round1_spec():
    texts = _rand_texts()
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    mh = MinHasher("text", num_perm=16, shingle_n=3)
    toks = tokenize_batch(texts)

    def old_sig(tokens):
        if len(tokens) < mh.n:
            shingles = [" ".join(tokens)] if tokens else [""]
        else:
            shingles = [" ".join(tokens[i : i + mh.n]) for i in range(len(tokens) - mh.n + 1)]
        hv = np.fromiter((hash_str(s) for s in set(shingles)), dtype=np.uint64)
        prod = (mh.a[:, None] * (hv[None, :] % MERSENNE)) % MERSENNE
        return ((prod + mh.b[:, None]) % MERSENNE).min(axis=1)

    exp = np.stack([old_sig(t) for t in toks])
    assert (mh.signatures(batch) == exp).all()
    # band-hash spec: FNV of '|'-joined decimal strings, 63-bit mask
    rows = _band_hash_rows(mh(batch), "doc_id", bands=4)
    rpb = 16 // 4
    i = 7  # spot-check one doc
    sig = exp[i]
    for b in range(4):
        h = hash_str("|".join(str(int(v)) for v in sig[b * rpb : (b + 1) * rpb]))
        assert rows["band_hash"][i * 4 + b].as_py() == int(np.int64(h & 0x7FFFFFFFFFFFFFFF))


def test_simhash_and_fingerprint_match_round1_spec():
    texts = _rand_texts(seed=9)
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    toks = tokenize_batch(texts)

    def old_simhash(t):
        if not t:
            return np.uint64(0)
        bit_cols = np.uint64(1) << np.arange(64, dtype=np.uint64)
        uniq, counts = np.unique(np.asarray(t, dtype=object), return_counts=True)
        hv = np.fromiter((hash_str(w) for w in uniq), dtype=np.uint64)
        bits = ((hv[:, None] & bit_cols[None, :]) != 0).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        return np.uint64(np.packbits((votes > 0)[::-1]).view(">u8")[0])

    got = SimHasher("text")(batch)["simhash"].to_pylist()
    exp = [int(old_simhash(t).astype(np.int64)) for t in toks]
    assert got == exp

    def old_fp(t):
        h = 0
        for w in t:
            h = (h * FINGERPRINT_BASE + (hash_str(w) & 0xFFFFFFFF)) % FINGERPRINT_MOD
        return h

    got_fp = fingerprint_batch(batch)["fingerprint"].to_pylist()
    exp_fp = [int(np.uint64(old_fp(t)).astype(np.int64)) for t in toks]
    assert got_fp == exp_fp


def test_distributed_verify_matches_driver_side(ray_session):
    import ray.data as rd

    from meresco_lucene_ray.functions.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
        verify_neardup_pairs,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content about ray shuffles",
        "the quick brown fox naps under the lazy dog",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ds = rd.from_arrow(t)
    buckets = minhash_lsh_candidates(ds, num_perm=32, bands=16, shingle_n=2)
    groups = [list(g) for g in buckets.to_pandas()["ids"]]
    old = sorted((int(a), int(b), round(j, 9)) for a, b, j in jaccard_pairs(ds, groups, n=2, threshold=0.3))
    new_df = verify_neardup_pairs(ds, buckets, n=2, threshold=0.3).to_pandas()
    new = sorted(
        (int(a), int(b), round(float(j), 9))
        for a, b, j in zip(new_df["id_a"], new_df["id_b"], new_df["jaccard"])
    )
    assert [(a, b) for a, b, _ in old] == [(a, b) for a, b, _ in new]
    for (_, _, j1), (_, _, j2) in zip(old, new):
        assert abs(j1 - j2) < 1e-9
    assert (0, 1) in {(a, b) for a, b, _ in new}


def test_minhash_max_bucket_skew_guard(ray_session):
    """Boilerplate skew guard: buckets above max_bucket are dropped (their
    members still pair through more selective bands when they differ)."""
    import ray.data as rd

    texts = ["exact same boilerplate license header text"] * 5 + [
        "some unique content one",
        "some unique content two",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    from meresco_lucene_ray.functions.dedup import minhash_lsh_candidates

    full = minhash_lsh_candidates(rd.from_arrow(t), num_perm=16, bands=8, shingle_n=2).to_pandas()
    assert any(len(g) == 5 for g in full["ids"])  # the boilerplate bucket
    capped = minhash_lsh_candidates(
        rd.from_arrow(t), num_perm=16, bands=8, shingle_n=2, max_bucket=3
    ).to_pandas()
    capped_ids = list(capped["ids"]) if len(capped) else []
    assert all(len(g) <= 3 for g in capped_ids)
    assert not any(len(g) == 5 for g in capped_ids)  # boilerplate bucket dropped
    # sub-cap buckets survive untouched
    small_full = [tuple(g) for g in full["ids"] if len(g) <= 3]
    assert sorted(tuple(g) for g in capped_ids) == sorted(small_full)


def test_list_col_to_matrix_rect_and_ragged():
    import numpy as np
    import pyarrow as pa

    from meresco_lucene_ray.functions.hashing import list_col_to_matrix

    rect = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], type=pa.list_(pa.float64()))
    m = list_col_to_matrix(rect)
    assert m.shape == (3, 2) and m[2, 1] == 6.0
    # sliced offsets (non-zero start) must still map to the right rows
    m2 = list_col_to_matrix(rect.slice(1, 2))
    assert m2.tolist() == [[3.0, 4.0], [5.0, 6.0]]
    ragged = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
    import pytest

    with pytest.raises(ValueError):
        np.asarray(ragged.to_pylist(), dtype=np.float64)  # ragged is ragged
    # fallback path returns object-free matrix only for rectangular input;
    # ragged raises in numpy — callers only use embedding columns (rect)
