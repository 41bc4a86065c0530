"""Deduplication operators for training-data pipelines.

Exact dedup mirrors the reference's upsert/grouping semantics (hash-partition
+ per-group representative, Q11/A3); the near-dup family (MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine) extends it the way a 100 TB
training-data pipeline needs.

Scale shapes:
- exact: map_batches(add content hash) → groupby(hash) keep-first — one hash
  shuffle whose groups are tiny (dup cardinality), never skewed by design.
- minhash-lsh: map_batches(shingle→minhash, vectorized) → explode to one row
  per band → groupby(band_hash) emits candidate groups — the classic
  shingle→minhash→band→bucket pipeline; no pairwise work outside buckets.
- simhash: vectorized 64-bit simhash per doc; near-dups = equal values per
  rotated band (hamming ≤ k via k+1 table splits).
- embedding cosine: per-batch normalized matmul against a broadcast matrix.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analysis import tokenize_batch
from .textstats import hash_str


# ---------- exact dedup ----------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_md5") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, type=pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """groupby(content hash) → keep the min-id row per group, count dups.

    Returns a Dataset of (content_md5, keep_id, dup_count)."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_md5": [g["content_md5"].iloc[0]],
                "keep_id": [int(g[id_col].min())],
                "dup_count": [len(g)],
            }
        )

    return hashed.groupby("content_md5").map_groups(keep_first, batch_format="pandas")


# ---------- MinHash + LSH ---------------------------------------------------

MERSENNE = (1 << 61) - 1


class MinHasher:
    """Vectorized MinHash over word shingles (actor-pool stage: permutation
    parameters generated once per actor from a fixed seed)."""

    def __init__(self, text_col: str = "text", num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.n = shingle_n

    def signature(self, tokens: list[str]) -> np.ndarray:
        if len(tokens) < self.n:
            shingles = [" ".join(tokens)] if tokens else [""]
        else:
            shingles = [" ".join(tokens[i : i + self.n]) for i in range(len(tokens) - self.n + 1)]
        hv = np.fromiter((hash_str(s) for s in set(shingles)), dtype=np.uint64)
        # (a*x+b) mod p for all perms x all shingles, then min over shingles
        prod = (self.a[:, None] * (hv[None, :] % MERSENNE)) % MERSENNE
        return ((prod + self.b[:, None]) % MERSENNE).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch[self.text_col].to_pylist())
        sigs = np.stack([self.signature(t) for t in toks])
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.int64)), type=pa.list_(pa.int64()))
        )


def minhash_lsh_candidates(ds, text_col="text", id_col="doc_id", num_perm=64, bands=16, shingle_n=3):
    """shingle → minhash → band → bucket groupby → candidate duplicate groups.

    Returns a Dataset of (band, band_hash, ids list) for buckets with ≥2 docs."""
    import pandas as pd

    rows_per_band = num_perm // bands
    sigged = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, num_perm, shingle_n),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = batch["minhash"].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, sig in zip(ids, sigs):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
                h = hash_str("|".join(map(str, chunk.tolist())))
                out_id.append(i)
                out_band.append(b)
                out_hash.append(np.int64(h & 0x7FFFFFFFFFFFFFFF))
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"band": [], "band_hash": [], "ids": []})
        return pd.DataFrame(
            {
                "band": [int(g["band"].iloc[0])],
                "band_hash": [int(g["band_hash"].iloc[0])],
                "ids": [sorted(int(x) for x in g[id_col])],
            }
        )

    return exploded.groupby(["band", "band_hash"]).map_groups(bucket, batch_format="pandas")


# ---------- SimHash ---------------------------------------------------------

class SimHasher:
    """64-bit SimHash over tokens (tf-weighted bit voting), vectorized."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch[self.text_col].to_pylist())
        out = np.empty(len(toks), dtype=np.uint64)
        bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for i, t in enumerate(toks):
            if not t:
                out[i] = 0
                continue
            uniq, counts = np.unique(np.asarray(t, dtype=object), return_counts=True)
            hv = np.fromiter((hash_str(w) for w in uniq), dtype=np.uint64)
            bits = ((hv[:, None] & bit_cols[None, :]) != 0).astype(np.int64)
            votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            out[i] = np.uint64(np.packbits((votes > 0)[::-1]).view(">u8")[0])
        return batch.append_column("simhash", pa.array(out.astype(np.int64)))


# ---------- n-gram Jaccard ---------------------------------------------------

def jaccard_pairs(ds, candidate_groups, text_col="text", id_col="doc_id", n=3, threshold=0.8):
    """Verify candidate groups by exact n-gram Jaccard similarity.

    ``candidate_groups``: list of id lists (e.g. from minhash_lsh_candidates).
    Fetches candidate docs once, verifies pairwise inside each (small) group."""
    import itertools

    cand_ids = sorted({i for g in candidate_groups for i in g})
    if not cand_ids:
        return []
    idset = set(cand_ids)
    texts = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids = batch[id_col].to_pylist()
        txts = batch[text_col].to_pylist()
        for i, t in zip(ids, txts):
            if i in idset:
                texts[i] = t
    shingles = {
        i: {" ".join(tok[j : j + n]) for j in range(max(1, len(tok) - n + 1))}
        for i, tok in ((i, tokenize_batch([texts[i]])[0]) for i in cand_ids)
    }
    out = []
    seen = set()
    for g in candidate_groups:
        for a, b in itertools.combinations(sorted(g), 2):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            sa, sb = shingles[a], shingles[b]
            jac = len(sa & sb) / max(1, len(sa | sb))
            if jac >= threshold:
                out.append((a, b, jac))
    return sorted(out)


# ---------- embedding cosine near-dup ---------------------------------------

class CosineScorer:
    """Per-batch cosine against a broadcast (ray.put) normalized query matrix."""

    def __init__(self, query_ref, vec_col: str = "embedding"):
        import ray

        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-30)
        sims = mat @ self.q.T  # (batch, n_queries)
        if sims.shape[1] == 1:
            return batch.append_column("cosine", pa.array(sims[:, 0]))
        return batch.append_column(
            "cosine", pa.array(list(sims), type=pa.list_(pa.float64()))
        )


def embedding_neardup_pairs(ds, vec_col="embedding", id_col="vec_id", group_col=None, threshold=0.95):
    """All pairs with cosine ≥ threshold.  When ``group_col`` is given, only
    pairs within the same group are compared (the scalable path: partition by
    a cheap blocking key — label, LSH bucket — then pairwise inside groups)."""
    import pandas as pd

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.asarray(list(g[vec_col]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sims[iu] >= threshold
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[iu][hit]})

    if group_col is None:
        import pandas as pd

        df = ds.to_pandas()
        return pairs(df)
    return ds.groupby(group_col).map_groups(pairs, batch_format="pandas")
