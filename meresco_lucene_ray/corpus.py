"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    repo:string, path:string, commit:string, lang:string, content:string

Every value is a pure function of (seed, row_id) via a splitmix64-style
counter hash — fully vectorized, independent of batch boundaries, task
retries and parallelism level, so two builds at different ``num_cpus``
produce byte-identical corpora (the scaling benchmark depends on this).

Token ranks are Zipf-skewed (s≈1.1) over a ~50k vocabulary whose top ranks
are real code keywords — hot terms ("def", "import", "return", "the")
exercise posting-list skew exactly as the north rule demands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
MEAN_TOKENS = 300
MAX_TOKENS = 5_000  # cap per doc (tests); the real corpus caps at 50k

KEYWORDS = (
    "def import return the class if else for while in not and or is none "
    "true false self from as with try except raise lambda yield pass break "
    "continue global del assert int str list dict set tuple len range print "
    "open file data value result index key item node next prev left right "
    "public static void main string new this super extends implements"
).split()

LANGS = ("py", "java", "js", "go", "rs", "c", "md")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _uniform(counter: np.ndarray, stream: int, seed: int) -> np.ndarray:
    h = _splitmix64(counter * np.uint64(1_000_003) + np.uint64(stream * 7919 + seed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def corpus_batch(row_ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate corpus rows for the given row ids (pure, vectorized)."""
    rid = np.asarray(row_ids, dtype=np.uint64)
    n = rid.size
    # doc length: lognormal-ish via exp of scaled normal approx (sum of uniforms)
    u1 = _uniform(rid, 1, seed)
    u2 = _uniform(rid, 2, seed)
    normal = np.sqrt(-2.0 * np.log(u1 + 1e-12)) * np.cos(2 * np.pi * u2)
    dl = np.clip(np.exp(np.log(MEAN_TOKENS) + 0.7 * normal), 5, MAX_TOKENS).astype(np.int64)

    # flatten token slots: counter = rid * 2^20 + slot (doc cap << 2^20)
    doc_idx = np.repeat(np.arange(n), dl)
    slot = np.arange(int(dl.sum()), dtype=np.uint64) - np.repeat(
        np.concatenate(([0], np.cumsum(dl)[:-1])).astype(np.uint64), dl
    )
    counters = rid[doc_idx] * np.uint64(1 << 20) + slot
    u = _uniform(counters, 3, seed)
    # zipf-ish rank via inverse power law, clipped to vocab
    ranks_f = np.power(1.0 - u, -1.0 / (ZIPF_S - 1.0 + 1e-9))
    ranks = np.minimum(ranks_f, float(VOCAB_SIZE)).astype(np.int64) - 1

    kw = np.asarray(KEYWORDS, dtype=object)
    terms = np.where(
        ranks < len(kw), kw[np.minimum(ranks, len(kw) - 1)], np.asarray(ranks, dtype=object)
    )
    # build content strings per doc
    contents: list[str] = []
    starts = np.concatenate(([0], np.cumsum(dl)))
    term_strs = [t if isinstance(t, str) else f"v{t}" for t in terms.tolist()]
    for i in range(n):
        contents.append(" ".join(term_strs[starts[i] : starts[i + 1]]))

    h = _splitmix64(rid * np.uint64(31) + np.uint64(seed))
    h2 = _splitmix64(rid * np.uint64(37) + np.uint64(seed + 1))
    lang_ix = (h % np.uint64(len(LANGS))).astype(np.int64)
    repos = [f"org{int(x) % 50}/proj{int(x) % 997}" for x in h]
    langs = [LANGS[i] for i in lang_ix]
    paths = [f"src/pkg{int(x) % 23}/file_{int(r)}.{l}" for x, r, l in zip(h2, rid, langs)]
    commits = [f"{int(a):016x}{int(b):016x}{int(a) & 0xFFFFFFFF:08x}" for a, b in zip(h, h2)]
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def synthesize_corpus(n_docs: int, seed: int = 42, parallelism: int = -1):
    """Corpus as a Ray Dataset: range(n) → map_batches(corpus_batch)."""
    import ray.data as rd

    ds = rd.range(n_docs, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b: corpus_batch(b["id"], seed), batch_format="numpy", batch_size=2048
    )
