"""Token-window chunking + deterministic shuffle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from meresco_lucene_ray.functions.curation import chunk_token_windows, deterministic_shuffle


def test_chunk_token_windows_spec(ray_session):
    import ray.data as rd

    texts = [
        " ".join(f"t{i}" for i in range(7)),  # 7 tokens, chunk=4 stride=3 -> 3 windows
        "solo",                                # 1 token -> 1 window
        "",                                    # empty -> 1 empty window
    ]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
    out = (
        chunk_token_windows(rd.from_pandas(df), "text", "doc_id", chunk=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    assert list(d0["chunk_text"]) == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6"]
    assert list(d0["n_tokens"]) == [4, 4, 1]
    assert list(out[out["doc_id"] == 1]["chunk_text"]) == ["solo"]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == [""] and list(d2["n_tokens"]) == [0]


def test_deterministic_shuffle_is_reproducible_and_seed_sensitive(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
    a = deterministic_shuffle(rd.from_pandas(df), "doc_id", seed=7).to_pandas()["doc_id"]
    b = deterministic_shuffle(rd.from_pandas(df), "doc_id", seed=7).to_pandas()["doc_id"]
    c = deterministic_shuffle(rd.from_pandas(df), "doc_id", seed=8).to_pandas()["doc_id"]
    assert list(a) == list(b)
    assert list(a) != list(c)
    assert sorted(a) == list(range(100))
