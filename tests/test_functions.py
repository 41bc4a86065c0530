"""Training-data function tests: jaccard verification, simhash, multimodal
stubs, quality/langid/fingerprint, embedding near-dup positive path."""

import numpy as np
import pyarrow as pa
import pytest

from meresco_lucene_ray.functions.dedup import (
    SimHasher,
    add_content_hash,
    jaccard_pairs,
    minhash_lsh_candidates,
    embedding_neardup_pairs,
)
from meresco_lucene_ray.functions.multimodal import (
    AudioFrameSampleStage,
    ImageDecodeStage,
    MEDIA_SCHEMA,
    synthesize_media,
)
from meresco_lucene_ray.functions.textstats import (
    LangId,
    fingerprint_batch,
    quality_batch,
    token_stats_batch,
)


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox jumps over the lazy cat",  # near dup
        "completely different content about spark shuffles",
        "",
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})


def test_content_hash_and_simhash():
    t = _docs_table()
    h = add_content_hash(t)
    hashes = h["content_md5"].to_pylist()
    assert hashes[0] == hashes[1] != hashes[2]
    s = SimHasher()( t )
    sims = s["simhash"].to_pylist()
    assert sims[0] == sims[1]
    # near-dup differs in few bits
    ham = bin(np.uint64(sims[0]) ^ np.uint64(sims[2])).count("1")
    assert ham <= 16
    assert sims[4] == 0  # empty doc


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    buckets = minhash_lsh_candidates(ds, num_perm=32, bands=16, shingle_n=2).to_pandas()
    groups = [list(g) for g in buckets["ids"] if isinstance(g, (list, np.ndarray)) and len(g) >= 2]
    flat_pairs = {(min(a, b), max(a, b)) for g in groups for a in g for b in g if a != b}
    assert (0, 1) in flat_pairs  # exact dups always bucket together
    # verify candidates with exact jaccard
    verified = jaccard_pairs(ds, groups, n=2, threshold=0.5)
    pairs = {(a, b) for a, b, _ in verified}
    assert (0, 1) in pairs
    for a, b, j in verified:
        assert 0.5 <= j <= 1.0


def test_embedding_neardup_positive(ray_session):
    import ray.data as rd

    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.999, 0.04, 0.0, 0.0],  # near dup of 0
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(4), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            "label": pa.array([0, 0, 0, 1], type=pa.int32()),
        }
    )
    out = embedding_neardup_pairs(rd.from_arrow(t), group_col="label", threshold=0.95).to_pandas()
    assert len(out) == 1
    assert (int(out["id_a"][0]), int(out["id_b"][0])) == (0, 1)
    assert out["cosine"][0] > 0.99


def test_textstats():
    t = _docs_table()
    s = token_stats_batch(t)
    assert s["n_tokens"].to_pylist()[0] == 9
    assert s["n_unique"].to_pylist()[0] == 8  # 'the' twice
    q = quality_batch(t)
    assert q["stopword_ratio"].to_pylist()[0] == pytest.approx(2 / 9)
    assert q["stopword_ratio"].to_pylist()[4] == 0.0
    f = fingerprint_batch(t)
    fp = f["fingerprint"].to_pylist()
    assert fp[0] == fp[1] != fp[2]
    lang = LangId()(t)
    assert lang["lang_pred"].to_pylist()[0] == "en"
    assert lang["lang_pred"].to_pylist()[4] == "und"


def test_multimodal_stub_pipeline(ray_session):
    import ray.data as rd

    media = synthesize_media(12)
    assert media.schema.equals(MEDIA_SCHEMA)
    ds = rd.from_arrow(media)
    # image decode stub as an actor-pool stage with small batches (wide rows)
    out = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 12
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload → same features
    again = ImageDecodeStage(fake=True)(media)
    assert again["features"].to_pylist() == [list(f) for f in out["features"]]
    frames = AudioFrameSampleStage(n_frames=4, fake=True)(media)
    assert all(len(f) == 4 for f in frames["frames"].to_pylist())


def test_multimodal_real_decode(ray_session):
    """REAL decode paths (no external libs): P6 PPM via the numpy codec,
    PCM WAV via stdlib wave — run through an actor-pool map_batches."""
    import ray.data as rd

    media = synthesize_media(12)
    images = media.filter(pa.compute.equal(media["kind"], "image"))
    feats = (
        rd.from_arrow(images)
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"size": (16, 16), "fake": False},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    assert len(feats) == 4
    for f in feats["features"]:
        assert len(f) == 8
        # gradient image: red/green channel means near 0.5, aspect 1.0
        assert 0.3 < f[0] < 0.7 and 0.3 < f[1] < 0.7
        assert f[6] == pytest.approx(1.0)
    audio = media.filter(pa.compute.equal(media["kind"], "audio"))
    frames = AudioFrameSampleStage(n_frames=4, fake=False)(audio)
    for f in frames["frames"].to_pylist():
        # sine at 0.5 amplitude → window RMS ≈ 0.35
        assert len(f) == 4 and all(0.2 < v < 0.5 for v in f)
    # deterministic real decode
    again = AudioFrameSampleStage(n_frames=4, fake=False)(audio)
    assert again["frames"].to_pylist() == frames["frames"].to_pylist()


def test_multimodal_unsupported_raises():
    from meresco_lucene_ray.functions.multimodal import VideoFrameSampleStage

    bad = pa.table(
        {"payload": pa.array([b"\x89PNG not really"], type=pa.large_binary())}
    )
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; decode gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(fake=False)(bad)
    with pytest.raises(NotImplementedError):
        AudioFrameSampleStage(fake=False)(bad)
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(fake=False)
    # fake video frames work on arbitrary bytes
    v = VideoFrameSampleStage(n_frames=3, fake=True)(bad)
    assert len(v["frames"][0].as_py()) == 3


def test_ivf_topk(ray_session):
    """IVF ANN: clustered vectors — the probed cells must contain the true
    neighbours, so recall@k beats unpartitioned LSH on clustered data and the
    result is deterministic."""
    import numpy as np
    import ray.data as rd

    from meresco_lucene_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(4)
    centers = rng.standard_normal((6, 16)) * 4
    vecs, ids = [], []
    for i in range(600):
        c = centers[i % 6]
        vecs.append((c + rng.standard_normal(16) * 0.3).tolist())
        ids.append(i)
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()), "embedding": pa.array(vecs, type=pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow(t)
    q = np.asarray(vecs[0])
    got = ivf_topk(ds, q, k=10, n_centroids=8, n_probe=2)
    exact = brute_force_topk(ds, q, k=10)
    overlap = len(set(got["vec_id"].to_pylist()) & set(exact["vec_id"].to_pylist()))
    assert overlap >= 8  # probing the query's cluster finds the true neighbours
    again = ivf_topk(ds, q, k=10, n_centroids=8, n_probe=2)
    assert got["vec_id"].to_pylist() == again["vec_id"].to_pylist()


def test_neardup_driver_and_distributed_verify_agree(ray_session, monkeypatch):
    """verify_neardup_pairs: the gated driver verify (broadcast id filter +
    in-driver Jaccard) and the distributed two-hash-join path return the
    same verified pair set."""
    import ray.data as rd

    from meresco_lucene_ray.functions.dedup import (
        minhash_lsh_candidates,
        verify_neardup_pairs,
    )

    texts = []
    for i in range(40):
        base = f"the quick brown fox {i % 8} jumps over the lazy dog wordy tail {i % 8}"
        texts.append(base if i % 2 == 0 else base + " extra")
    t = pa.table(
        {"doc_id": pa.array(list(range(40)), type=pa.int64()), "text": texts}
    )

    def run():
        ds = rd.from_arrow(t)
        buckets = minhash_lsh_candidates(ds, "text", "doc_id", num_perm=16, bands=8, shingle_n=2)
        out = verify_neardup_pairs(ds, buckets, "text", "doc_id", n=2, threshold=0.5).to_pandas()
        return sorted(
            (int(a), int(b), round(float(j), 9))
            for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])
        )

    monkeypatch.setenv("MLR_NEARDUP_DRIVER_MAX", "1000000")
    fast = run()
    assert fast  # the corpus above must actually produce near-dup pairs
    # broadcast-sigs path: past the driver work gate, payload fits broadcast
    monkeypatch.setenv("MLR_NEARDUP_DRIVER_VALUES_MAX", "0")
    assert run() == fast
    # join path with the involved-id pre-filter: past the sig-broadcast gate
    monkeypatch.setenv("MLR_NEARDUP_BCAST_SIGS_MAX", "0")
    assert run() == fast
    # full-corpus join path: past every broadcast gate
    monkeypatch.setenv("MLR_NEARDUP_DRIVER_MAX", "0")
    monkeypatch.setenv("MLR_NEARDUP_BROADCAST_MAX", "0")
    assert run() == fast
