"""The split-first tokenize fast path must equal the frozen lower-first spec.

The default build path splits the ORIGINAL text on [^a-zA-Z0-9_]+ and
lowercases only the token dictionary (index/build.py _tokens_arrow), instead
of lowercasing the whole corpus first.  That reorder is only valid for
characters whose Unicode lowercase does not LEAK INTO [a-z0-9_]: the guard
``TokenizeStage._UNSAFE_LOWER_RE`` must catch every divergent codepoint.
This test enumerates ALL Unicode codepoints and proves the guard complete.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from meresco_lucene_ray.index.build import IndexConfig, TokenizeStage


def _token_stream(stage, col, force):
    codes, doc_idx, pos, dictionary, dl = stage._tokens_arrow(col, _force=force)
    toks = pc.take(dictionary, pa.array(np.asarray(codes, dtype=np.int64)))
    return doc_idx, toks, pos, dl


def _all_codepoint_strings():
    cps = [c for c in range(0x110000) if not (0xD800 <= c <= 0xDFFF)]
    return cps, pa.array([f"a{chr(c)}0" for c in cps], type=pa.string())


def test_split_first_equivalence_all_codepoints():
    stage = TokenizeStage(IndexConfig())
    cps, col = _all_codepoint_strings()
    di_a, tk_a, pos_a, dl_a = _token_stream(stage, col, force="safe")
    di_b, tk_b, pos_b, dl_b = _token_stream(stage, col, force="fallback")

    # rows where the two paths diverge in any way
    bad = set()
    if not np.array_equal(dl_a, dl_b):
        bad |= set(np.flatnonzero(dl_a != dl_b))
    # compare per-row token strings where dl matches
    same_dl = np.flatnonzero(np.asarray(dl_a) == np.asarray(dl_b))
    # build per-row concatenated token key for both
    import collections

    rows_a = collections.defaultdict(list)
    for d, t in zip(np.asarray(di_a), tk_a.to_pylist()):
        rows_a[int(d)].append(t)
    rows_b = collections.defaultdict(list)
    for d, t in zip(np.asarray(di_b), tk_b.to_pylist()):
        rows_b[int(d)].append(t)
    for r in same_dl:
        if rows_a[int(r)] != rows_b[int(r)]:
            bad.add(int(r))

    divergent_cps = {cps[i] for i in bad}
    # the guard must cover every divergent codepoint
    guard = stage._UNSAFE_LOWER_RE
    guarded = {
        c
        for c in divergent_cps
        if pc.match_substring_regex(pa.array([chr(c)]), guard)[0].as_py()
    }
    assert divergent_cps == guarded, (
        f"divergent codepoints not caught by guard: "
        f"{[hex(c) for c in sorted(divergent_cps - guarded)][:20]}"
    )
    # sanity: the known divergent pair is İ (U+0130) and K (U+212A)
    assert divergent_cps <= {0x0130, 0x212A}


def test_unsafe_batch_falls_back():
    """A batch containing İ must auto-route to the lower-first path and match
    the frozen spec (lower → findall)."""
    stage = TokenizeStage(IndexConfig())
    col = pa.array(["Xİ Foo_1 bar", "plain ASCII text"], type=pa.string())
    di, tk, pos, dl = _token_stream(stage, col, force=None)
    rows = [[], []]
    for d, t in zip(np.asarray(di), tk.to_pylist()):
        rows[int(d)].append(t)
    import re

    expected = [re.findall(r"[a-z0-9_]+", s.lower()) for s in col.to_pylist()]
    assert rows == expected


@pytest.mark.parametrize("text", ["", "   ", "a", "A b C", "7_x Y", "ümlaut Ärger"])
def test_safe_batches_match_frozen_spec(text):
    stage = TokenizeStage(IndexConfig())
    col = pa.array([text], type=pa.string())
    di, tk, pos, dl = _token_stream(stage, col, force=None)
    import re

    assert tk.to_pylist() == re.findall(r"[a-z0-9_]+", text.lower())


def test_multifield_emit_dictionary_fast_path():
    """The multifield tokenize preserves the dictionary-encoded terms column
    (emit_dictionary) — per-field dictionaries concatenate with code offsets
    instead of materializing per-run term strings, so the zero-shuffle fused
    build keeps its dictionary-code reuse downstream."""
    import pyarrow as pa

    from meresco_lucene_ray.index.build import IndexConfig, TokenizeStage

    cfg = IndexConfig(text_col="text", id_col="__id__", text_fields=("title",))
    t = pa.table(
        {
            "__id__": ["a", "b"],
            "text": ["hello world", "world again"],
            "title": ["hello title", "other words"],
        }
    )
    out = TokenizeStage(cfg, emit_dictionary=True)(t)
    assert pa.types.is_dictionary(out["terms"].type.value_type)
    out2 = TokenizeStage(cfg, emit_dictionary=False)(t)
    assert pa.types.is_string(out2["terms"].type.value_type)
    flat = lambda o: [x for sub in o["terms"].to_pylist() for x in sub]  # noqa: E731
    assert flat(out) == flat(out2)
    assert out["tfs"].to_pylist() == out2["tfs"].to_pylist()
