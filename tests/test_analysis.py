from meresco_lucene_ray.analysis import (
    char_ngrams,
    fold_ascii,
    tokenize,
    tokenize_batch,
    token_positions,
    word_shingles,
)


def test_tokenize_golden():
    assert tokenize("def foo(x): return x_1 + 2") == ["def", "foo", "x", "return", "x_1", "2"]
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("A-B_c") == ["a", "b_c"]


def test_tokenize_batch_matches_single():
    texts = ["The quick brown fox", None, "", "x y z"]
    assert tokenize_batch(texts) == [tokenize(t) for t in texts]


def test_positions():
    assert token_positions(["a", "b", "a"]) == {"a": [0, 2], "b": [1]}


def test_fold_ascii():
    assert fold_ascii("café") == "cafe"


def test_shingles():
    assert word_shingles(["a", "b", "c"], 2, 3) == ["a b", "b c", "a b c"]


def test_char_ngrams_boundaries():
    # $word$ boundary markers per the suggestion NGramAnalyzer
    assert char_ngrams("ab", 2) == ["$a", "ab", "b$"]
    assert char_ngrams("ab cd", 2) == ["$a", "ab", "b$", "$c", "cd", "d$"]
