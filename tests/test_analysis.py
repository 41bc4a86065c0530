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


def test_snowball_dutch_stemmer():
    """Snowball Dutch algorithm applied mechanically — known demo pairs."""
    from meresco_lucene_ray.analysis import dutch_stem

    cases = {
        "boeken": "boek", "lopen": "lop", "katten": "kat", "bedden": "bed",
        "huizen": "huiz", "gemeente": "gemeent",
        # step 4 vowel undoubling (maan→man class)
        "grootte": "grot", "maan": "man",
        # heden→heid then -heid removal in R2
        "heerlijkheden": "heerlijk", "mogelijkheden": "mogelijk",
        # -lijk in R2 with step-2 repeat
        "lichamelijke": "licham", "lichamelijk": "licham",
        # valid s-ending excludes j; gem- guard for -en
        "gemeenten": "gemeent",
        # short words untouched
        "ja": "ja", "y": "y",
    }
    for w, exp in cases.items():
        assert dutch_stem(w) == exp, (w, dutch_stem(w), exp)


def test_classic_analyzer():
    """ClassicFilter parity: possessive 's stripping + acronym dot removal
    (MerescoStandardAnalyzer.java:53-70)."""
    from meresco_lucene_ray.analysis import make_tokenizer, tokenize_classic

    assert tokenize_classic("John's book") == ["john", "book"]
    assert tokenize_classic("I.B.M. stock") == ["ibm", "stock"]
    assert tokenize_classic("the U.S.A. O'Neil's car") == ["the", "usa", "o'neil", "car"]
    assert tokenize_classic("") == []
    tok = make_tokenizer("classic")
    # grammar-faithful: "I.B.M.'s" is ACRONYM "I.B.M." + ALPHANUM "s"
    # (APOSTROPHE requires letters before the quote), unlike "John's"
    assert tok(["I.B.M.'s plan"]) == [["ibm", "s", "plan"]]


def test_classic_tokenizer_grammar():
    """ClassicTokenizer grammar edges (ClassicTokenizerImpl.jflex): product
    numbers (NUM), emails, hosts, COMPANY names, and ASCII folding."""
    from meresco_lucene_ray.analysis import classic_scan, tokenize_classic

    assert tokenize_classic("oc-0123 part") == ["oc-0123", "part"]
    assert tokenize_classic("p.435-444") == ["p.435-444"]
    assert tokenize_classic("1-2-3-4 B2B 2B") == ["1-2-3-4", "b2b", "2b"]
    assert tokenize_classic("AT&T you@me") == ["at&t", "you@me"]
    assert tokenize_classic("bob@example.com mail") == ["bob@example.com", "mail"]
    assert tokenize_classic("www.example.org site") == ["www.example.org", "site"]
    assert tokenize_classic("21.35 price") == ["21.35", "price"]
    assert tokenize_classic("café naïve") == ["cafe", "naive"]
    # token types from the scanner itself
    assert [t for t, _ in classic_scan("I.B.M. John's oc-0123 AT&T a@b.c x.y")] == [
        "ACRONYM", "APOSTROPHE", "NUM", "COMPANY", "EMAIL", "HOST"]
