"""Unit tests for the pure reference-semantics text functions
(oracle side of the byte-identity contract)."""

from searchengine_spark.config import DEFAULT_STOPWORDS
from searchengine_spark.functions import textproc
from searchengine_spark.sources import webgen


def test_clean_text():
    assert textproc.clean_text("<b>hello</b>   world\n\t x") == "hello world x"
    assert textproc.clean_text("  plain  ") == "plain"


def test_title_and_meta_extraction():
    html = '<html><head><title> My  Title </title><meta name="description" content="desc one"></head></html>'
    assert textproc.extract_title_from_html(html) == "My Title"
    assert textproc.extract_meta_description(html) == "desc one"
    # reversed attribute order (text_processing.py:121-122)
    html2 = '<meta content="desc two" name="description">'
    assert textproc.extract_meta_description(html2) == "desc two"
    assert textproc.extract_title_from_html("<p>no title</p>") == ""


def test_extract_text_strips_blocks_and_entities():
    html = (
        "<html><head><title>T</title><style>.x{}</style>"
        "<script>var a=1;</script></head><body>"
        "<header>HDR</header><nav>NAV</nav>"
        "<p>alpha &amp; beta</p><footer>FTR</footer></body></html>"
    )
    text = textproc.extract_text_from_html(html)
    assert "HDR" not in text and "NAV" not in text and "FTR" not in text
    assert "var a" not in text and ".x" not in text
    assert "alpha & beta" in text
    # title text IS kept by get_text (only script/style/nav/footer/header
    # decomposed), and get_text concatenates adjacent text nodes with NO
    # separator — "T" and "alpha" have no whitespace between them in the
    # source, so they fuse exactly as bs4's get_text() fuses them
    assert text.startswith("Talpha")


def test_tokenize_reference_semantics():
    # lowercase, entity strip, URL strip, punct strip, hyphen split, stem, len>1
    toks = textproc.tokenize("Running QUICKLY! test-case https://x.co/a &amp; dogs")
    assert toks == ["run", "quickli", "test", "case", "dog"]
    assert textproc.tokenize("") == []
    assert textproc.tokenize("a b c") == []  # single chars dropped


def test_filter_tokens():
    toks = ["the", "run", "xx", "x" * 21, "of"]
    assert textproc.filter_tokens(toks, DEFAULT_STOPWORDS) == ["run", "xx"]


def test_expand_query_appends_unstemmed_phrases():
    # "typescripts" stems to "typescript"; original phrase appended
    out = textproc.expand_query("learn typescripts")
    assert out == "learn typescript typescripts"
    # re-stemming an already-stemmed token can change it again — the
    # reference (text_processing.py:146-153) appends that second-level stem
    assert textproc.expand_query("coffee") == "coffe coff coffee"


def test_doc_id_md5():
    assert textproc.doc_id_for_url("https://a.b/c") == __import__("hashlib").md5(
        b"https://a.b/c"
    ).hexdigest()


def test_relevant_snippet_windowing():
    content = ("x " * 150) + "needle here " + ("y " * 150)
    snippet_src = content[:200] + "..."
    out = textproc.relevant_snippet(snippet_src, ["needle"])
    assert out.endswith("...")
    out2 = textproc.relevant_snippet(snippet_src, ["absent"])
    assert out2 == snippet_src[:200] + "..."


def test_webgen_deterministic_and_text_matches_extraction():
    d1 = webgen.gen_doc(7)
    d2 = webgen.gen_doc(7)
    assert d1 == d2
    # the text column IS the extraction of the html column (byte identity)
    assert d1["text"] == textproc.extract_text_from_html(d1["html"].decode("utf-8"))
    # noise blocks must not leak into text
    assert "sitemap" not in d1["text"] and "console.log" not in d1["text"]


def test_webgen_planted_terms():
    n = 500
    ids = webgen.planted_doc_ids(0, n)
    assert ids == [d for d in range(n) if d % 50 == 0]
    for d in ids[:3]:
        doc = webgen.gen_doc(d)
        assert doc["text"].count(webgen.planted_term(0)) == 3
    # a non-planted doc does not contain the term
    assert webgen.planted_term(0) not in webgen.gen_doc(1)["text"]


def test_reference_queries_shape():
    qs = webgen.reference_queries()
    assert len(qs) == 21
    assert qs[9][1] == webgen.planted_term(0)


def test_tokenize_filtered_equals_composition():
    """Fused hot path ≡ filter_tokens(tokenize(.)) (the executable spec)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchengine_spark.functions.textproc import (
        filter_tokens,
        tokenize,
        tokenize_filtered,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Z", "S")
            ),
            max_size=400,
        )
    )
    def check(text):
        assert tokenize_filtered(text) == filter_tokens(tokenize(text))

    check()
    # targeted edges: entities, urls, hyphens, 1-char and >20-char tokens,
    # stopword-stemming interactions ("running" → "run"? no — stopwords are
    # checked POST-stem in both paths)
    for s in (
        "", "a", "ab", "the a of", "&amp; x-ray https://e.com/q?z=1 tail",
        "running the runner runs", "x" * 21, "a-b-c d--e", "Café — cafés",
    ):
        assert tokenize_filtered(s) == filter_tokens(tokenize(s))


def test_extract_text_escaped_markup_stripped_like_bs4():
    """bs4 entity-decodes at parse time, so the reference's clean_text tag
    regex runs on DECODED text: escaped markup must vanish, and a decoded
    '< ... >' span is stripped too (reference behavior — code is the spec)."""
    assert (
        textproc.extract_text_from_html("<p>&lt;b&gt;bold&lt;/b&gt; word</p>")
        == "bold word"
    )
    # decoded inequality forms a pseudo-tag that clean_text also eats
    assert (
        textproc.extract_text_from_html("<p>a &lt; b and c &gt; d</p>") == "a d"
    )


def test_tokenize_filtered_mutable_stopword_set_not_stale():
    """A mutable stopword set mutated between calls must take effect —
    the cross-call memo only applies to frozensets."""
    s = {"the"}
    assert textproc.tokenize_filtered("the cat runs", s) == ["cat", "run"]
    s.add("cat")
    assert textproc.tokenize_filtered("the cat runs", s) == ["run"]
    s.discard("cat")
    assert textproc.tokenize_filtered("the cat runs", s) == ["cat", "run"]
