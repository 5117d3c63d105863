"""Adversarial HTML extraction (T2): hand-derived bs4+lxml-semantics
oracle for `extract_text_from_html` (reference crawler.py:284-290 —
BeautifulSoup(lxml) → decompose(script/style/nav/footer/header) →
get_text() → clean_text).

bs4/lxml are absent from this environment, so each case's EXPECTED string
is derived by hand from documented parser behavior (libxml2 HTML parser +
bs4 get_text with no separator), recorded here as the per-case contract.
Where the stdlib-parser implementation and bs4+lxml are known to diverge,
the case says so explicitly.

No Spark needed — pure-function tests.
"""

import pytest

from searchengine_spark.functions.textproc import extract_text_from_html

CASES = [
    # (name, html, expected, rationale)
    (
        "gt_inside_quoted_attr",
        '<p title="a>b">x</p>',
        "x",
        "quoted attribute values may contain '>'; a naive <[^>]+> stripper "
        "splits the tag early and leaks 'b\">' into the text",
    ),
    (
        "unclosed_script_swallows_to_eof",
        "<p>keep</p><script>var a=1; <p>gone</p>",
        "keep",
        "script is a raw-text element: without a closing tag the rest of "
        "the document is script data, which decompose removes",
    ),
    (
        "unclosed_style_swallows_to_eof",
        "<p>keep</p><style>.x{color:red} <p>gone</p>",
        "keep",
        "style is raw-text like script",
    ),
    (
        "unclosed_nav_swallows_to_parent_end",
        "<p>keep</p>\n<nav><a>menu</a><p>gone</p>",
        "keep",
        "nav is unknown to libxml2's HTML4 tag table → stays open and "
        "accumulates all following siblings until its parent closes "
        "(here: EOF); decompose removes the whole swallowed subtree",
    ),
    (
        "nested_same_name_blocks",
        "<p>a</p>\n<nav>x<nav>y</nav>z</nav>\n<p>b</p>",
        "a b",
        "nested navs nest as elements; the OUTER nav's subtree covers x, "
        "the inner nav, and z — all decomposed. (The round-1 regex "
        "implementation left 'z' behind; the parser does not.)",
    ),
    (
        "lt_comparison_inside_script",
        "<script>if(a<b){x}</script><p>k</p>",
        "k",
        "script raw text may contain '<' that is not a tag",
    ),
    (
        "script_closed_by_literal_end_tag_in_string",
        '<script>var s="</script>";<p>k</p>',
        '";k',
        "BOTH bs4(lxml) and this parser close script at the FIRST "
        "'</script>' even inside a JS string (HTML parsing is not JS "
        "parsing) — the dangling '\";' becomes body text, fused with 'k' "
        "(no whitespace between the text nodes)",
    ),
    (
        "cdata_marked_section_dropped",
        "<p>a</p>\n<![CDATA[hidden]]>\n<p>b</p>",
        "a b",
        "in text/html, CDATA sections are bogus markup, not text; libxml2 "
        "drops them, as does html.parser's marked-section handling",
    ),
    (
        "uppercase_drop_element",
        "<NAV>x</NAV><p>y</p>",
        "y",
        "tag names are case-insensitive",
    ),
    (
        "unquoted_attribute_value",
        "<p class=big>x</p>",
        "x",
        "HTML permits unquoted attribute values",
    ),
    (
        "tag_splits_word_no_separator",
        "fo<b>o</b>bar",
        "foobar",
        "get_text() concatenates text nodes with NO separator — inline "
        "markup inside a word must not break the word. (The round-1 regex "
        "implementation inserted a space per tag: 'fo o bar'.)",
    ),
    (
        "unknown_entity_preserved",
        "x &nosuch; y",
        "x &nosuch; y",
        "unknown entities pass through undecoded (html5 entity table)",
    ),
    (
        "stray_close_tag_ignored",
        "</footer>kept",
        "kept",
        "an end tag with no open element is a parse no-op",
    ),
    (
        "self_closing_syntax_on_container_opens",
        "<nav/>swallowed <p>all</p>",
        "",
        "non-void HTML elements have no self-closing form — '<nav/>' is an "
        "OPEN tag in every HTML parser, so it swallows the rest",
    ),
    (
        "comment_containing_tags_dropped",
        "<p>a</p><!-- <p>ghost</p> <nav> --><p>b</p>",
        "ab",
        "comment content is never text, even when it contains markup; "
        "adjacent text nodes 'a' and 'b' fuse (no separator)",
    ),
    (
        "escaped_markup_then_clean_text",
        "<p>&lt;b&gt;bold&lt;/b&gt; word</p>",
        "bold word",
        "entities decode at parse time, so the reference's clean_text "
        "tag-strip runs on DECODED text and eats the literal <b> tags",
    ),
    (
        "decoded_inequality_forms_pseudo_tag",
        "<p>a &lt; b and c &gt; d</p>",
        "a d",
        "after decoding, '< b and c >' looks like a tag to clean_text's "
        "regex — the reference strips it (code is the spec)",
    ),
    (
        "unclosed_p_autocloses",
        "<p>a<p>b",
        "ab",
        "p auto-closes p; text nodes unaffected, no separator between them",
    ),
    (
        "attribute_order_and_noise",
        "<div data-x='1' class=\"a b\" hidden>text</div>",
        "text",
        "attribute soup must not leak",
    ),
    (
        "header_inside_dropped_nav",
        "<nav>x<header>y</header>z</nav><p>k</p>",
        "k",
        "drop-elements nested inside a dropped subtree stay dropped; the "
        "inner close tags must not resurrect the outer block",
    ),
]


@pytest.mark.parametrize("name,html,expected,_why", CASES, ids=[c[0] for c in CASES])
def test_hostile_extraction(name, html, expected, _why):
    assert extract_text_from_html(html) == expected


# -- Known divergences from real bs4+lxml, FROZEN under test -----------------
# bs4/lxml cannot be installed here, so these cases pin OUR current output
# (first expectation) while recording what BeautifulSoup(lxml) would return
# (second) and why. The list is the complete known-divergence inventory; a
# change in our output OR a new divergence class must touch this table. If
# bs4+lxml ever becomes installable, flip each case's expectation to the
# bs4 column and fix the extractor (SURVEY §7's original plan).
DIVERGENCE_PINS = [
    (
        "unclosed_nav_not_closed_by_parent_end",
        "<div><nav>menu<p>items</div>after</div>tail",
        "",  # ours: drop-depth only decrements on a matching </nav>
        "aftertail",  # bs4(lxml): </div> force-closes the open nav subtree
        "libxml2 closes an unclosed child when its PARENT closes; the "
        "event-driven twin has no element stack, so the nav swallows to "
        "EOF — over-dropping (loses text, never leaks dropped text)",
    ),
    (
        "legacy_entity_without_semicolon",
        "price &notit; here",
        "price ¬it; here",  # ours: html.unescape applies HTML5 legacy
        "price &notit; here",  # bs4(lxml): requires the semicolon form
        "convert_charrefs uses the HTML5 legacy table (&not → ¬ even "
        "mid-word, no semicolon); libxml2 decodes only ';'-terminated "
        "known entities",
    ),
    (
        "uppercase_entity_without_semicolon",
        "<p>a &LT b</p>",
        "a < b",  # ours: &LT is in the HTML5 legacy table
        "a &LT b",  # bs4(lxml): case-sensitive, semicolon required
        "same legacy-table divergence, uppercase arm; note clean_text "
        "keeps the decoded '<' because no '>' follows to form a pseudo-tag",
    ),
]


@pytest.mark.parametrize(
    "name,html,ours,_bs4,_why", DIVERGENCE_PINS, ids=[c[0] for c in DIVERGENCE_PINS]
)
def test_divergence_pins_frozen(name, html, ours, _bs4, _why):
    """Our output on the divergent inputs must not drift silently."""
    assert extract_text_from_html(html) == ours


def test_divergences_are_over_drop_or_entity_only():
    """Safety envelope of the divergence inventory: no case leaks DROPPED
    content (script/style/nav text) into the output — divergences may lose
    or keep literal text, never resurrect removed markup."""
    for _name, html, ours, bs4_out, _why in DIVERGENCE_PINS:
        for leaked in ("menu", "items", "var ", "{color"):
            assert leaked not in ours, (_name, leaked)


def test_idempotent_on_extracted_text():
    """Extraction of already-extracted plain text is the identity (modulo
    clean_text whitespace) — the property that makes the precomputed
    ``text`` column safe to re-feed through text-only pipelines."""
    for _, html, expected, _ in CASES:
        assert extract_text_from_html(expected) == expected
