"""Classifier + crawl predicates (plans/classify.py): native column
expressions vs reference-semantics Python, over handcrafted URLs/pages and
the generated corpus (SURVEY.md §2.2 F4/F6-F9/F11, §2.4 A7)."""

from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from searchengine_spark.plans import classify
from searchengine_spark.sources import webgen

URLS = [
    "https://alice.substack.com/p/hello",
    "https://www.medium.com/@bob/post",
    "https://me.github.io/2023/04/02/notes",
    "https://blog.bigcorp.com/announcement",
    "https://myblog.blog/entry/one",
    "https://www.irs.gov/forms",
    "https://news.ycombinator.com/item",
    "https://en.wikipedia.org/wiki/Spark",
    "https://www.youtube.com/watch?v=x",
    "https://example.com/blog/2021/hello-world",
    "https://example.com/shop/item/42",
    "https://example.com/2024/11/05/diary",
    "https://example.com/2024/3/",
    "https://example.com/about",
    "https://open.spotify.com/episode/abc",
    "https://podcasts.apple.com/us/podcast/x",
]


def _is_article_py(url: str) -> bool:
    import re

    path = urlparse(url).path.lower()
    if any(p in path for p in classify.ARTICLE_PATH_PATTERNS):
        return True
    return any(re.search(p, path) for p in classify.DATE_PATH_PATTERNS)


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_article_url_predicate(urls_df):
    got = {
        r["url"]: r["hit"]
        for r in urls_df.select(
            "url", classify.is_article_url_col(F.col("url")).alias("hit")
        ).collect()
    }
    for u in URLS:
        assert got[u] == _is_article_py(u), u


def test_domain_class_native_matches_python(urls_df):
    got = {
        r["url"]: r["cls"]
        for r in urls_df.select(
            "url", classify.domain_class_col(F.col("url")).alias("cls")
        ).collect()
    }
    for u in URLS:
        assert got[u] == classify._domain_class_py(u), u
    # spot-check the reference's precedence: blog. prefix → personal
    assert got["https://blog.bigcorp.com/announcement"] is True
    assert got["https://www.irs.gov/forms"] is False
    assert got["https://example.com/about"] is None


def test_excluded_domains(urls_df):
    got = {
        r["url"]: r["x"]
        for r in urls_df.select(
            "url", classify.excluded_domain_col(F.col("url")).alias("x")
        ).collect()
    }
    assert got["https://open.spotify.com/episode/abc"] is True
    assert got["https://podcasts.apple.com/us/podcast/x"] is True
    assert got["https://example.com/about"] is False


TEXTS = [
    "My thoughts on distributed systems, written by a human author.",
    "Product catalog page with specifications and pricing.",
    "about me: i think opinion pieces are personal. my blog, my journey.",
    "",
]


def test_content_confidence_native_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        r["c"]
        for r in df.select(
            classify.content_confidence_col(F.col("text")).alias("c")
        ).collect()
    ]
    want = [classify.content_confidence_py(t) for t in TEXTS]
    assert got == pytest.approx(want)
    assert want[2] == 0.9  # saturates at the cap


def test_hierarchical_classify_over_corpus(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(120))
    out = classify.classify_pages(pages).collect()
    assert len(out) == 120
    assert {r["method"] for r in out} <= {"domain_pattern", "header_footer", "content"}
    for r in out:
        if r["method"] == "domain_pattern":
            assert r["confidence"] == 0.9
        else:
            assert 0.5 <= r["confidence"] <= 0.9
        assert r["is_personal_blog"] is not None


def test_classify_handcrafted_pages(spark):
    pages = spark.createDataFrame(
        [
            ("https://alice.substack.com/p/1", b"<html><p>x</p></html>"),
            ("https://www.irs.gov/forms", b"<html><p>tax</p></html>"),
            (
                "https://example.com/blog/x",
                b"<html><header>about me my blog written by author "
                b"personal opinion</header><p>body</p></html>",
            ),
            ("https://example.com/shop", b"<html><p>plain product page</p></html>"),
        ],
        "url string, html binary",
    )
    got = {r["url"]: r for r in classify.classify_pages(pages).collect()}
    assert got["https://alice.substack.com/p/1"]["method"] == "domain_pattern"
    assert got["https://alice.substack.com/p/1"]["is_personal_blog"] is True
    assert got["https://www.irs.gov/forms"]["is_personal_blog"] is False
    hf = got["https://example.com/blog/x"]
    assert hf["method"] == "header_footer" and hf["confidence"] == 0.9
    shop = got["https://example.com/shop"]
    assert shop["method"] == "content"
    assert shop["is_personal_blog"] is True and shop["confidence"] == 0.65


def test_extract_links_semantics():
    html = (
        '<a href="/blog/next">n</a> <a href=\'https://other.com/p?q=1#frag\'>o</a>'
        ' <a href="mailto:x@y.z">m</a> <a name="noref">skip</a>'
        ' <a href="#section">frag-only</a>'
    )
    got = classify.extract_links("https://example.com/blog/cur", html)
    assert got == [
        "https://example.com/blog/next",
        "https://other.com/p?q=1",  # fragment dropped, query kept
        "https://example.com/blog/cur",  # "#section" resolves to self, no frag
    ]


def test_outlinks_and_frontier(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(40))
    out = classify.outlinks(pages)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["out_url"].startswith("http") and "#" not in r["out_url"] for r in rows)
    visited = pages.select("url")
    frontier = classify.crawl_frontier(pages, visited).collect()
    visited_set = {r["url"] for r in visited.collect()}
    assert all(r["url"] not in visited_set for r in frontier)


def test_domain_stats(spark):
    pdf = webgen.generate_pandas(150)
    pages = spark.createDataFrame(pdf)
    got = {r["domain"]: r["n_pages"] for r in classify.domain_stats(pages).collect()}
    import re

    want = (
        pdf["url"]
        .map(lambda u: re.search(r"https?://(?:www\.)?([^/]+)", u).group(1))
        .value_counts()
    )
    for d, n in got.items():
        assert want[d] == n


def test_classify_summary(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(60))
    rows = classify.classify_summary(pages).collect()
    assert sum(r["n_pages"] for r in rows) == 60
    assert {r["is_personal_blog"] for r in rows} <= {True, False}


def test_search_batch_exclude_domains(spark, tmp_path):
    from searchengine_spark.operators import index_build
    from searchengine_spark.plans.bm25 import BM25SearchEngine

    pdf = webgen.generate_pandas(80)
    # plant an excluded-domain page that would otherwise rank
    pdf.loc[0, "url"] = "https://open.spotify.com/episode/abc"
    pages = spark.createDataFrame(pdf)
    tables = index_build.build_index(pages)
    eng = BM25SearchEngine(spark, tables)
    qs = webgen.reference_queries()[:4]
    with_all = eng.search_batch(qs, top_k=10).collect()
    filtered = eng.search_batch(qs, top_k=10, exclude_domains=True).collect()
    assert all("spotify.com" not in r["url"] for r in filtered)
    assert len(filtered) <= len(with_all)


# --- F3: content-type filter (crawler.py:268-274) ---------------------------

def test_content_type_filter_exact_reference_predicate(spark):
    rows = [
        ("https://a.com/1", "text/html"),
        ("https://a.com/2", "TEXT/HTML; charset=utf-8"),
        ("https://a.com/3", "application/xhtml+xml"),  # reference DROPS this
        ("https://a.com/4", "application/pdf"),
        ("https://a.com/5", "image/png"),
        ("https://a.com/6", None),
    ]
    df = spark.createDataFrame(rows, "url string, content_type string")
    kept = {r["url"] for r in classify.filter_html_pages(df).collect()}
    # reference: keep iff 'text/html' in content_type.lower()
    assert kept == {"https://a.com/1", "https://a.com/2"}


def test_content_type_filter_sniffs_when_header_absent(spark):
    rows = [
        ("https://a.com/html", b"<!DOCTYPE html><html><body>x</body></html>"),
        ("https://a.com/bom", "﻿  <HTML lang=en><p>y".encode()),
        ("https://a.com/frag", b"  <div class=x>loose fragment</div>"),
        ("https://a.com/json", b'{"not": "html"}'),
        ("https://a.com/pdf", b"%PDF-1.7 stream..."),
        ("https://a.com/text", b"plain prose, no markup at all"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    kept = {r["url"] for r in classify.filter_html_pages(df).collect()}
    assert kept == {"https://a.com/html", "https://a.com/bom", "https://a.com/frag"}


def test_content_type_filter_keeps_whole_generated_corpus(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(40))
    assert classify.filter_html_pages(pages).count() == 40
