"""Single-process reference-semantics oracle (tests only).

A pure-function reimplementation of the reference's index build + BM25
search (``indexer.py:58-167`` build, ``indexer.py:280-443`` search) over
in-memory dicts, sharing the exact tokenize/extract functions with the Spark
engine. The engine's distributed results are asserted rank-identical against
this oracle (FIXTURES.md §3 ``results`` invariant).

One deliberate deviation, applied identically in the engine: the reference
breaks score ties by Python ``sorted`` stability over dict insertion order
(``indexer.py:324``), which is not reproducible in a distributed engine; we
define the tie-break (score desc, doc_id asc) — see SURVEY.md §7.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from searchengine_spark.config import (
    B,
    DEFAULT_STOPWORDS,
    DESC_MATCH_BOOST,
    DESC_PHRASE_BOOST,
    K1,
    META_BOOST,
    MIN_SCORE_THRESHOLD,
    ORIGINAL_TERM_IMPORTANCE,
    PROXIMITY_BOOST,
    SNIPPET_PHRASE_BOOST,
    TITLE_BOOST,
    TITLE_MATCH_BOOST,
    TITLE_PHRASE_BOOST,
)
from searchengine_spark.functions import textproc


@dataclass
class OracleIndex:
    stopwords: frozenset = DEFAULT_STOPWORDS
    document_map: dict = field(default_factory=dict)
    inverted_index: dict = field(default_factory=lambda: defaultdict(list))
    document_lengths: dict = field(default_factory=dict)
    average_doc_length: float = 0.0

    # --- build (indexer.py:109-167) ---
    def add_document(self, url: str, title: str, meta_description: str, content: str) -> str:
        doc_id = textproc.doc_id_for_url(url)
        weighted = textproc.weighted_tokens(
            title, meta_description, content, self.stopwords, TITLE_BOOST, META_BOOST
        )
        self.document_map[doc_id] = {
            "url": url,
            "title": title,
            "description": meta_description,
            "content_snippet": textproc.make_snippet(content),
        }
        self.document_lengths[doc_id] = sum(weighted.values())
        for term, weight in weighted.items():
            self.inverted_index[term].append((doc_id, weight))
        return doc_id

    def finalize(self) -> None:
        n = len(self.document_map)
        self.average_doc_length = (
            sum(self.document_lengths.values()) / n if n else 0.0
        )

    @classmethod
    def build(cls, docs: list[dict], stopwords: frozenset = DEFAULT_STOPWORDS) -> "OracleIndex":
        """docs: [{url, title, meta_description, content}, ...]"""
        idx = cls(stopwords=stopwords)
        for d in docs:
            idx.add_document(
                d["url"], d.get("title", ""), d.get("meta_description", ""), d.get("content", "")
            )
        idx.finalize()
        return idx

    # --- search (indexer.py:280-342) ---
    def search(self, query: str, top_k: int = 20) -> list[dict]:
        if not query or query.strip() == "":
            return []
        expanded_query = textproc.expand_query(query)
        original_query = query.lower().strip()
        query_tokens = textproc.tokenize(expanded_query)
        original_query_tokens = textproc.tokenize(query)
        filtered = textproc.filter_tokens(query_tokens, self.stopwords)
        if not filtered:
            return []
        scores = self._bm25_scores(filtered, original_query_tokens, original_query)
        if scores:
            max_score = max(scores.values())
            if max_score > 0:
                scores = {d: s / max_score for d, s in scores.items()}
        # deterministic tie-break: score desc, doc_id asc
        sorted_docs = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        results = []
        for doc_id, score in sorted_docs[:top_k]:
            if doc_id in self.document_map and score > MIN_SCORE_THRESHOLD:
                info = self.document_map[doc_id]
                results.append(
                    {
                        "doc_id": doc_id,
                        "url": info["url"],
                        "title": info["title"],
                        "description": info["description"],
                        "content_snippet": textproc.relevant_snippet(
                            info["content_snippet"], original_query_tokens
                        ),
                        "score": score,
                    }
                )
        return results

    # --- scoring core (indexer.py:376-443) ---
    def _bm25_scores(
        self,
        query_tokens: list[str],
        original_query_tokens: list[str],
        original_query: str,
    ) -> dict[str, float]:
        scores: dict[str, float] = defaultdict(float)
        n_docs = len(self.document_map)
        for qt in query_tokens:
            if qt not in self.inverted_index:
                continue
            n = len(self.inverted_index[qt])
            idf = max(0.0, math.log((n_docs - n + 0.5) / (n + 0.5)))
            term_importance = (
                ORIGINAL_TERM_IMPORTANCE if qt in original_query_tokens else 1.0
            )
            for doc_id, tf in self.inverted_index[qt]:
                if doc_id in self.document_lengths:
                    dl = self.document_lengths[doc_id]
                    tf_component = ((K1 + 1) * tf) / (
                        K1 * (1 - B + B * dl / self.average_doc_length) + tf
                    )
                    scores[doc_id] += idf * tf_component * term_importance
        for doc_id in list(scores.keys()):
            info = self.document_map.get(doc_id)
            if info is None:
                continue
            title = info.get("title", "").lower()
            description = info.get("description", "").lower()
            content = info.get("content_snippet", "").lower()
            if original_query in title:
                scores[doc_id] *= TITLE_PHRASE_BOOST
            elif original_query in description:
                scores[doc_id] *= DESC_PHRASE_BOOST
            elif original_query in content:
                scores[doc_id] *= SNIPPET_PHRASE_BOOST
            title_matches = sum(1 for t in original_query_tokens if t in title)
            desc_matches = sum(1 for t in original_query_tokens if t in description)
            if original_query_tokens:
                title_pct = title_matches / len(original_query_tokens)
                desc_pct = desc_matches / len(original_query_tokens)
                if title_pct > 0:
                    scores[doc_id] *= 1.0 + title_pct * TITLE_MATCH_BOOST
                if desc_pct > 0:
                    scores[doc_id] *= 1.0 + desc_pct * DESC_MATCH_BOOST
            if len(original_query_tokens) > 1 and all(
                t in content for t in original_query_tokens
            ):
                scores[doc_id] *= PROXIMITY_BOOST
        return dict(scores)
