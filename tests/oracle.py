"""Pure-Python reference implementation (the test oracle).

Naive, obviously-correct BM25 over a dict-of-lists inverted index,
with the same analyzer, same parameters (k1=1.2, b=0.75, Lucene idf)
and the same tie-break (score desc, doc_id asc). The Ray engine must be
rank-identical with |Δscore| < 1e-6 (SURVEY.md §5 "our plan").
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer


class OracleIndex:
    def __init__(self, cfg: AnalyzerConfig | None = None, k1: float = 1.2, b: float = 0.75):
        self.analyzer = get_analyzer(cfg or AnalyzerConfig())
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.dl: dict[int, int] = {}

    def add(self, doc_id: int, text: str) -> None:
        toks = self.analyzer(text)
        if not toks:
            return
        self.dl[doc_id] = len(toks)
        for t, tf in Counter(toks).items():
            self.postings[t][doc_id] = tf

    @property
    def n_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / len(self.dl) if self.dl else 0.0

    def score(self, query: str) -> dict[int, float]:
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = defaultdict(float)
        for t in sorted(set(self.analyzer(query))):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = math.log1p((n - len(plist) + 0.5) / (len(plist) + 0.5))
            for d, tf in plist.items():
                denom = tf + self.k1 * (1 - self.b + self.b * self.dl[d] / avgdl)
                scores[d] += idf * tf * (self.k1 + 1) / denom
        return dict(scores)

    def topk(self, query: str, k: int) -> list[tuple[int, float]]:
        scores = self.score(query)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
