"""Pure-Python single-node oracle: tokenize → index → query → BM25.

Independent re-implementation of the engine's semantics with plain
dicts and loops — no Spark. Used by tests to assert occurrence-level
golden strings (the reference's own goldens, FIXTURES.md §3) and BM25
rank identity (BASELINE.md). Shares only the tokenizer char-class
function (that IS the spec) and the query parser (grammar is the spec);
execution logic here is deliberately naive.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from fulltextsearch_spark import BM25_B, BM25_K1
from fulltextsearch_spark.functions.tokenizer import tokenize_text
from fulltextsearch_spark.plans import parser
from fulltextsearch_spark.plans.ast import EditAst, FuncAst, WildAst, WordAst


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def wildcard_match(pattern: str, s: str) -> bool:
    """Anchored `*`/`?` glob — reference automaton semantics (D4)."""
    import fnmatch
    import re

    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern
    )
    return re.fullmatch(rx, s) is not None


@dataclass
class OracleIndex:
    postings: dict[str, list[tuple[int, int, int]]] = field(
        default_factory=lambda: defaultdict(list)
    )
    doc_len: dict[int, int] = field(default_factory=dict)

    def add(self, doc_id: int, text: str, field_id: int = 1) -> None:
        terms, _, _ = tokenize_text(text)
        for i, t in enumerate(terms):
            self.postings[t].append((doc_id, field_id, i + 1))
        self.doc_len[doc_id] = self.doc_len.get(doc_id, 0) + len(terms)

    # --- term expansion ------------------------------------------------
    def expand(self, node) -> list[str]:
        if isinstance(node, WordAst):
            return [node.value] if node.value in self.postings else []
        if isinstance(node, WildAst):
            return sorted(t for t in self.postings if wildcard_match(node.value, t))
        if isinstance(node, EditAst):
            return sorted(
                t
                for t in self.postings
                if abs(len(t) - len(node.value)) <= node.distance
                and levenshtein(t, node.value) <= node.distance
            )
        raise TypeError(node)

    # --- unranked matches (list of tuples of occurrences) ---------------
    def matches(self, node) -> list[tuple[tuple[int, int, int], ...]]:
        if isinstance(node, (WordAst, WildAst, EditAst)):
            out = []
            for t in self.expand(node):
                out.extend((occ,) for occ in self.postings[t])
            return sorted(out)
        assert isinstance(node, FuncAst)
        if node.name == "OR":
            out = []
            for a in node.args:
                out.extend(self.matches(a))
            return sorted(out)  # duplicates preserved
        if node.name == "AND":
            children = [self.matches(a) for a in node.args]
            doc_sets = [{m[0][0] for m in c} for c in children]
            qualifying = set.intersection(*doc_sets) if doc_sets else set()
            out = [m for c in children for m in c if m[0][0] in qualifying]
            return sorted(out)
        if node.name == "SEQ":
            terms = [a.value for a in node.args]
            occs = [self.postings.get(t, []) for t in terms]
            first = occs[0] if occs else []
            out = []
            for d, f, p in first:
                seq = [(d, f, p)]
                ok = True
                for i in range(1, len(terms)):
                    if (d, f, p + i) in set(occs[i]):
                        seq.append((d, f, p + i))
                    else:
                        ok = False
                        break
                if ok:
                    out.append(tuple(seq))
            return sorted(out)
        raise ValueError(node.name)

    def search(self, query: str) -> str:
        ast = parser.parse(query)
        ms = self.matches(ast)
        return ", ".join(
            "{" + ", ".join(f"[{d},{f},{p}]" for d, f, p in m) + "}" for m in ms
        )

    # --- BM25 ------------------------------------------------------------
    def _stats(self):
        n = len(self.doc_len)
        avgdl = sum(self.doc_len.values()) / n if n else 0.0
        return n, avgdl

    def _idf(self, df: int, n: int) -> float:
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _tfn(self, tf: int, dl: int, avgdl: float) -> float:
        return tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )

    def scores(self, node) -> dict[int, float]:
        n, avgdl = self._stats()
        if isinstance(node, (WordAst, WildAst, EditAst)):
            out: dict[int, float] = defaultdict(float)
            for t in self.expand(node):
                tf_by_doc: dict[int, int] = defaultdict(int)
                for d, _, _ in self.postings[t]:
                    tf_by_doc[d] += 1
                idf = self._idf(len(tf_by_doc), n)
                for d, tf in tf_by_doc.items():
                    out[d] += idf * self._tfn(tf, self.doc_len[d], avgdl)
            return dict(out)
        assert isinstance(node, FuncAst)
        if node.name == "SEQ":
            if len(node.args) == 1:
                return self.scores(node.args[0])
            ms = self.matches(node)
            tf_by_doc: dict[int, int] = defaultdict(int)
            for m in ms:
                tf_by_doc[m[0][0]] += 1
            if not tf_by_doc:
                return {}
            idf = self._idf(len(tf_by_doc), n)
            return {
                d: idf * self._tfn(tf, self.doc_len[d], avgdl)
                for d, tf in tf_by_doc.items()
            }
        children = [self.scores(a) for a in node.args]
        if node.name == "OR":
            out = defaultdict(float)
            for c in children:
                for d, s in c.items():
                    out[d] += s
            return dict(out)
        if node.name == "AND":
            docs = set.intersection(*(set(c) for c in children)) if children else set()
            return {d: sum(c[d] for c in children) for d in docs}
        raise ValueError(node.name)

    def rank(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        ast = parser.parse(query)
        s = self.scores(ast)
        return sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def corpus_oracle(texts: dict[int, str]) -> OracleIndex:
    idx = OracleIndex()
    for doc_id in sorted(texts):
        idx.add(doc_id, texts[doc_id])
    return idx
