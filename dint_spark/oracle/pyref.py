"""Pure-Python reference engine — a faithful re-implementation of the
reference's query semantics (NOT a copy; the reference is C++), used as
the rank-identity oracle since the reference binaries cannot be built
here (its test data blobs are absent — /root/reference/.MISSING_LARGE_BLOBS).

Semantics ported from /root/reference/include/ds2i:
  queries.hpp:29-32   — boolean ops dedup query terms
  queries.hpp:135-148 — ranked ops keep duplicates (qtf multiplier)
  queries.hpp:34-130  — and/or merge counts
  queries.hpp:309-457 — ranked_and / ranked_or top-k
  bm25.hpp:7-25       — k1=1.2, b=0.5, eps=1e-6, (1+k1) factor
  queries.hpp:150-188 — top-k heap keeps k best scores (we additionally
                        track docids with ascending-docid tie-break,
                        the documented deviation in FIXTURES.md §6)

`dtype` selects float32 (the reference's arithmetic) or float64 (for
exact rank-identity against the Spark engine's double math).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

K1 = 1.2
B = 0.5
EPS = 1e-6


class PyRefIndex:
    def __init__(self, postings: dict[str, list[tuple[int, int]]], doc_lens: dict[int, int]):
        """postings: term -> [(doc_id, tf), ...] sorted by doc_id."""
        self.postings = {
            t: sorted(lst) for t, lst in postings.items()
        }
        self.doc_lens = doc_lens
        self.num_docs = len(doc_lens)
        self.avgdl = sum(doc_lens.values()) / max(len(doc_lens), 1)

    @classmethod
    def from_tokens(cls, docs: dict[int, list[str]]) -> "PyRefIndex":
        post: dict[str, dict[int, int]] = {}
        for d, toks in docs.items():
            for t, c in Counter(toks).items():
                post.setdefault(t, {})[d] = c
        return cls(
            {t: sorted(m.items()) for t, m in post.items()},
            {d: len(toks) for d, toks in docs.items()},
        )

    # ---- boolean (terms deduped, queries.hpp:29-32) --------------------

    def and_query(self, terms: list[str]) -> int:
        ts = sorted(set(terms))
        sets = [set(d for d, _ in self.postings.get(t, [])) for t in ts]
        if not sets or any(not s for s in sets):
            return 0
        return len(set.intersection(*sets))

    def or_query(self, terms: list[str]) -> int:
        ts = sorted(set(terms))
        out: set[int] = set()
        for t in ts:
            out |= {d for d, _ in self.postings.get(t, [])}
        return len(out)

    def intersect(self, term_a: str, term_b: str) -> list[int]:
        a = {d for d, _ in self.postings.get(term_a, [])}
        b = {d for d, _ in self.postings.get(term_b, [])}
        return sorted(a & b)

    # ---- ranked (duplicates boost qtf, queries.hpp:135-148) ------------

    def _weights(self, terms: list[str], dtype):
        qtf = Counter(terms)
        out = {}
        for t, q in qtf.items():
            lst = self.postings.get(t)
            if not lst:
                continue
            df = len(lst)
            idf = np.log(
                dtype(self.num_docs - df + 0.5) / dtype(df + 0.5)
            ).astype(dtype)
            qw = dtype(q) * max(dtype(EPS), idf) * dtype(1 + K1)
            out[t] = qw
        return out

    def _scores(self, terms: list[str], dtype) -> dict[int, float]:
        qws = self._weights(terms, dtype)
        scores: dict[int, np.floating] = {}
        for t, qw in qws.items():
            for d, tf in self.postings[t]:
                L = dtype(self.doc_lens[d]) / dtype(self.avgdl)
                dtw = dtype(tf) / (dtype(tf) + dtype(K1) * (dtype(1 - B) + dtype(B) * L))
                scores[d] = scores.get(d, dtype(0)) + qw * dtw
        return scores

    def ranked_or(self, terms: list[str], k: int = 10, dtype=np.float64, round_to: int | None = 9):
        scores = self._scores(terms, dtype)
        items = [
            (float(np.round(s, round_to)) if round_to is not None else float(s), d)
            for d, s in scores.items()
        ]
        items.sort(key=lambda x: (-x[0], x[1]))
        return [(d, s) for s, d in items[:k]]

    def ranked_and(self, terms: list[str], k: int = 10, dtype=np.float64, round_to: int | None = 9):
        ts = set(terms)
        match = None
        for t in sorted(ts):
            s = {d for d, _ in self.postings.get(t, [])}
            match = s if match is None else (match & s)
            if not match:
                return []
        scores = {d: s for d, s in self._scores(terms, dtype).items() if d in match}
        items = [
            (float(np.round(s, round_to)) if round_to is not None else float(s), d)
            for d, s in scores.items()
        ]
        items.sort(key=lambda x: (-x[0], x[1]))
        return [(d, s) for s, d in items[:k]]
