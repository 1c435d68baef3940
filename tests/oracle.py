"""Brute-force collection-stats oracle.

An exhaustive O(n³)-per-document recomputation of term / pair / triple
stats, written independently of the engine code, mirroring the test
oracle of the reference (lib/cython/collection_stats/tests/main.cpp:
228-306). Used to verify both the relational and the mapInPandas scan
paths.
"""

from __future__ import annotations

from collections import Counter

NO_DIST = 65535


def doc_matches(tokens: list[str], patterns: set[str] | None = None):
    """(pattern, start, end) occurrences; patterns=None → every token."""
    if patterns is None:
        return [(t, i, i) for i, t in enumerate(tokens)]
    lengths = sorted({len(p.split(" ")) for p in patterns})
    out = []
    for n in lengths:
        for i in range(len(tokens) - n + 1):
            gram = " ".join(tokens[i : i + n])
            if gram in patterns:
                out.append((gram, i, i + n - 1))
    return out


def brute_doc_stats(
    matches: list[tuple[str, int, int]],
    window_pairs: int,
    window_triples: int,
    unwindowed: bool = False,
):
    """Exhaustive per-doc scan. Matches sorted by (end asc, len desc)
    i.e. (end, start desc) — ties with longer pattern first."""
    matches = sorted(matches, key=lambda t: (t[2], t[1]))
    n = len(matches)
    terms = Counter(m[0] for m in matches)
    pairs: dict[tuple, list] = {}
    triples: dict[tuple, list] = {}
    for l in range(n):
        for r in range(n):
            if r <= l:
                continue
            l_pat, l_start, l_end = matches[l]
            r_pat, r_start, r_end = matches[r]
            if l_end >= r_start:
                continue
            window = r_end - l_start + 1
            if window <= window_pairs:
                key = tuple(sorted((l_pat, r_pat)))
                gap = r_start - l_end - 1
                e = pairs.setdefault(key, [0, NO_DIST])
                e[0] += 1
                e[1] = min(e[1], gap)
            if window <= window_triples:
                for m_i in range(l + 1, r):
                    m_pat, m_start, m_end = matches[m_i]
                    if l_end >= m_start or m_end >= r_start:
                        continue
                    key = tuple(sorted((l_pat, m_pat, r_pat)))
                    gap = (r_start - m_end) + (m_start - l_end) - 2
                    e = triples.setdefault(key, [0, NO_DIST])
                    e[0] += 1
                    e[1] = min(e[1], gap)
    if unwindowed:
        present = sorted(terms)
        for i, a in enumerate(present):
            for b in present[i + 1 :]:
                pairs.setdefault((a, b), [0, NO_DIST])
    return terms, pairs, triples


def brute_corpus_stats(
    docs_tokens: list[list[str]],
    window_pairs: int = 12,
    window_triples: int = 15,
    patterns: set[str] | None = None,
    unwindowed: bool = False,
):
    """Global stats dicts:
    term  → (df, tf, tf2)
    pair  → (df, window_df, window_tf, window_tf2, window_min_dist)
    triple→ (window_df, window_tf, window_tf2, window_min_dist)
    """
    term_g: dict[str, list] = {}
    pair_g: dict[tuple, list] = {}
    triple_g: dict[tuple, list] = {}
    for tokens in docs_tokens:
        matches = doc_matches(tokens, patterns)
        terms, pairs, triples = brute_doc_stats(
            matches, window_pairs, window_triples, unwindowed
        )
        for t, c in terms.items():
            e = term_g.setdefault(t, [0, 0, 0])
            e[0] += 1
            e[1] += c
            e[2] += c * c
        for key, (w, g) in pairs.items():
            e = pair_g.setdefault(key, [0, 0, 0, 0, NO_DIST])
            # df field accumulates only in unwindowed mode (the engine's
            # DISABLE_UNWINDOWED build leaves df=0 — hpp:1798)
            e[0] += 1 if unwindowed else 0
            e[1] += 1 if w > 0 else 0
            e[2] += w
            e[3] += w * w
            e[4] = min(e[4], g)
        for key, (w, g) in triples.items():
            e = triple_g.setdefault(key, [0, 0, 0, NO_DIST])
            e[0] += 1 if w > 0 else 0
            e[1] += w
            e[2] += w * w
            e[3] = min(e[3], g)
    return (
        {k: tuple(v) for k, v in term_g.items()},
        {k: tuple(v) for k, v in pair_g.items()},
        {k: tuple(v) for k, v in triple_g.items()},
    )
