"""Pure-Python oracle ports of the reference featurizer loops:
featurizer_textual.pyx:72-164, featurizer_qpp.pyx:83-258,
featurizer_sigir08.pyx:34-113. Inputs are the CNF nested lists plus
plain-dict stats; float64 math (Spark outputs are float32 → compare
with 1e-6 relative tolerance).
"""

from __future__ import annotations

import math

NO_DIST = 65535


def lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        for i in range(1, la + 1):
            cur[i] = (
                prev[i - 1]
                if a[i - 1] == b[j - 1]
                else min(cur[i - 1], prev[i], prev[i - 1]) + 1
            )
        prev = cur
    return prev[la]


def textual_oracle(base_repr, exp_repr):
    """{(and_pos, syn_pos, term): [12 features]}"""
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        for sp, synset in enumerate(and_query):
            base_synset = [
                t[0].replace(" ", "") for t in base_repr[i_and][sp]
            ]
            first_base_len = len(base_synset[0]) if base_synset else 0
            for term_tags in synset:
                raw_term = term_tags[0]
                term = raw_term.replace(" ", "")
                lt = len(term)
                edit = lt + first_base_len
                pref = suff = 0
                eml = pml = sml = 0
                pmr = smr = 0.0
                elr = plr = slr = 0.0
                for base in base_synset:
                    bl = len(base)
                    ml = min(lt, bl)
                    lr = lt / bl
                    e = lev(term, base)
                    if e < edit:
                        edit, eml, elr = e, ml, lr
                    p = 0
                    for i in range(ml):
                        if term[i] == base[i]:
                            p += 1
                        else:
                            break
                    rp = p / ml
                    if rp > pmr:
                        pref, pml, pmr, plr = p, ml, rp, lr
                    s = 0
                    for i in range(1, ml + 1):
                        if term[lt - i] == base[bl - i]:
                            s += 1
                        else:
                            break
                    rs = s / ml
                    if rs > smr:
                        suff, sml, smr, slr = s, ml, rs, lr
                out[(i_and, sp, raw_term)] = [
                    lt, edit, eml, elr, pref, pml, pmr, plr,
                    suff, sml, smr, slr,
                ]
    return out


def _variability(vsum, vsq, n):
    if n <= 1 or vsum == 0:
        return 0.0
    return (vsq - vsum * vsum / n) / n


def _std_dev(vsum, vsq, n):
    if n <= 1 or vsum == 0:
        return 0.0
    return math.sqrt((vsq - vsum * vsum / n) / n)


def qpp_oracle(base_repr, exp_repr, term_stats, num_docs, tf_sum):
    """term_stats: {term: (df, tf, tf2)} → {(a, s, term): [17]}"""
    log2 = math.log2
    mult = log2(num_docs + 0.5) / log2(num_docs + 1.0)
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        baq = base_repr[i_and]
        n_and = len(baq)
        nbt = sum(len(s) for s in baq)
        # per-synset representative (max df, tie min tf)
        reps = []
        for synset in baq:
            bdf = btf = btf2 = 0
            for t in synset:
                df, tf, tf2 = term_stats.get(t[0], (0, 0, 0))
                if df > bdf or (df == bdf and tf < btf):
                    bdf, btf, btf2 = df, tf, tf2
            reps.append((bdf, btf, btf2, mult / (bdf + 1.0)))
        sum_idf = sum(r[3] for r in reps)
        sum_sq = sum(r[3] ** 2 for r in reps)
        min_idf = min(r[3] for r in reps)
        max_idf = max(r[3] for r in reps)
        sum_ictf = sum(log2(tf_sum) - log2(r[1]) for r in reps)
        css = [
            (1 + log2(r[1] + 1)) / log2(1 + num_docs / (r[0] + 1.0))
            for r in reps
        ]
        sum_qcs, max_qcs = sum(css), max(css)
        qvars = [_variability(r[1], r[2], r[0]) for r in reps]
        sum_qvar, max_qvar = sum(qvars), max(qvars)

        for sp, synset in enumerate(and_query):
            bdf, btf, btf2, bidf = reps[sp]
            bcs, bqvar = css[sp], qvars[sp]
            nb_terms = len(baq[sp])
            ns = len(synset)
            for term_tags in synset:
                term = term_tags[0]
                edf, etf, etf2 = term_stats.get(term, (0, 0, 0))
                eidf = mult / (edf + 1.0)
                std = _std_dev(
                    sum_idf - bidf + eidf,
                    sum_sq - bidf**2 + eidf**2,
                    n_and,
                )
                if bidf <= eidf:
                    emax = max_idf
                elif max_idf != bidf:
                    emax = max_idf
                else:
                    others = [r[3] for j, r in enumerate(reps) if j != sp]
                    emax = max([eidf] + others)
                emin = min(min_idf, eidf)
                if btf >= etf:
                    av_ictf = sum_ictf / n_and
                else:
                    av_ictf = (sum_ictf + log2(btf) - log2(etf)) / n_and
                ecs = (1 + log2(etf + 1)) / log2(
                    1 + num_docs / (edf + 1.0)
                )
                if bcs >= ecs:
                    eqcs, emqcs = sum_qcs, max_qcs
                else:
                    eqcs = sum_qcs - bcs + ecs
                    emqcs = max(max_qcs, ecs)
                if etf >= btf:
                    eq = _variability(etf, etf2, edf)
                    esq, emq = sum_qvar - bqvar + eq, max(max_qvar, eq)
                else:
                    esq, emq = sum_qvar, max_qvar
                out[(i_and, sp, term)] = [
                    n_and, nbt, nbt - n_and, nb_terms, ns,
                    bidf, eidf, eidf / (bidf or 1.0),
                    std, emin, emax, emax / (emin or 1.0),
                    av_ictf, eqcs, emqcs, esq, emq,
                ]
    return out


def _fraction_log(num, den):
    return math.log2(1.0 + num / (den if den > 0 else 1.0))


def sigir08_oracle(
    base_repr, exp_repr, term_stats, pair_stats, triple_stats, tf_sum
):
    """pair_stats: {(a,b) sorted: (window_tf, window_min_dist)};
    triple_stats: {(a,b,c) sorted: window_tf} → {(a,s,term): [4]}"""
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        baq = base_repr[i_and]
        base_terms = [t[0] for s in baq for t in s]
        sum_q_tf = sum(
            term_stats.get(t, (0, 0, 0))[1] for t in base_terms
        )
        nb = len(base_terms)
        nbp = nb * (nb - 1) if nb >= 2 else 0
        for sp, synset in enumerate(and_query):
            for term_tags in synset:
                term = term_tags[0]
                etf = term_stats.get(term, (0, 0, 0))[1]
                co2 = co2w = 0
                for b in base_terms:
                    key = tuple(sorted((b, term)))
                    wtf, wmd = pair_stats.get(key, (0, NO_DIST))
                    co2 += wtf
                    co2w += wtf * wmd
                co3 = 0
                if co2 > 0 and nbp > 0:
                    for b1 in base_terms:
                        for b2 in base_terms:
                            key = tuple(sorted((term, b1, b2)))
                            co3 += triple_stats.get(key, 0)
                    co3 = co3 / 2
                out[(i_and, sp, term)] = [
                    _fraction_log(etf, sum_q_tf),
                    _fraction_log(co2, nb * sum_q_tf),
                    _fraction_log(co3, nbp * sum_q_tf),
                    _fraction_log(co2w, co2),
                ]
    return out
