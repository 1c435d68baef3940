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


# ---------------------------------------------------------------------------
# featurizer_custom.pyx:25-396 (71 features)
# ---------------------------------------------------------------------------

def _tfdf(term_stats, t):
    df, tf, _ = term_stats.get(t, (0, 0, 0))
    return tf, df


def _co_occ_custom(ref_pos, ref_term, baq, pair_stats, triple_stats):
    """featurizer_custom.pyx:25-89 — per-reference-term aggregates:
    (max2, max2w, max3, avg2, avg2w, avg3). triple_stats values are
    (window_tf, window_min_dist) tuples."""
    max2 = max2w = max3 = 0
    avg2 = avg2w = avg3 = 0.0
    den2 = den3 = 0
    for p1, syn1 in enumerate(baq):
        if p1 == ref_pos:
            continue
        bf = bg = 0
        den2 += len(syn1)
        for b in syn1:
            f, g = pair_stats.get(tuple(sorted((b, ref_term))), (0, 0))
            if f > bf or (f == bf and g < bg):
                bf, bg = f, g
            avg2 += f
            avg2w += f * g
        max2 += bf
        max2w += bf * bg
    if den2 > 0:
        avg2 /= den2
        avg2w /= den2
    if max2 == 0:
        return max2, max2w, 0, avg2, avg2w, 0.0
    for p1, syn1 in enumerate(baq):
        if p1 == ref_pos:
            continue
        for p2, syn2 in enumerate(baq):
            if p2 <= p1 or p2 == ref_pos:
                continue
            b3 = 0
            den3 += len(syn1) * len(syn2)
            for t1 in syn1:
                for t2 in syn2:
                    f3 = triple_stats.get(
                        tuple(sorted((ref_term, t1, t2))), (0, 0)
                    )[0]
                    if f3 > b3:
                        b3 = f3
                    avg3 += f3
            max3 += b3
    if den3 > 0:
        avg3 /= den3
    return max2, max2w, max3, avg2, avg2w, avg3


def custom_oracle(base_repr, exp_repr, term_stats, pair_stats,
                  triple_stats):
    """featurizer_custom.pyx:98-396 → {(a, s, term): [71]}.

    Faithful to the reference, including: starting_avg_max_co_occ3
    computed from co_occ2 (:267), the df-ratio guarded on starting_tf
    (:352), and the min-fold restart on df==0 (:188/:216 — callers
    should use corpus-present base terms for well-defined minima).
    """
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        baq = [[t[0] for t in s] for s in base_repr[i_and]]
        sz = len(and_query)
        szm1 = sz - 1
        syn_stats = []
        b_min_tf = b_min_df = b_max_tf = b_max_df = 0
        sum_tf_all = sum_df_all = 0
        sumsq_tf_all = sumsq_df_all = 0
        sum_max_tfs = sum_max_dfs = 0
        total_terms = 0
        b_max_n = 0
        for synset in baq:
            min_tf = min_df = max_tf = max_df = 0
            s_tf = s_df = s_tf2 = s_df2 = 0
            for b in synset:
                tf, df = _tfdf(term_stats, b)
                s_tf += tf
                s_df += df
                s_tf2 += tf * tf
                s_df2 += df * df
                if (df < min_df or (df == min_df and tf < min_tf)
                        or min_df == 0):
                    min_df, min_tf = df, tf
                if df > max_df or (df == max_df and tf > max_tf):
                    max_df, max_tf = df, tf
            n = len(synset)
            total_terms += n
            syn_stats.append((
                n, min_tf, min_df, max_tf, max_df,
                s_tf / n, s_df / n,
                math.sqrt(s_tf2 / n - s_tf ** 2 / n ** 2),
                math.sqrt(s_df2 / n - s_df ** 2 / n ** 2),
            ))
            sum_max_tfs += max_tf
            sum_max_dfs += max_df
            if n > b_max_n:
                b_max_n = n
            if (min_df < b_min_df
                    or (min_df == b_min_df and min_tf < b_min_tf)
                    or b_min_df == 0):
                b_min_df, b_min_tf = min_df, min_tf
            if (max_df > b_max_df
                    or (max_df == b_max_df and max_tf > b_max_tf)):
                b_max_df, b_max_tf = max_df, max_tf
            sum_tf_all += s_tf
            sum_df_all += s_df
            sumsq_tf_all += s_tf2
            sumsq_df_all += s_df2
        b_std_tf = math.sqrt(
            sumsq_tf_all / total_terms - sum_tf_all ** 2 / total_terms ** 2
        )
        b_std_df = math.sqrt(
            sumsq_df_all / total_terms - sum_df_all ** 2 / total_terms ** 2
        )
        b_avg_n = total_terms / sz if sz else 0.0
        b_avg_tf = sum_tf_all / total_terms if total_terms else 0.0
        b_avg_df = sum_df_all / total_terms if total_terms else 0.0

        for p, synset in enumerate(and_query):
            bsyn = baq[p]
            bmx2 = bmx2w = bmx3 = 0
            bamx2 = bamx2w = bamx3 = 0.0
            bav2 = bav2w = bav3 = 0.0
            st = None
            for b in reversed(bsyn):  # reverse order (:241)
                st = _co_occ_custom(p, b, baq, pair_stats, triple_stats)
                s2, s2w, s3, a2, a2w, a3 = st
                if s2 > bmx2 or (s2 == bmx2 and bmx2w > s2w):
                    bmx2, bmx2w = s2, s2w
                if s3 > bmx3:
                    bmx3 = s3
                bamx2 += s2
                bamx2w += s2w
                bamx3 += s3
                bav2 += a2
                bav2w += a2w
                bav3 += a3
            st_mx2, st_mx2w, st_mx3, st_av2, st_av2w, st_av3 = st
            st_tf, st_df = _tfdf(term_stats, bsyn[0])
            n = len(bsyn)
            st_amx2 = st_mx2 / szm1 if szm1 else 0.0
            st_amx2w = st_mx2w / szm1 if szm1 else 0.0
            st_amx3 = st_mx2 / szm1 if szm1 else 0.0  # ref bug :267
            d = (n * szm1) if szm1 else 1.0
            bamx2 /= d
            bamx2w /= d
            bamx3 /= d
            bav2 /= n
            bav2w /= n
            bav3 /= n
            (_, smin_tf, smin_df, smax_tf, smax_df,
             savg_tf, savg_df, sstd_tf, sstd_df) = syn_stats[p]
            for term_tags in synset:
                term = term_tags[0]
                e_tf, e_df = _tfdf(term_stats, term)
                emx2, emx2w, emx3, eav2, eav2w, eav3 = _co_occ_custom(
                    p, term, baq, pair_stats, triple_stats
                )
                eamx2 = emx2 / szm1 if szm1 else 0.0
                eamx2w = emx2w / szm1 if szm1 else 0.0
                eamx3 = emx3 / szm1 if szm1 else 0.0
                f = [0.0] * 71
                f[0] = b_avg_n
                f[1] = b_max_n
                f[2] = b_min_tf
                f[3] = b_min_df
                f[4] = b_max_tf
                f[5] = b_max_df
                f[6] = b_avg_tf
                f[7] = b_avg_df
                f[8] = b_std_tf
                f[9] = b_std_df
                f[10] = st_tf
                f[11] = st_df
                f[12] = smin_tf
                f[13] = smin_df
                f[14] = smax_tf
                f[15] = smax_df
                f[16] = savg_tf
                f[17] = savg_df
                f[18] = sstd_tf
                f[19] = sstd_df
                f[20] = st_mx2
                f[21] = st_mx2w
                f[22] = st_mx3
                f[23] = st_amx2
                f[24] = st_amx2w
                f[25] = st_amx3
                f[26] = st_av2
                f[27] = st_av2w
                f[28] = st_av3
                f[29] = bmx2
                f[30] = bmx2w
                f[31] = bmx3
                f[32] = bamx2
                f[33] = bamx2w
                f[34] = bamx3
                f[35] = bav2
                f[36] = bav2w
                f[37] = bav3
                f[38] = e_tf
                f[39] = e_df
                f[40] = e_tf / st_tf if st_tf > 0 else 0.0
                f[41] = e_df / st_df if st_tf > 0 else 0.0  # ref :352
                f[42] = e_tf * sz / sum_max_tfs if sum_max_tfs > 0 else 0.0
                f[43] = e_df * sz / sum_max_dfs if sum_max_dfs > 0 else 0.0
                if emx2 > 0:
                    f[44] = emx2
                    f[45] = emx2w
                    f[46] = emx3
                    f[47] = emx2 / st_mx2 if st_mx2 > 0 else 0.0
                    f[48] = emx2w / st_mx2w if st_mx2w > 0 else 0.0
                    f[49] = emx3 / st_mx3 if st_mx3 > 0 else 0.0
                    f[50] = emx2 / bmx2 if bmx2 > 0 else 0.0
                    f[51] = emx2w / bmx2w if bmx2w > 0 else 0.0
                    f[52] = emx3 / bmx3 if bmx3 > 0 else 0.0
                    f[53] = eamx2
                    f[54] = eamx2w
                    f[55] = eamx3
                    f[56] = eamx2 / st_amx2 if st_amx2 > 0 else 0.0
                    f[57] = eamx2w / st_amx2w if st_amx2w > 0 else 0.0
                    f[58] = eamx3 / st_amx3 if st_amx3 > 0 else 0.0
                    f[59] = eamx2 / bamx2 if bamx2 > 0 else 0.0
                    f[60] = eamx2w / bamx2w if bamx2w > 0 else 0.0
                    f[61] = eamx3 / bamx3 if bamx3 > 0 else 0.0
                    f[62] = eav2
                    f[63] = eav2w
                    f[64] = eav3
                    f[65] = eav2 / st_av2 if st_av2 > 0 else 0.0
                    f[66] = eav2w / st_av2w if st_av2w > 0 else 0.0
                    f[67] = eav3 / st_av3 if st_av3 > 0 else 0.0
                    f[68] = eav2 / bav2 if bav2 > 0 else 0.0
                    f[69] = eav2w / bav2w if bav2w > 0 else 0.0
                    f[70] = eav3 / bav3 if bav3 > 0 else 0.0
                out[(i_and, p, term)] = f
    return out


# ---------------------------------------------------------------------------
# featurizer_sigir08extended.pyx:25-375 (42 features)
# ---------------------------------------------------------------------------

def _co_occ_vecs_ext(ref_pos, ref_term, baq, pair_stats, triple_stats):
    """sigir08extended.pyx:25-92 (one reset=True call): per-other-
    synset (f, f*gap) vector and per-synset-pair triple vector;
    the triple vector is zeroed when the pair vector is all-zero."""
    vec2 = []
    any2 = False
    for p1, syn1 in enumerate(baq):
        if p1 == ref_pos:
            continue
        bf = bg = 0
        for b in syn1:
            f, g = pair_stats.get(tuple(sorted((b, ref_term))), (0, 0))
            if f > bf or (f == bf and g < bg):
                bf, bg = f, g
        vec2.append((bf, bf * bg))
        if bf > 0:
            any2 = True
    vec3 = []
    for p1, syn1 in enumerate(baq):
        if p1 == ref_pos:
            continue
        for p2, syn2 in enumerate(baq):
            if p2 <= p1 or p2 == ref_pos:
                continue
            bf = bg = 0
            for t1 in syn1:
                for t2 in syn2:
                    f3, g3 = triple_stats.get(
                        tuple(sorted((ref_term, t1, t2))), (0, 0)
                    )
                    if f3 > bf or (f3 == bf and g3 < bg):
                        bf, bg = f3, g3
            vec3.append((bf, bf * bg))
    if not any2:
        vec3 = [(0, 0)] * len(vec3)
    return vec2, vec3, any2


def _fold_vecs(vecs):
    """reset=False accumulation across base terms: per-position
    lexicographic (f, -w) max, folded from (0, 0)."""
    out = None
    for v in vecs:
        if out is None:
            out = [tuple(e) for e in v]
        else:
            for i, (f, w) in enumerate(v):
                cf, cw = out[i]
                if f > cf or (f == cf and w < cw):
                    out[i] = (f, w)
    return out or []


def _set_avg_min_max(exp_vec, base_vec):
    """sigir08extended.pyx:100-145. NOTE the reference accumulates the
    RUNNING MAX into the avg (:122/:128), not the element — replicated.
    Returns [avg_e, avg_b, avg_r, min_e, min_b, min_r,
    max_e, max_b, max_r]."""
    n = len(exp_vec)
    if n == 0:
        return [0.0] * 9
    ae = me = xe = float(exp_vec[0])
    ab = mb = xb = float(base_vec[0])
    r0 = exp_vec[0] / (base_vec[0] or 1)
    ar = mr = xr = r0
    for i in range(1, n):
        ae += xe
        if exp_vec[i] > xe:
            xe = float(exp_vec[i])
        elif exp_vec[i] < me:
            me = float(exp_vec[i])
        ab += xb
        if base_vec[i] > xb:
            xb = float(base_vec[i])
        elif base_vec[i] < mb:
            mb = float(base_vec[i])
        r = exp_vec[i] / (base_vec[i] or 1)
        ar += r
        if r > xr:
            xr = r
        elif r < mr:
            mr = r
    return [ae / n, ab / n, ar / n, me, mb, mr, xe, xb, xr]


def sigir08_extended_oracle(base_repr, exp_repr, term_stats, pair_stats,
                            triple_stats):
    """sigir08extended.pyx:152-319 → {(a, s, term): [42]}."""
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        baq = [[t[0] for t in s] for s in base_repr[i_and]]
        sz = len(baq)
        num3 = (sz - 1) * (sz - 2) // 2 if sz >= 2 else 0
        for p, synset in enumerate(and_query):
            btf = bdf = 0
            vecs2, vecs3 = [], []
            for b in baq[p]:
                tf, df = _tfdf(term_stats, b)
                if tf > btf:
                    btf = tf
                if df > bdf:
                    bdf = df
                v2, v3, _ = _co_occ_vecs_ext(
                    p, b, baq, pair_stats, triple_stats
                )
                vecs2.append(v2)
                vecs3.append(v3)
            bvec2 = _fold_vecs(vecs2)
            bvec3 = _fold_vecs(vecs3)
            for term_tags in synset:
                term = term_tags[0]
                etf, edf = _tfdf(term_stats, term)
                ev2, ev3, _ = _co_occ_vecs_ext(
                    p, term, baq, pair_stats, triple_stats
                )
                feats = [
                    edf, bdf, edf / (bdf or 1),
                    etf, btf, etf / (btf or 1),
                ]
                feats += _set_avg_min_max(
                    [v[0] for v in ev2], [v[0] for v in bvec2]
                )
                feats += _set_avg_min_max(
                    [v[1] for v in ev2], [v[1] for v in bvec2]
                )
                feats += _set_avg_min_max(
                    [v[0] for v in ev3][:num3],
                    [v[0] for v in bvec3][:num3],
                )
                feats += _set_avg_min_max(
                    [v[1] for v in ev3][:num3],
                    [v[1] for v in bvec3][:num3],
                )
                out[(i_and, p, term)] = feats
    return out


def _w2v_unit(v):
    import numpy as np

    n = math.sqrt(float(np.dot(v, v)))
    return v / n if n > 0 else v


def w2v_oracle(base_repr, exp_repr, syn0, syn1, cbow_mean=True):
    """Faithful port of _c_get_features (featurizer_w2v.pyx:61-174).

    ``syn0``/``syn1``: dict term-key → np.ndarray (float64 here; the
    reference holds float32 — compare with relative tolerance).
    Returns {(i_and, and_pos, term): [5 features]} with features in
    W2V_NAMES order (pyx:178-184).
    """
    import numpy as np

    dims = len(next(iter(syn0.values())))
    out = {}
    for i_and, and_query in enumerate(exp_repr):
        # resolve base synsets once
        base_keys = [
            [
                ("_{}_".format(t[0].replace(" ", "_"))
                 if " " in t[0] else t[0])
                for t in synset
            ]
            for synset in base_repr[i_and]
        ]
        n_syn = len(base_keys)
        base_sz = np.zeros(n_syn, dtype=np.int64)
        avg0 = np.zeros((n_syn, dims))
        avg1 = np.zeros((n_syn, dims))
        context_vectors = 0
        for p, keys in enumerate(base_keys):
            v0 = [syn0[k] for k in keys if k in syn0]
            v1 = [syn1[k] for k in keys if k in syn1]
            base_sz[p] = len(v0)
            if v0:
                avg0[p] = np.sum(v0, axis=0) / len(v0)
                avg1[p] = np.sum(v1, axis=0) / len(v1)
                context_vectors += 1
        sum0 = avg0.sum(axis=0)

        for p, synset in enumerate(and_query):
            keys = base_keys[p]
            b0n = [_w2v_unit(syn0[k]) for k in keys if k in syn0]
            b1n = [_w2v_unit(syn1[k]) for k in keys if k in syn1]
            a0n = _w2v_unit(avg0[p])
            a1n = _w2v_unit(avg1[p])
            ctx_size = context_vectors - int(base_sz[p] > 0)
            ctx = sum0 - avg0[p]
            if ctx_size > 0 and cbow_mean:
                ctx = ctx / ctx_size
            rows = []
            for term_tags in synset:
                term = term_tags[0]
                key = ("_{}_".format(term.replace(" ", "_"))
                       if " " in term else term)
                m0 = m1 = a0 = a1 = prob = 0.0
                if key in syn0:
                    if base_sz[p] > 0:
                        t0 = _w2v_unit(syn0[key])
                        t1 = _w2v_unit(syn1[key])
                        m0 = max(float(np.dot(t0, b)) for b in b0n)
                        m1 = max(float(np.dot(t1, b)) for b in b1n)
                        a0 = float(np.dot(t0, a0n))
                        a1 = float(np.dot(t1, a1n))
                    if ctx_size > 0:
                        prob = math.exp(float(np.dot(ctx, syn1[key])))
                rows.append([term, m0, a0, m1, a1, prob])
            # pyx:172-174 — per-synset normalization
            if rows:
                denom = max(sum(r[5] for r in rows), 1.0)
                for r in rows:
                    r[5] /= denom
            for r in rows:
                out[(i_and, p, r[0])] = r[1:]
    return out
