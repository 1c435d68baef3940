"""Expansion-generation tests over the thesaurus fixtures
(fixtures.py §3), checking the §3.2 lifecycle: normalize →
stopword-strip (with fallback) → segment → part1/part2 candidates →
filters → grouped tags.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.expansion import (
    GreedySegmenter,
    RuleMorph,
    build_part1_candidates,
    build_part2_candidates,
    expand,
    preprocess_queries,
)
from efficient_query_expansion_spark.fixtures import (
    ENTITIES,
    STOPWORDS,
    gen_thesaurus_tables,
)


@pytest.fixture(scope="module")
def thesaurus(spark):
    pdfs = gen_thesaurus_tables()
    return {
        "segments": spark.createDataFrame(pdfs["segments"]),
        "meanings": spark.createDataFrame(pdfs["meanings"]),
        "entity_alias": spark.createDataFrame(
            pdfs["entity_alias"],
            "entity_id long, segment_id long, tags array<string>",
        ),
    }


@pytest.fixture(scope="module")
def segmenter():
    phrases = {e for e in ENTITIES} | {
        a for al in ENTITIES.values() for a in al if " " in a
    }
    return GreedySegmenter(phrases)


def test_morph_rules():
    assert RuleMorph.lemma("cars") == "car"
    assert RuleMorph.lemma("cities") == "city"
    assert RuleMorph.lemma("glass") == "glass"
    assert RuleMorph.lemma("new york cities") == "new york city"
    assert RuleMorph.pluralize("car") == "cars"
    assert RuleMorph.pluralize("city") == "cities"
    assert RuleMorph.pluralize("box") == "boxes"
    assert RuleMorph.pluralize("machine learning") == "machine learnings"


def test_segmenter(segmenter):
    assert segmenter.segment("new york pizza") == ["new york", "pizza"]
    assert segmenter.segment("machine learning in new york") == [
        "machine learning", "in", "new york",
    ]
    assert segmenter.segment("pizza") == ["pizza"]
    # longest match wins
    assert segmenter.segment("new york city limits") == [
        "new york city", "limits",
    ]


def test_preprocess_with_stopword_fallback(spark, segmenter):
    q = spark.createDataFrame(
        [(0, "the NEW YORK of pizza"), (1, "the of and")],
        "qid int, query string",
    )
    base = preprocess_queries(spark, q, segmenter, set(STOPWORDS))
    rows = sorted(
        (r["qid"], r["syn_pos"], r["term"]) for r in base.collect()
    )
    assert rows == [
        (0, 0, "new york"),
        (0, 1, "pizza"),
        (1, 0, "the"),
        (1, 1, "of"),
        (1, 2, "and"),
    ]


def test_expand_full(spark, thesaurus, segmenter):
    q = spark.createDataFrame(
        [(0, "car fast"), (1, "ny pizza"), (2, "new york")],
        "qid int, query string",
    )
    base = preprocess_queries(spark, q, segmenter, set(STOPWORDS))
    p1 = build_part1_candidates(
        spark, thesaurus["segments"], thesaurus["meanings"]
    )
    p2 = build_part2_candidates(
        thesaurus["segments"], thesaurus["entity_alias"]
    )
    out = expand(base, p1, p2)
    got = {}
    for r in out.collect():
        got.setdefault((r["qid"], r["syn_pos"]), {})[r["term"]] = list(
            r["tags"]
        )

    # qid 0: car → Syn auto/automobile + Plu cars/autos/automobiles
    car = got[(0, 0)]
    assert {"auto", "automobile", "cars", "autos", "automobiles"} <= set(
        car
    )
    assert "car" not in car  # query term filtered (P11)
    assert "Syn" in car["auto"] and "noun" in car["auto"]
    assert "Plu" in car["cars"]
    fast = got[(0, 1)]
    assert {"quick", "rapid"} <= set(fast)
    assert all("adj" in v for k, v in fast.items() if k in ("quick", "rapid"))
    # adjectives have no plurals
    assert "fasts" not in fast

    # qid 1: ny → entity aliases; "new york city" does NOT contain "ny"
    ny = got[(1, 0)]
    assert {"new york", "big apple", "new york city"} <= set(ny)
    assert (1, 1) not in got  # pizza: no thesaurus entry

    # qid 2: "new york" segment: aliases minus extensions
    nyq = got[(2, 0)]
    assert "ny" in nyq and "big apple" in nyq
    assert "new york city" not in nyq  # contains the source phrase


def test_expand_good_terms_filter(spark, thesaurus, segmenter):
    q = spark.createDataFrame([(0, "car")], "qid int, query string")
    base = preprocess_queries(spark, q, segmenter, set(STOPWORDS))
    p1 = build_part1_candidates(
        spark, thesaurus["segments"], thesaurus["meanings"]
    )
    p2 = build_part2_candidates(
        thesaurus["segments"], thesaurus["entity_alias"]
    )
    good = spark.createDataFrame(
        [("auto",), ("car",)], "term string"
    )
    out = expand(base, p1, p2, good_unary_terms=good)
    terms = {r["term"] for r in out.collect()}
    assert terms == {"auto"}  # only candidates made of good unigrams


def test_morph_column_exprs_match_python_spec(spark):
    """lemma_col / pluralize_col (JVM exprs) == RuleMorph (the spec)."""
    from efficient_query_expansion_spark.expansion import (
        RuleMorph,
        lemma_col,
        pluralize_col,
    )

    words = [
        "car", "cars", "cities", "city", "ies", "ties", "boxes", "box",
        "buses", "bus", "quizzes", "churches", "church", "wishes",
        "wish", "glass", "glasses", "ss", "s", "xs", "ches", "shes",
        "gas", "day", "days", "boy", "toy", "fly", "sky", "y", "ay",
        "man", "men", "child", "children", "wife", "wives", "sheep",
        "fish", "leaf", "leaves", "person", "people", "foot", "feet",
        "red wolf", "tall man", "big sheep",
        "fox", "buzz", "match", "dish", "hero", "new york", "red cars",
        "big cities", "hot dog", "a ses",
    ]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = df.select(
        "term",
        lemma_col("term").alias("lem"),
        pluralize_col("term").alias("plu"),
    ).collect()
    for r in got:
        assert r["lem"] == RuleMorph.lemma(r["term"]), r["term"]
        assert r["plu"] == RuleMorph.pluralize(r["term"]), r["term"]


def test_morph_lexicon_join_overrides_rules(spark):
    """F8 via dictionary table (reference
    query_expansion_support.py:50-59): a frozen pattern.en-derived
    lexicon joined as a broadcast dimension overrides RuleMorph on
    its entries (irregular lemmas/plurals RuleMorph can't produce)
    while out-of-lexicon terms keep the rule fallback."""
    # segments: 'running' should Norm-link to 'run' only via the
    # lexicon lemma; 'criterion'/'matrix' are noun synonyms whose
    # correct plurals are suppletive.
    segments = spark.createDataFrame(
        [(0, "running"), (1, "run"), (2, "criterion"), (3, "matrix"),
         (4, "boxes")],
        "segment_id long, segment string",
    )
    meanings = spark.createDataFrame(
        [
            (1, 10, "verb", 1),          # run: verb meaning, self
            (2, 20, "noun", 2), (2, 20, "noun", 3),  # criterion~matrix
            (3, 20, "noun", 2), (3, 20, "noun", 3),
            (4, 30, "noun", 4),          # boxes: noun, self
        ],
        "segment_id long, meaning_id long, pos string,"
        " syn_segment_id long",
    )
    # frozen pattern.en outputs for the fixture vocabulary
    lexicon = spark.createDataFrame(
        [
            ("running", "run", "runnings"),
            ("criterion", "criterion", "criteria"),
            ("matrix", "matrix", "matrices"),
        ],
        "term string, lemma string, plural string",
    )

    def cands(p1, term, kind):
        return sorted({
            r["cand"] for r in p1.where(
                (F.col("term") == term) & (F.col("kind") == kind)
            ).collect()
        })

    with_lx = build_part1_candidates(
        spark, segments, meanings, morph_lexicon=lexicon
    )
    # lexicon lemma links running -> run (verb Norm)
    assert cands(with_lx, "running", "Norm") == ["run"]
    # suppletive plurals come from the lexicon
    assert "criteria" in cands(with_lx, "criterion", "Plu")
    assert "matrices" in cands(with_lx, "criterion", "Plu")
    # OOV fallback: 'boxes' is not in the lexicon -> RuleMorph
    assert cands(with_lx, "boxes", "Lem") == ["box"]

    without = build_part1_candidates(spark, segments, meanings)
    # RuleMorph alone cannot link running->run or produce criteria
    assert cands(without, "running", "Norm") == []
    plu = cands(without, "criterion", "Plu")
    assert "criteria" not in plu and "criterions" in plu


def test_assemble_thesaurus_rules(spark):
    """nb 1.3 assembly rules: support filter (1-6 words, frequent,
    not all stopwords), entity keep-rule (>=2 aliases or one
    multi-word), tag merge, Hyph meaning linking key variants, and
    the output tables drive expansion.build_part1/2 directly."""
    from efficient_query_expansion_spark.expansion import (
        build_part1_candidates,
        build_part2_candidates,
    )
    from efficient_query_expansion_spark.thesaurus import (
        assemble_thesaurus,
    )

    good = spark.createDataFrame(
        [(w,) for w in
         ["big", "apple", "new", "york", "gotham", "empire", "state",
          "word", "color", "colour", "hue", "tint"]],
        "term string",
    )
    stop = spark.createDataFrame([("the",), ("of",)], "term string")
    aliases = spark.createDataFrame(
        [
            ("e1", "big apple", ["WPTit"]),
            ("e1", "new york", ["WPAli"]),
            ("e1", "new york", ["WPRed"]),        # tag merge
            ("e2", "gotham", ["WPTit"]),          # 1 single-word: drop
            ("e3", "empire state", ["WPTit"]),    # 1 multi-word: keep
            ("e4", "the of", ["WPTit"]),          # all-stopword: filtered
            ("e4", "zzrare word", ["WPAli"]),     # infrequent: filtered
        ],
        "entity_id string, alias string, tags array<string>",
    )
    oo = spark.createDataFrame(
        [
            ("color", 0, "noun", ["hue", "zzbad"], ["color", "colour"],
             [["hue"], ["zzbad"]]),
            ("zzonly", 0, "noun", ["tint"], ["zzonly"], [["tint"]]),
        ],
        "word string, meaning_idx int, pos string,"
        " synonyms array<string>, key_variants array<string>,"
        " syn_variants array<array<string>>",
    )

    th = assemble_thesaurus([aliases], oo, good, stop)
    segs = {r["segment"] for r in th["segments"].collect()}
    assert {"big apple", "new york", "empire state", "color",
            "colour", "hue"} <= segs
    assert "gotham" not in segs and "the of" not in segs
    assert "zzrare word" not in segs and "zzonly" not in segs

    ea = th["entity_alias"].collect()
    by_ent = {}
    for r in ea:
        by_ent.setdefault(r["entity_id"], []).append(r)
    assert set(by_ent) == {"e1", "e3"}
    ny = [r for r in by_ent["e1"]
          if r["tags"] == ["WPAli", "WPRed"]]
    assert len(ny) == 1  # merged provenance tags

    m = th["meanings"].collect()
    poss = {r["pos"] for r in m}
    assert poss == {"noun", "Hyph"}
    # 'zzonly' word dropped entirely (key failed support)
    seg_by_id = {r["segment_id"]: r["segment"]
                 for r in th["segments"].collect()}
    assert "tint" not in {seg_by_id.get(r["syn_segment_id"]) for r in m}
    # Hyph meaning links color <-> colour from BOTH keys
    hyph = [(seg_by_id[r["segment_id"]], seg_by_id[r["syn_segment_id"]])
            for r in m if r["pos"] == "Hyph"]
    assert set(hyph) == {
        ("color", "color"), ("color", "colour"),
        ("colour", "color"), ("colour", "colour"),
    }

    # tables drive the expansion joins directly
    p1 = build_part1_candidates(spark, th["segments"], th["meanings"])
    cands = {(r["term"], r["cand"], r["kind"])
             for r in p1.where(p1.term == "color").collect()}
    assert ("color", "hue", "Syn") in cands
    # reference quirk preserved: part1's synonym loop matches only
    # the four POS tags (query_expansion_support.py:128,180), so the
    # Hyph meaning exists in the table but never surfaces via part1
    assert ("color", "colour", "Syn") not in cands
    p2 = build_part2_candidates(th["segments"], th["entity_alias"])
    c2 = {(r["term"], r["cand"]) for r in p2.collect()}
    assert ("big apple", "new york") in c2


def test_dump_to_expansion_lifecycle(spark, tmp_path):
    """The full reference lifecycle in one chain: raw dump XML →
    bold-mention mining + redirects (nb 1.1) → tagged alias
    normalization (nb 1.2) → thesaurus assembly (nb 1.3) →
    entity expansion (nb 2.0)."""
    from efficient_query_expansion_spark.sources.wiki_markup import (
        normalized_entity_aliases,
        read_wiki_dump,
    )
    from efficient_query_expansion_spark.thesaurus import (
        assemble_thesaurus,
    )

    dump = (
        "<mediawiki>\n<page>\n<title>Apple Inc.</title>\n<id>1</id>\n"
        "<revision><id>2</id><text xml:space=\"preserve\">"
        "'''Apple''' (also '''Apple Computer''') is a company.\n"
        "== History ==\n'''ignored''' text.</text></revision>\n</page>\n"
        "<page>\n<title>AAPL</title>\n<id>7</id>\n"
        "<redirect title=\"Apple Inc.\" />\n"
        "<revision><id>8</id><text xml:space=\"preserve\" /></revision>\n"
        "</page>\n</mediawiki>\n"
    )
    (tmp_path / "dump.xml").write_text(dump)
    pages = read_wiki_dump(spark, str(tmp_path))
    aliases = normalized_entity_aliases(pages)
    got = {r["alias"]: list(r["tags"]) for r in aliases.collect()}
    assert got == {
        "apple inc": ["name"],
        "apple": ["alias"],
        "apple computer": ["alias"],
        "aapl": ["redir"],
    }

    good = spark.createDataFrame(
        [(w,) for w in ["apple", "inc", "computer", "aapl"]],
        "term string",
    )
    stop = spark.createDataFrame([("the",)], "term string")
    th = assemble_thesaurus([aliases], None, good, stop)
    p2 = build_part2_candidates(th["segments"], th["entity_alias"])

    base = spark.createDataFrame(
        [(0, 0, 0, "aapl")],
        "qid int, and_pos int, syn_pos int, term string",
    )
    out = expand(
        base,
        # no part1 thesaurus here — empty frame with the part1 shape
        spark.createDataFrame(
            [], "term string, cand string, pos string, kind string"
        ),
        p2,
    )
    cands = {r["term"] for r in out.collect()}
    assert cands == {"apple inc", "apple", "apple computer"}


def _thesaurus_rules_oracle(aliases, oo_rows, good, stop):
    """Pure-Python port of the nb 1.3 assembly rules (thesaurus.py):
    support filter, tag-merge, entity keep-rule, Hyph meanings.
    Returns (segments set, entity_alias dict, meanings set of
    (key_seg, mkey, pos, syn_seg))."""

    def supported(seg):
        ws = seg.split(" ")
        return (
            seg != ""
            and 1 <= len(ws) <= 6
            and all(w in good for w in ws)
            and not all(w in stop for w in ws)
        )

    merged = {}
    for eid, alias, tags in aliases:
        if supported(alias):
            merged.setdefault((eid, alias), set()).update(tags)
    by_ent = {}
    for (eid, alias), tags in merged.items():
        by_ent.setdefault(eid, {})[alias] = tuple(sorted(tags))
    keep = {
        eid: d
        for eid, d in by_ent.items()
        if len(d) >= 2 or (len(d) == 1 and " " in next(iter(d)))
    }
    ea = {
        (eid, alias): tags
        for eid, d in keep.items()
        for alias, tags in d.items()
    }
    segments = {alias for _, alias in ea}

    meanings = set()
    for word, idx, pos, kvs, svs in oo_rows:
        keys = sorted({k for k in kvs if supported(k)})
        mns = []
        for sv in [s for group in svs for s in group]:
            if supported(sv):
                mns.append((f"{word}#{pos}#{idx}", pos, sv))
        if len(keys) > 1:
            for k in keys:
                mns.append((f"{word}#Hyph", "Hyph", k))
        if not keys or not mns:
            continue
        for k in keys:
            for mkey, p, sv in mns:
                meanings.add((k, mkey, p, sv))
                segments.add(k)
                segments.add(sv)
    return segments, ea, meanings


@pytest.mark.parametrize("seed", [31, 47])
def test_thesaurus_assembly_structural_fuzz(spark, seed):
    """Random alias/meaning fixtures with mixed good/stop/unknown
    words vs the pure-Python rules oracle (ids resolved back to
    segment strings so the oracle needn't reimplement the hash)."""
    import random

    from efficient_query_expansion_spark.thesaurus import (
        assemble_thesaurus,
    )

    rng = random.Random(seed)
    good = {f"g{i}" for i in range(8)}
    stop = {"s0", "s1"}
    unknown = {"u0", "u1"}
    vocab = sorted(good | stop | unknown)
    good |= stop  # stopwords are frequent words too (realistic)

    def rand_seg():
        n = rng.randint(1, 3)
        return " ".join(rng.choice(vocab) for _ in range(n))

    aliases = []
    for e in range(8):
        for _ in range(rng.randint(1, 4)):
            aliases.append(
                (f"e{e}", rand_seg(), (rng.choice(["A", "B"]),))
            )
    oo_rows = []
    for w in range(5):
        kvs = [rand_seg() for _ in range(rng.randint(1, 3))]
        svs = [[rand_seg()] for _ in range(rng.randint(1, 3))]
        oo_rows.append((f"w{w}", 0, rng.choice(["noun", "verb"]), kvs,
                        svs))

    adf = spark.createDataFrame(
        [(e, a, list(t)) for e, a, t in aliases],
        "entity_id string, alias string, tags array<string>",
    )
    odf = spark.createDataFrame(
        [(w, i, p, [], kv, sv) for w, i, p, kv, sv in oo_rows],
        "word string, meaning_idx int, pos string,"
        " synonyms array<string>, key_variants array<string>,"
        " syn_variants array<array<string>>",
    )
    gdf = spark.createDataFrame([(g,) for g in sorted(good)],
                                "term string")
    sdf = spark.createDataFrame([(s,) for s in sorted(stop)],
                                "term string")

    th = assemble_thesaurus([adf], odf, gdf, sdf)
    want_segs, want_ea, want_m = _thesaurus_rules_oracle(
        aliases, oo_rows, good, stop
    )

    seg_by_id = {r["segment_id"]: r["segment"]
                 for r in th["segments"].collect()}
    assert set(seg_by_id.values()) == want_segs
    got_ea = {
        (r["entity_id"], seg_by_id[r["segment_id"]]): tuple(r["tags"])
        for r in th["entity_alias"].collect()
    }
    assert got_ea == want_ea
    got_m = {
        (seg_by_id[r["segment_id"]], r["pos"],
         seg_by_id[r["syn_segment_id"]])
        for r in th["meanings"].collect()
    }
    assert got_m == {(k, p, sv) for k, _mk, p, sv in want_m}


def test_frozen_morph_lexicon_classics_and_consistency(spark):
    """The shipped data/morph_lexicon.tsv.gz (round 4): ~2.2k Conway
    rule-system entries, classical inflections RuleMorph cannot
    produce, and internal consistency — every plural-form entry
    lemmatizes back to a singular whose plural is that form."""
    from efficient_query_expansion_spark.expansion import (
        RuleMorph,
        load_morph_lexicon,
    )

    lx = load_morph_lexicon(spark)
    rows = {r["term"]: (r["lemma"], r["plural"]) for r in lx.collect()}
    assert len(rows) >= 2000

    # classical forms beyond the suffix rules
    assert rows["datum"] == ("datum", "data")
    assert rows["data"] == ("datum", "data")
    assert rows["matrix"][1] == "matrices"
    assert rows["criterion"][1] == "criteria"
    assert rows["hero"][1] == "heroes"
    assert rows["radius"][1] == "radii"
    assert rows["analysis"][1] == "analyses"
    # RuleMorph would get these wrong — the lexicon is the fix
    assert RuleMorph.pluralize("radius") != "radii"
    assert RuleMorph.lemma("data") != "datum"

    # consistency: term is its own lemma or that lemma's plural
    for term, (lemma, plural) in rows.items():
        assert term in (lemma, plural), (term, lemma, plural)
        if lemma in rows:
            assert rows[lemma][1] == plural, (term, lemma, plural)


def test_morph_lexicon_fixture_hit_rate(spark):
    """Round-5 coverage audit: the lexicon must cover (nearly) the
    whole closed fixture vocabulary the engine's lifecycle/serving
    paths expand over — round 4 measured only ~30%, i.e. the
    RuleMorph fallback (meant as the OOV exception) dominated.  The
    generator now folds the fixture vocabulary in; hold the floor at
    95% so vocabulary growth without regeneration fails loudly."""
    from efficient_query_expansion_spark.expansion import (
        load_morph_lexicon,
    )
    from efficient_query_expansion_spark.fixtures import (
        CONTENT_WORDS,
        ENTITIES,
        NOISE_WORDS,
    )

    lx = {r["term"] for r in load_morph_lexicon(spark).collect()}
    vocab = set(CONTENT_WORDS) | set(NOISE_WORDS)
    vocab |= {
        w
        for aliases in ENTITIES.values()
        for alias in aliases
        for w in alias.split()
    }
    vocab = {w for w in vocab if w.isalpha() and len(w) >= 2}
    rate = len(vocab & lx) / len(vocab)
    assert rate >= 0.95, (
        f"lexicon hit rate {rate:.2f} on the fixture vocabulary;"
        f" regenerate via scripts/build_morph_lexicon.py"
        f" (misses: {sorted(vocab - lx)[:20]})"
    )


def test_morph_lexicon_boundary_fuzz(spark):
    """Fuzz the lexicon/fallback boundary: for every sampled lexicon
    entry the broadcast join must return the LEXICON value (even
    where RuleMorph disagrees); invented OOV terms must fall back to
    RuleMorph exactly."""
    import random

    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.expansion import (
        RuleMorph,
        _plural_of,
        _with_lemma,
        load_morph_lexicon,
    )

    lx = load_morph_lexicon(spark)
    rows = {r["term"]: (r["lemma"], r["plural"]) for r in lx.collect()}
    rng = random.Random(42)
    sample = rng.sample(sorted(rows), 200)
    oov = [f"zz{w}q" for w in sample[:50]]  # guaranteed OOV shapes
    assert not any(w in rows for w in oov)

    df = spark.createDataFrame(
        [(w,) for w in sample + oov], "term string"
    )
    got_l = {
        r["term"]: r["lemma"]
        for r in _with_lemma(df, "term", lx).collect()
    }
    got_p = {
        r["term"]: r["_plural"]
        for r in _plural_of(df, "term", lx).collect()
    }
    for w in sample:
        assert got_l[w] == rows[w][0], w
        assert got_p[w] == rows[w][1], w
    for w in oov:
        assert got_l[w] == RuleMorph.lemma(w), w
        assert got_p[w] == RuleMorph.pluralize(w), w
