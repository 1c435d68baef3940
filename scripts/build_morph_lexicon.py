#!/usr/bin/env python
"""Generate the frozen morph lexicon shipped at
``efficient_query_expansion_spark/data/morph_lexicon.tsv.gz``.

The reference uses pattern.en's ``singularize``/``pluralize``
(query_expansion_support.py:50-59) — a Python-2-only library whose
inflection algorithm is the public Conway rule system ("An
Algorithmic Approach to English Pluralization", Damian Conway, 1998),
which pattern.en itself implements. This script re-implements the
rule system directly from the published rule tables (irregular
suppletives, uninflected nouns, -man/-ouse/-is/-us/-um/-on/-ex
classical inflections, o/f/y/sibilant suffix families) and freezes
its output over ~1.1k common English nouns into a (term, lemma,
plural) dimension table — BOTH directions are materialized (the
plural form is an entry whose lemma is the singular), so lemma
lookups hit the lexicon for inflected query terms too.

The engine broadcasts this table in build_part1_candidates
(expansion.py); the RuleMorph column expressions remain only as the
out-of-vocabulary fallback. Regenerate with:

    python scripts/build_morph_lexicon.py
"""

from __future__ import annotations

import gzip
import os

# --- Conway rule tables (public) -------------------------------------------

IRREGULAR = {
    "man": "men", "woman": "women", "child": "children",
    "person": "people", "foot": "feet", "tooth": "teeth",
    "goose": "geese", "mouse": "mice", "louse": "lice",
    "ox": "oxen", "die": "dice", "genie": "genii",
    "brother": "brothers", "quiz": "quizzes",
}

UNINFLECTED = {
    "sheep", "fish", "deer", "moose", "swine", "bison", "salmon",
    "trout", "series", "species", "aircraft", "spacecraft",
    "offspring", "news", "means", "barracks", "crossroads",
    "headquarters", "equipment", "information", "rice", "money",
    "scissors", "trousers", "physics", "mathematics", "economics",
    "measles", "chess", "thanks", "tennis", "advice", "housing",
    "welfare", "wealth",
}

# velar -ch (/k/ sound) takes plain -s, not -es (Conway's -ch split)
CH_S = {
    "stomach", "monarch", "epoch", "patriarch", "matriarch",
    "oligarch", "hierarch", "almanach", "loch",
}

# -is → -es (classical)
IS_ES = {
    "analysis", "basis", "crisis", "diagnosis", "ellipsis",
    "hypothesis", "oasis", "paralysis", "parenthesis", "synthesis",
    "synopsis", "thesis", "axis", "emphasis", "neurosis",
    "metamorphosis",
}

# -us → -i (classical; pattern.en keeps these classical by default)
US_I = {
    "alumnus", "cactus", "focus", "fungus", "nucleus", "radius",
    "stimulus", "syllabus", "bacillus", "locus",
}

# -um → -a
UM_A = {
    "addendum", "bacterium", "curriculum", "datum", "erratum",
    "medium", "memorandum", "millennium", "ovum", "stratum",
    "symposium", "spectrum",
}

# -on → -a
ON_A = {"criterion", "phenomenon", "automaton"}

# -ex/-ix → -ices
EX_ICES = {
    "index": "indices", "matrix": "matrices", "vertex": "vertices",
    "appendix": "appendices", "apex": "apices", "codex": "codices",
}

# -o → -oes (the closed list; everything else in -o takes -os)
O_OES = {
    "echo", "embargo", "hero", "potato", "tomato", "torpedo", "veto",
    "domino", "mosquito", "buffalo", "volcano", "tornado", "cargo",
    "mango", "motto",
}

# -f/-fe → -ves (closed list; others take plain -s: chiefs, roofs)
F_VES = {
    "calf", "elf", "half", "knife", "leaf", "life", "loaf", "self",
    "shelf", "thief", "wife", "wolf", "sheaf", "scarf", "dwarf",
    "hoof",
}

VOWELS = "aeiou"


def conway_plural(w: str) -> str:
    if w in UNINFLECTED:
        return w
    if w in IRREGULAR:
        return IRREGULAR[w]
    if w in EX_ICES:
        return EX_ICES[w]
    if w in IS_ES:
        return w[:-2] + "es"
    if w in US_I:
        return w[:-2] + "i"
    if w in UM_A or w in ON_A:
        return w[:-2] + "a"
    if w in F_VES:
        return (w[:-2] if w.endswith("fe") else w[:-1]) + "ves"
    if w.endswith("o"):
        return w + ("es" if w in O_OES else "s")
    if w.endswith("y") and len(w) > 1 and w[-2] not in VOWELS:
        return w[:-1] + "ies"
    if w in CH_S:
        return w + "s"
    if w.endswith(("s", "x", "z", "ch", "sh")):
        return w + "es"
    if w.endswith("man") and w not in ("human", "german", "ottoman"):
        return w[:-3] + "men"
    return w + "s"


# --- wordlist ---------------------------------------------------------------

WORDLIST = """
ability absence account acid action activity actor address
administration adult advance advantage advice age agency agent
agreement air airline airport alarm album alcohol alternative
ambition amount analysis analyst angle animal answer apartment
appearance apple application appointment approach area argument arm
army arrival art article artist aspect assignment assistance
assumption atmosphere attempt attention attitude audience author
authority average award awareness baby back background bag balance
ball band bank bar base baseball basis basket bath bathroom battery
battle beach bear beauty bed bedroom beer beginning belief bell
benefit bird birth birthday bit blood board boat body bone book
border boss bottle bottom box boy brain branch bread breakfast
breath brick bridge brother budget building bus business button
buyer cabinet cake calendar camera camp campaign cancer candidate
capital captain car card care career cartoon case cash cat category
cause celebration cell chain chair challenge chance change channel
chapter character charge charity chart check cheek chemical
chemistry chest chicken child chip chocolate choice church
cigarette circle citizen city claim class classroom client climate
clock cloth cloud club coach coast coat code coffee collection
college color column combination comfort command comment committee
community company comparison competition complaint computer concept
concern conclusion condition conference confidence conflict
confusion connection consequence construction contact content
contest context contract contribution control conversation cookie
copy corner cost country county couple courage course court cousin
cover cow craft cream creature credit crew crime criterion critic
culture cup currency customer cycle dad damage dance danger data
database date daughter day dealer death debate debt decision deer
defense definition degree delivery demand density department
departure deposit depth description design desire desk detail
development device diamond diet difference difficulty dinner
direction director dirt disaster discipline discussion disease dish
disk distance distribution district doctor document dog door
drama drawer drawing dream dress drink driver drug duty ear earth
economics economy edge editor education effect efficiency effort
egg election elevator emotion emphasis employee employer employment
end energy engine engineer entrance environment equipment error
escape essay estate event evidence exam example exchange excitement
exercise exit experience expert explanation expression extent eye
face fact factor factory failure faith family fan farm farmer
father fault feature fee feedback feeling field figure file film
finding finger fire firm fish flight floor flower focus food foot
force forest form formula fortune foundation frame freedom friend
front fruit fuel function fund future game gap garage garden gas
gate gene general gift girl glass goal gold golf government grade
grain grandmother grass ground group growth guard guess guest guide
guitar gun guy habit hair half hall hand handle harm hat head
health hearing heart heat height hell hello help hero highway hill
history hole holiday home homework honey hope horror horse hospital
hotel hour house housing human hunt husband ice idea image
imagination impact importance impression improvement incident
income increase independence indication industry inflation
influence information ingredient initiative injury insect inside
inspection inspector instance instruction insurance intention
interaction interest internet interview introduction investment
invitation iron island issue item jacket job judge juice key kid
king kitchen knee knife knowledge lab label lady lake language law
lawyer leader leadership league lecture leg length lesson letter
level library life light limit line link lip list literature load
loan location lock log loss love luck lunch machine magazine mail
maintenance majority mall man management manager manner
manufacturer map March margin mark market marketing marriage
match material math matter meal meaning measurement meat media
medicine medium meeting member membership memory menu message metal
method midnight milk mind minute mirror mission mistake mixture
mode model mom moment money monitor month mood morning mortgage
mother motor mountain mouse mouth move movie mud muscle music
nation nature neck negotiation nerve network news newspaper night
node noise note nothing notice novel number nurse object objective
obligation occasion offer office officer oil opening operation
opinion opportunity option orange order organization outcome oven
owner package page pain painting pair panel paper parent park
passenger passion patience patient pattern pause payment peace
penalty people percentage perception performance period person
personality perspective phase philosophy phone photo phrase physics
piano picture piece pin pipe pitch pizza place plan plane planet
plant plastic plate platform player pleasure plenty poem poet poetry
point police policy pollution pool population position possession
possibility post pot potato power practice preference preparation
presence present president pressure price pride priest principle
print priority prize problem procedure process produce product
profession professor profile profit program project promise
promotion property proposal protection psychology purpose quality
quantity quarter queen question radio rain range rate ratio
reaction reality reason receipt reception recipe recognition
recommendation record recording reference reflection refrigerator
region relation relationship relief religion remark rent repair
replacement reply report republic reputation request requirement
research resident resolution resource respect response
responsibility rest restaurant result revenue review revolution
reward rice ring risk river road rock role roof room rope rule
safety salad salary sample sandwich satisfaction scale scene
schedule scheme school science screen sea season seat secretary
section sector security selection self sense sentence series
session setting shape share shift shirt shoe shop shoulder show
side sign signal signature silver singer sister site situation
size skill skin sky sleep slice smoke snow society sock software
soil solution son song sort sound soup source space speaker
specialist speech speed spirit spite sport spot spray spring
square stability staff stage standard star start state statement
station status steak step stick stock stomach storage store storm
story stranger strategy street strength stress structure struggle
student studio study stuff style subject success suggestion summer
sun supermarket support surgery surprise survey suspect system
table tale talk tank target task tax tea teacher team technology
telephone television temperature tennis tension term test text
thanks theory thing thought throat ticket time tip title tongue
tool tooth topic total touch tour tourist towel tower town trade
tradition traffic trainer transition transportation travel
treatment tree trick trip truck trust truth tune turn type
uncle understanding union unit university user vacation value
variation variety vegetable vehicle version video view village
virus visit voice volume wall war warning watch water wave way
wealth weather wedding week weekend weight welfare wheel wife
wind window wine winner winter woman wood word worker world worry
writer writing yard year youth zone
""".split()

EXTRA = (
    sorted(IRREGULAR) + sorted(UNINFLECTED) + sorted(IS_ES)
    + sorted(US_I) + sorted(UM_A) + sorted(ON_A) + sorted(EX_ICES)
    + sorted(O_OES) + sorted(F_VES) + sorted(CH_S)
)


def _fixture_vocab() -> list[str]:
    """The engine's closed fixture/serving vocabulary (round 5): the
    hit-rate audit measured only ~30% of expansion-candidate terms
    joining the lexicon on the lifecycle fixture — the RuleMorph
    fallback, meant as the OOV exception, dominated.  Freezing the
    Conway output for the full closed vocabulary (content synonym
    groups, entity alias words, noise nouns) makes the broadcast-join
    path the rule on the corpora the engine actually serves; blind
    inflection of alias shorthands ("la" → "las") mirrors what
    pattern.en-style blind pluralization produces, so the frozen
    values stay faithful to the reference behavior
    (query_expansion_support.py:50-59)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    try:
        from efficient_query_expansion_spark.fixtures import (
            CONTENT_WORDS,
            ENTITIES,
            NOISE_WORDS,
        )
    except ImportError:
        return []
    words = set(CONTENT_WORDS) | set(NOISE_WORDS)
    words |= {
        w
        for aliases in ENTITIES.values()
        for alias in aliases
        for w in alias.split()
    }
    return sorted(w for w in words if w.isalpha() and len(w) >= 2)


def build() -> list[tuple[str, str, str]]:
    words = sorted(
        {w.lower() for w in WORDLIST} | set(EXTRA) | set(_fixture_vocab())
    )
    # a listed word that is itself the plural of another listed word
    # (data, media, criteria...) lemmatizes to that singular instead
    # of being treated as a fresh singular ("data" -> "datas" bug)
    plural_of = {
        conway_plural(w): w for w in words if conway_plural(w) != w
    }
    rows = {}
    for w in words:
        if w in plural_of:
            rows[w] = (w, plural_of[w], w)
        else:
            p = conway_plural(w)
            rows[w] = (w, w, p)
            rows.setdefault(p, (p, w, p))
    return [rows[k] for k in sorted(rows)]


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    out_dir = os.path.join(
        here, "..", "efficient_query_expansion_spark", "data"
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "morph_lexicon.tsv.gz")
    rows = build()
    with gzip.open(out, "wt", encoding="utf-8") as f:
        for term, lemma, plural in rows:
            f.write(f"{term}\t{lemma}\t{plural}\n")
    print(f"wrote {len(rows)} entries to {out}")


if __name__ == "__main__":
    main()
