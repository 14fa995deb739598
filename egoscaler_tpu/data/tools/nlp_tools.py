"""NLP tools for candidate extraction — dependency-free rebuild.

Reference: egoscaler/data/tools/nlp_tools.py (spaCy en_core_web_trf) and
the vendored SVO extractor (suject_verb_object_extraction.py).  spaCy's
transformer tagger is unavailable on zero-egress TPU hosts, so
lemmatization and SVO extraction are reimplemented rule-based, tuned for
the narrow grammar of Ego-Exo4D atomic action descriptions
("C picks up the knife with his right hand.").  A spaCy backend can be
plugged in via `set_nlp_backend` when the model assets exist locally.

Regex-only helpers (which_hand, hand_transfer_flag, process_hand_mentions,
format_description, time_str_to_sec) match the reference behavior
exactly.
"""
from __future__ import annotations

import datetime
import re
from typing import Callable, Optional, Tuple

# ---------------------------------------------------------------------------
# regex helpers (nlp_tools.py:5-8, 36-105 — behaviorally identical)
# ---------------------------------------------------------------------------

def time_str_to_sec(time_str: str) -> float:
    t = datetime.datetime.strptime(time_str, "%H:%M:%S.%f")
    return t.second + t.minute * 60 + t.hour * 3600 + t.microsecond / 1e6


def which_hand(narr: str) -> Optional[str]:
    part = re.findall(r"with ((his|her)\s)?(left|right|both)?\s?hand", narr)
    if part:
        part = part[0]
        if "left" in part:
            return "left"
        if "right" in part:
            return "right"
    return None


def is_previous_action(narr: str) -> bool:
    return bool(re.findall(r"holds|moves|places", narr))


def format_tool(tool: str) -> Optional[str]:
    found = re.findall(r"\'.*\'", tool)
    return re.sub(r"\'", "", found[0]) if found else None


def hand_transfer_flag(raw_desc: str) -> bool:
    pattern = (
        r"\bfrom (the|his|her) (right|left|both) (hand|hands) "
        r"to (the|his|her) (right|left|both) (hand|hands)\b"
    )
    return bool(re.search(pattern, raw_desc, flags=re.IGNORECASE))


def process_hand_mentions(raw_desc: str) -> str:
    p1 = (
        r"\bwith (the|his|her) (\w+(?: \w+)?) in (the|his|her) "
        r"(right|left|both) (hand|hands)\b"
    )
    raw_desc = re.sub(p1, r"with \1 \2", raw_desc, flags=re.IGNORECASE)
    p2 = r"\bwith (the|his|her)(?: (\w+(?: \w+)?))? (hand|hands)\b"
    raw_desc = re.sub(p2, "", raw_desc, flags=re.IGNORECASE)
    return re.sub(r"\s+", " ", raw_desc).strip()


def format_description(desc: str) -> str:
    desc = desc.lstrip()
    desc = re.sub(r"\s+", " ", desc)
    desc = re.sub(r"\.\s+", ".", desc)
    if not desc.endswith("."):
        desc += "."
    return desc


# ---------------------------------------------------------------------------
# lemmatizer (rule-based English morphology)
# ---------------------------------------------------------------------------

_IRREGULAR = {
    "picks": "pick", "puts": "put", "put": "put", "takes": "take",
    "took": "take", "taken": "take", "gets": "get", "got": "get",
    "goes": "go", "went": "go", "does": "do", "did": "do", "done": "do",
    "has": "have", "had": "have", "is": "be", "are": "be", "was": "be",
    "were": "be", "being": "be", "been": "be", "makes": "make",
    "made": "make", "holds": "hold", "held": "hold", "gives": "give",
    "gave": "give", "cuts": "cut", "cut": "cut", "leaves": "leave",
    "left": "leave", "keeps": "keep", "kept": "keep", "lets": "let",
    "sets": "set", "shakes": "shake", "shook": "shake", "stirs": "stir",
    "wipes": "wipe", "uses": "use", "moves": "move", "places": "place",
    "opens": "open", "closes": "close", "lifts": "lift", "drops": "drop",
    "pours": "pour", "turns": "turn", "presses": "press",
    "pushes": "push", "pulls": "pull", "slices": "slice",
    "removes": "remove", "grabs": "grab", "releases": "release",
    "his": "his", "her": "her", "its": "its", "this": "this",
    "knives": "knife", "dishes": "dish", "glasses": "glass",
    "boxes": "box", "tongs": "tong", "scissors": "scissor",
    "tomatoes": "tomato", "potatoes": "potato",
    "measuring": "measure", "tuning": "tune", "spun": "spin",
    "hung": "hang", "torn": "tear", "tore": "tear", "threw": "throw",
    "thrown": "throw", "drew": "draw", "drawn": "draw", "swept": "sweep",
    "wrung": "wring", "bent": "bend", "slid": "slide", "wore": "wear",
    "worn": "wear",
}

_KEEP_ING = {
    # -ing nouns whose stem is not a verb: never strip the suffix
    "string", "spring", "wing", "king", "thing", "something", "anything",
    "nothing", "everything", "during", "morning", "evening", "ceiling",
    "building", "earring", "icing", "awning", "railing",
}

_KEEP_S = {
    "gas", "glass", "press", "dress", "grass", "class", "pass", "less",
    "was", "is", "as", "this", "his", "its", "plus", "bus", "lens",
    "pliers", "always",
}


def lemmatize_word(w: str) -> str:
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w in _KEEP_S or len(w) <= 3:
        return w
    if w.endswith("ies") and len(w) > 4:
        if w[:-1] in _ACTION_VERBS:  # unties -> untie
            return w[:-1]
        return w[:-3] + "y"
    if w.endswith("sses") or w.endswith("ches") or w.endswith("shes") or w.endswith("xes"):
        return w[:-2]
    if w.endswith("ing") and len(w) > 5 and w not in _KEEP_ING:
        stem = w[:-3]
        if not any(ch in "aeiouy" for ch in stem):
            return w  # 'string', 'spring': -ing is part of the noun
        if stem in _ACTION_VERBS:  # rolling -> roll (not 'rol')
            return stem
        if stem + "e" in _ACTION_VERBS:  # slicing -> slice
            return stem + "e"
        if len(stem) > 2 and stem[-1] == stem[-2]:  # cutting -> cut
            return stem[:-1]
        return stem
    if w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if stem in _ACTION_VERBS:  # rolled -> roll, folded -> fold
            return stem
        if stem + "e" in _ACTION_VERBS:  # tuned -> tune, wiped -> wipe
            return stem + "e"
        if len(stem) > 2 and stem[-1] == stem[-2]:
            return stem[:-1]
        if stem.endswith(("at", "iz", "us", "ac", "v", "c")):
            return stem + "e"
        return stem
    if w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


def _clean_tokens(desc: str):
    """Shared cleanup + tokenization (nlp_tools.py:10-13 regexes plus
    n't-expansion, which spaCy's tokenizer does for the reference:
    "doesn't" -> "does" + "n't" with lemma "not")."""
    desc = re.sub(r"#. |\t|\n", "", re.sub(r"  ", " ", desc)).lower()
    desc = re.sub(r"\.\.", ".", desc)
    desc = re.sub(r"n't\b", " not", desc)
    return re.findall(r"\w+|[^\w\s]", desc)


def lemmatize_description(desc: str) -> str:
    """nlp_tools.py:10-18: cleanup + per-token lemmatization."""
    tokens = _clean_tokens(desc)
    return " ".join(lemmatize_word(t) if t.isalpha() else t for t in tokens)


# ---------------------------------------------------------------------------
# SVO extraction (pattern-based; replaces the dependency-parse extractor)
# ---------------------------------------------------------------------------

_DETERMINERS = r"(?:the |a |an |his |her |its |some |one |two |another )"
_PARTICLES = {
    "up", "down", "off", "out", "on", "in", "over", "away", "back",
    "around", "aside", "apart", "together", "open", "closed",
}
# Bare pronoun/placeholder objects: the reference RETURNS these from
# extract_verb_obj ('it' passes through, nlp_tools.py:20-34); consumers
# that need a groundable name (stage 1 candidate filter, stage-3
# annotator) filter against this set themselves.
PRONOUN_OBJECTS = frozenset({
    "it", "them", "him", "her", "something", "that", "this", "there",
})
_DET_WORDS = frozenset({
    "the", "a", "an", "his", "her", "its", "some", "one", "two",
    "another", "this", "that",
})


# Action-verb lemma lexicon used to LOCATE the verb inside a narration
# (the reference locates it with a spaCy dependency parse,
# suject_verb_object_extraction.py:155-160; rule-based extraction needs
# a lexicon instead).  Aux verbs (be/do/have) are deliberately absent so
# progressives ("c be cutting ...") and negations ("c do not pick ...")
# resolve to the content verb.
_ACTION_VERBS = frozenset(
    """pick put take get grab hold lift move place set open close cut
    slice chop dice peel stir pour mix whisk knead roll flip sprinkle
    measure rinse drain taste add remove transfer scoop crack spread dip
    grate wash wipe unscrew screw tighten loosen spin insert pump attach
    detach adjust strum pluck tune press turn swab sanitize squeeze
    shake hang lay fold carry hand walk stand sit push pull drop throw
    catch point reach release raise lower slide twist rotate bend tear
    rip break pinch tap touch rub scrub sweep brush paint drill hammer
    saw sand glue tape clip clamp wrap unwrap tie untie zip unzip plug
    unplug switch toggle weigh count check inspect examine read write
    draw erase type click connect disconnect assemble disassemble
    install mount fasten stack arrange align pat knock dust soak strain
    serve scrape ladle crush mash trim bow play pause stop start begin
    finish empty fill load unload climb kneel crouch stretch massage
    inflate deflate patch seal apply spray wring cook make use give
    keep shift lean flatten smooth season garnish toss drizzle""".split()
)

# Subject/verb boundary scan window: narrations put the verb within the
# first few tokens ("c ...", "the man ...", "c and his partner ...").
_VERB_SCAN_WINDOW = 6


# prepositions/conjunctions that end an object noun phrase
_NP_STOPS = {
    "with", "from", "to", "into", "onto", "in", "on", "at", "and",
    "then", "after", "before", "while", "using", "by", "for",
}
_SUBJECT_PRONOUNS = {"c", "i", "he", "she", "they", "we", "you", "it"}
_ADVERBS_SKIP = {
    "quickly", "slowly", "gently", "carefully", "firmly", "then",
    "immediately", "briefly", "repeatedly", "lightly", "slightly",
}


def _parse_verb_phrase(words, vi, surf=None):
    """Parse verb(+particle)+object starting at the action verb ``vi``.

    Returns (verb_with_particle, obj_words, stop_word, next_i) where
    ``stop_word`` is the preposition/conjunction that ended the object
    scan (None if the sentence ended) and ``next_i`` indexes the token
    after that stop.

    With ``surf`` (index-aligned surface tokens), gerund noun-compound
    modifiers keep their surface form: spaCy tags 'cutting' in 'cutting
    board' NOUN/compound so the reference's lemma keeps the -ing, while
    our context-free per-token lemmatizer would strip it.  A non-head
    object token whose surface ends in -ing is restored.
    """
    verb = lemmatize_word(words[vi])
    i = vi + 1
    particle = None
    if i < len(words) and words[i] in _PARTICLES:
        particle = words[i]
        i += 1
    obj_words = []
    obj_idx = []
    stop_word = None
    while i < len(words):
        lw = words[i].lower()
        if lw in _NP_STOPS:
            stop_word = lw
            i += 1
            break
        obj_words.append(lw)
        obj_idx.append(i)
        i += 1
    # "pick it up": a trailing particle after the object joins the verb.
    if obj_words and particle is None and obj_words[-1] in _PARTICLES:
        particle = obj_words.pop()
        obj_idx.pop()
    if surf is not None:
        for j, idx in enumerate(obj_idx[:-1]):  # modifiers, not the head
            if idx < len(surf) and surf[idx].endswith("ing"):
                obj_words[j] = surf[idx]
    full_verb = f"{verb} {particle}" if particle else verb
    return full_verb, obj_words, stop_word, i


def _clean_obj(obj_words) -> Optional[str]:
    """Strip determiners; empty -> None.  Bare pronouns PASS THROUGH
    (round-5 parity fix: the reference returns 'it' as an object,
    extract_verb_obj at nlp_tools.py:20-34 only strips articles) — the
    groundability filter moved to the consumers (stage 1, stage-3
    annotator), which need a namable object."""
    obj = re.sub(_DETERMINERS, "", " ".join(obj_words)).strip()
    return obj or None


def _aligned_surface(words, surface):
    """Surface tokens index-aligned with the lemma tokens, or None.

    Alignment holds exactly when per-token lemmatization of the cleaned
    surface reproduces the lemma string (always true when callers pass
    lemmatize_description(raw) + raw)."""
    toks = _clean_tokens(surface)
    lem = [lemmatize_word(t) if t.isalpha() else t for t in toks]
    if " ".join(lem).strip().rstrip(".").split() == list(words):
        return toks[: len(words)]
    return None


def extract_svos(desc: str, surface: Optional[str] = None):
    """All (verb, object) pairs from a lemmatized description.

    Rule-grammar analogue of the reference's findSVOs
    (suject_verb_object_extraction.py:285-326), covering the
    subject-verb(-particle)-object shape of atomic narrations: the
    first verb is the first action-lexicon lemma in the scan window
    (handles pronoun and multi-word subjects, adverbs, progressives);
    an immediately following particle joins it ('pick up'); the object
    is the next noun phrase up to a preposition/conjunction,
    determiners stripped.

    ``surface`` (the raw pre-lemmatization description) enables the
    morphology-dependent rules the lemma stream cannot decide alone:
    agentless-passive vs progressive ('is picked up with tongs' vs 'is
    walking with tongs' — both 'be X with Y' after lemmatization, told
    apart by the -ing suffix, spaCy's auxpass analogue) and gerund
    noun-compound preservation ('cutting board').

    Negated verbs are marked '!verb' exactly like the reference
    (findSVOs at suject_verb_object_extraction.py:302-318 prefixes
    '!' when verbNegated) — a 'not'/'never' before the verb.

    Passives role-swap like the reference is_pas branch (findSVOs
    appends (object, verb, subject) and extract_verb_obj reads slot 2):
    a 'be' immediately before the verb with no following object — and
    either a 'by' agent or sentence end after the verb phrase — yields
    (verb, passive-subject NP).

    Conjoined verbs mirror the reference _right_of_verb_is_conj_verb
    branch: 'C turns and picks up the knife' yields BOTH
    [('turn', 'knife'), ('pick up', 'knife')] — the conjunct's object
    is shared back to the first verb, matching findSVOs taking objs
    from conjV for both entries.  When the first verb has its own
    object ('C picks up the knife and cuts the onion') each verb keeps
    its own pair — a deliberate divergence from the reference, which
    maps both verbs to the second object.
    """
    words = desc.strip().rstrip(".").split()
    if len(words) < 2:
        return []
    surf = _aligned_surface(words, surface) if surface is not None else None
    # Locate the verb: first action lemma in the window (position 0
    # included for imperatives); a candidate right after a determiner is
    # a NOUN ('the cook ...', 'the saw ...') and is skipped — spaCy
    # resolves this with POS tags, a determiner never precedes a verb.
    # Fall back to the token after the subject, mirroring the
    # reference's 'I' substitution.
    vi = None
    for i in range(0, min(len(words), _VERB_SCAN_WINDOW)):
        if i > 0 and words[i - 1] in _DET_WORDS:
            continue
        if lemmatize_word(words[i]) in _ACTION_VERBS:
            vi = i
            break
    if vi is None:
        vi = 1
    verb1, obj1_words, stop1, next_i = _parse_verb_phrase(words, vi, surf)
    # negation marking (findSVOs:302-318 '!'): 'not'/'never' before the
    # verb — covers 'does not pick', "doesn't pick" (n't expanded by
    # _clean_tokens), 'never picks'
    if any(w in ("not", "never") for w in words[:vi]):
        verb1 = "!" + verb1

    # ---- passive: "the knife be pick up by c" / "the onion be be cut";
    # with surface morphology also the agentless form with a trailing
    # instrument ("the knife be pick up with tong") — a participle, where
    # a progressive ("c be walk with ...") keeps its -ing suffix
    participle = (surf is not None and vi < len(surf)
                  and not surf[vi].endswith("ing"))
    if (vi > 0 and words[vi - 1] == "be" and not obj1_words
            and (stop1 == "by" or stop1 is None
                 or (participle and stop1 in _NP_STOPS))):
        subj_words = [w for w in words[:vi - 1] if w != "be"]
        subj = _clean_obj(subj_words)
        if subj is not None and subj not in _SUBJECT_PRONOUNS:
            return [(verb1, subj)]

    svos = [(verb1, _clean_obj(obj1_words))]

    # ---- conjoined verb after 'and'/'then': parse the second phrase
    if stop1 in ("and", "then"):
        j = next_i
        while j < len(words) and words[j] in _ADVERBS_SKIP:
            j += 1
        if j < len(words) and lemmatize_word(words[j]) in _ACTION_VERBS:
            verb2, obj2_words, _, _ = _parse_verb_phrase(words, j, surf)
            obj2 = _clean_obj(obj2_words)
            if svos[0][1] is None and obj2 is not None:
                # reference shared-object semantics: conjV's object is
                # attributed to the first verb too
                svos[0] = (verb1, obj2)
            svos.append((verb2, obj2))
    return svos


def extract_verb_obj(
    desc: str, surface: Optional[str] = None
) -> Tuple[Optional[str], Optional[str]]:
    """nlp_tools.py:20-34: (verb, object) from a lemmatized description.

    The reference replaces the leading subject token with 'I', runs
    findSVOs, and reads svos[0]; this returns extract_svos(desc)[0]
    likewise.  Returns (lemmatized verb [+ particle], object) — both
    None when no verb is found, object None when absent.  Negated verbs
    are '!'-prefixed and bare-pronoun objects pass through, both
    matching the reference (round-5 parity fixes); pass ``surface``
    (the raw description) to enable the morphology-dependent passive /
    gerund-compound rules.

    Remaining documented divergences from the spaCy extractor (tests/
    test_svo_corpus.py pins each): verbs carry their particle
    (reference returns the bare verb), verb-only sentences still return
    the verb (reference returns (None, None) for 2-tuple SVs), and
    without ``surface`` the agentless-passive-with-instrument and
    gerund-compound cases stay degraded (lemma stream alone cannot
    decide them).
    """
    svos = extract_svos(desc, surface=surface)
    if not svos:
        return None, None
    return svos[0]


# optional spaCy backend
_nlp_backend: Optional[Callable] = None


def set_nlp_backend(nlp: Callable) -> None:
    """Install a spaCy pipeline for lemmatization/SVO when available."""
    global _nlp_backend
    _nlp_backend = nlp
