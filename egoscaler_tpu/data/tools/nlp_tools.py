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
    "measuring": "measure", "tuning": "tune",
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
        return w[:-3] + "y"
    if w.endswith("sses") or w.endswith("ches") or w.endswith("shes") or w.endswith("xes"):
        return w[:-2]
    if w.endswith("ing") and len(w) > 5 and w not in _KEEP_ING:
        stem = w[:-3]
        if not any(ch in "aeiouy" for ch in stem):
            return w  # 'string', 'spring': -ing is part of the noun
        if len(stem) > 2 and stem[-1] == stem[-2]:  # cutting -> cut
            return stem[:-1]
        if not stem.endswith(("e", "y")) and stem[-1] not in "aeiou":
            return stem
        return stem
    if w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2]:
            return stem[:-1]
        if stem.endswith(("at", "iz", "us", "ac", "v", "c")):
            return stem + "e"
        return stem
    if w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


def lemmatize_description(desc: str) -> str:
    """nlp_tools.py:10-18: cleanup + per-token lemmatization."""
    desc = re.sub(r"#. |\t|\n", "", re.sub(r"  ", " ", desc)).lower()
    desc = re.sub(r"\.\.", ".", desc)
    tokens = re.findall(r"\w+|[^\w\s]", desc)
    return " ".join(lemmatize_word(t) if t.isalpha() else t for t in tokens)


# ---------------------------------------------------------------------------
# SVO extraction (pattern-based; replaces the dependency-parse extractor)
# ---------------------------------------------------------------------------

_DETERMINERS = r"(?:the |a |an |his |her |its |some |one |two |another )"
_PARTICLES = {
    "up", "down", "off", "out", "on", "in", "over", "away", "back",
    "around", "aside", "apart", "together", "open", "closed",
}
_STOP_OBJECT = {
    "it", "them", "him", "her", "something", "that", "this", "there",
}


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


def extract_verb_obj(desc: str) -> Tuple[Optional[str], Optional[str]]:
    """nlp_tools.py:20-34: (verb, object) from a lemmatized description.

    The reference replaces the leading subject token with 'I' and runs a
    dependency-parse SVO extractor (suject_verb_object_extraction.py:
    285-326); our pattern grammar covers the subject-verb(-particle)-
    object shape of atomic narrations: the verb is the first
    action-lexicon lemma in the scan window (handles pronoun and
    multi-word subjects, adverbs, progressives), an immediately
    following particle joins it ('pick up'), and the object is the next
    noun phrase up to a preposition/conjunction, determiners stripped.
    Returns (lemmatized verb [+ particle], object) — both None when no
    verb is found, object None when absent or a bare pronoun.

    Documented divergences from the spaCy extractor (tests/
    test_svo_corpus.py pins each): verbs carry their particle (reference
    returns the bare verb), bare-pronoun objects map to None (reference
    returns 'it'), negation is not marked with '!', passives lose the
    object instead of swapping roles, only the first (verb, object) pair
    is returned for conjoined verbs/objects, and a subject noun that is
    also an action lemma ('the cook ...') wins the verb scan.
    """
    words = desc.strip().rstrip(".").split()
    if len(words) < 2:
        return None, None
    # Locate the verb: first action lemma in the window (position 0
    # included for imperatives); fall back to the token after the
    # subject, mirroring the reference's 'I' substitution.
    vi = None
    for i in range(0, min(len(words), _VERB_SCAN_WINDOW)):
        if lemmatize_word(words[i]) in _ACTION_VERBS:
            vi = i
            break
    if vi is None:
        vi = 1
    verb = lemmatize_word(words[vi])
    rest = words[vi + 1:]
    idx = 0
    particle = None
    if idx < len(rest) and rest[idx] in _PARTICLES:
        particle = rest[idx]
        idx += 1
    # object: next noun phrase, stopping at prepositions/conjunctions
    stops = {
        "with", "from", "to", "into", "onto", "in", "on", "at", "and",
        "then", "after", "before", "while", "using", "by", "for",
    }
    obj_words = []
    for w in rest[idx:]:
        lw = w.lower()
        if lw in stops:
            break
        obj_words.append(lw)
    # "pick it up": a trailing particle after the object joins the verb.
    if obj_words and particle is None and obj_words[-1] in _PARTICLES:
        particle = obj_words.pop()
    obj = " ".join(obj_words)
    obj = re.sub(_DETERMINERS, "", obj).strip()
    full_verb = f"{verb} {particle}" if particle else verb
    if not obj or obj in _STOP_OBJECT:
        return full_verb or None, None
    return full_verb, obj


# optional spaCy backend
_nlp_backend: Optional[Callable] = None


def set_nlp_backend(nlp: Callable) -> None:
    """Install a spaCy pipeline for lemmatization/SVO when available."""
    global _nlp_backend
    _nlp_backend = nlp
