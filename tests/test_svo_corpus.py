"""SVO / lemmatizer behavior corpus: ~100 Ego-Exo4D-style narrations.

The reference extracts (verb, object) with a spaCy dependency parse
(suject_verb_object_extraction.py:285-326 via nlp_tools.py:20-34); the
rebuild uses a rule grammar (data/tools/nlp_tools.extract_verb_obj).
This corpus pins the grammar's behavior over the narration shapes the
stage-1 pipeline actually sees (1_get_candidate.py:66-67 runs
``extract_verb_obj(lemmatize_description(desc))``): phrasal verbs,
compound and prep-embedded objects, conjunctions, pronoun and
multi-word subjects, progressives — plus an explicit section pinning
the DOCUMENTED failure classes where the grammar diverges from the
dependency parser (negation, passives, conjoined verbs, bare-pronoun
objects, verb-ambiguous subject nouns, gerund-compound lemmas).
"""
import pytest

from egoscaler_tpu.data.tools.nlp_tools import (
    extract_verb_obj,
    lemmatize_description,
)


def svo(raw: str):
    # the stage-1 call shape (1_get_candidate.py:66-67 analogue):
    # lemmatized stream + raw surface for morphology-dependent rules
    return extract_verb_obj(lemmatize_description(raw), surface=raw)


def svo_lemma_only(raw: str):
    # legacy call shape without the surface stream (pipelines/llm.py
    # style callers that only hold lemmatized text)
    return extract_verb_obj(lemmatize_description(raw))


# (raw narration, expected verb [incl. particle], expected object)
CORPUS = [
    # --- simple SVO, cooking scenario ---
    ("C picks up the knife.", "pick up", "knife"),
    ("C puts down the spoon.", "put down", "spoon"),
    ("C cuts the onion.", "cut", "onion"),
    ("C slices the tomato.", "slice", "tomato"),
    ("C stirs the soup.", "stir", "soup"),
    ("C pours the water into the pot.", "pour", "water"),
    ("C opens the fridge.", "open", "fridge"),
    ("C closes the drawer.", "close", "drawer"),
    ("C grabs a towel.", "grab", "towel"),
    ("C wipes the counter with a cloth.", "wipe", "counter"),
    ("C peels the potato.", "peel", "potato"),
    ("C chops the carrots.", "chop", "carrot"),
    ("C places the pan on the stove.", "place", "pan"),
    ("C lifts the lid.", "lift", "lid"),
    ("C shakes the bottle.", "shake", "bottle"),
    ("C squeezes the lemon.", "squeeze", "lemon"),
    ("C mixes the batter.", "mix", "batter"),
    ("C whisks the eggs.", "whisk", "egg"),
    ("C kneads the dough.", "knead", "dough"),
    ("C rolls the dough with a rolling pin.", "roll", "dough"),
    ("C flips the pancake.", "flip", "pancake"),
    ("C sprinkles some salt.", "sprinkle", "salt"),
    ("C measures the flour with a measuring cup.", "measure", "flour"),
    ("C rinses the rice.", "rinse", "rice"),
    ("C drains the pasta.", "drain", "pasta"),
    ("C tastes the sauce.", "taste", "sauce"),
    ("C adds the sugar to the bowl.", "add", "sugar"),
    ("C removes the pot from the stove.", "remove", "pot"),
    ("C holds the bowl with both hands.", "hold", "bowl"),
    ("C transfers the rice into a plate.", "transfer", "rice"),
    ("C scoops the ice cream.", "scoop", "ice cream"),
    ("C cracks an egg.", "crack", "egg"),
    ("C spreads the butter on the bread.", "spread", "butter"),
    ("C dips the brush in the paint.", "dip", "brush"),
    ("C grates the cheese.", "grate", "cheese"),
    ("C washes the dishes.", "wash", "dish"),
    ("C mashes the potatoes.", "mash", "potato"),
    ("C serves the food.", "serve", "food"),
    ("C crushes the garlic.", "crush", "garlic"),
    ("C dices the pepper.", "dice", "pepper"),
    # --- phrasal verbs / particles ---
    ("C picks up a piece of wood.", "pick up", "piece of wood"),
    ("C puts down the bottle of water.", "put down", "bottle of water"),
    ("C takes off the gloves.", "take off", "glove"),
    ("C sets aside the bowl.", "set aside", "bowl"),
    ("C takes out the trash.", "take out", "trash"),
    ("C puts back the jar.", "put back", "jar"),
    ("C hangs up the towel.", "hang up", "towel"),
    ("C lays out the ingredients.", "lay out", "ingredient"),
    ("C opens up the package.", "open up", "package"),
    ("C turns on the tap.", "turn on", "tap"),
    ("C turns off the stove.", "turn off", "stove"),
    ("C puts on the lid.", "put on", "lid"),
    # trailing particle rejoins the verb; pronoun object passes through
    # like the reference (round-5 parity fix)
    ("C picks it up.", "pick up", "it"),
    ("C stands up.", "stand up", None),
    # --- bike repair scenario ---
    ("C unscrews the bolt.", "unscrew", "bolt"),
    ("C tightens the screw with a screwdriver.", "tighten", "screw"),
    ("C loosens the nut with a wrench.", "loosen", "nut"),
    ("C spins the wheel.", "spin", "wheel"),
    ("C removes the tire from the rim.", "remove", "tire"),
    ("C inserts the tire lever.", "insert", "tire lever"),
    ("C pumps the tire.", "pump", "tire"),
    ("C attaches the chain.", "attach", "chain"),
    ("C adjusts the brake.", "adjust", "brake"),
    ("C flips the bike.", "flip", "bike"),
    ("C patches the inner tube.", "patch", "inner tube"),
    # --- music scenario ---
    ("C strums the guitar.", "strum", "guitar"),
    ("C plucks the string.", "pluck", "string"),
    ("C tunes the guitar.", "tune", "guitar"),
    ("C presses the keys on the piano.", "press", "key"),
    ("C holds the violin bow.", "hold", "violin bow"),
    ("C tightens the guitar strings.", "tighten", "guitar string"),
    # --- health / covid-test scenario ---
    ("C opens the test kit.", "open", "test kit"),
    ("C swabs her nose.", "swab", "nose"),
    ("C squeezes the tube.", "squeeze", "tube"),
    ("C shakes the vial.", "shake", "vial"),
    ("C peels off the sticker.", "peel off", "sticker"),
    ("C sanitizes his hands.", "sanitize", "hand"),
    # --- non-'C' subjects (pronouns, multi-word NPs) ---
    ("She picks up the pan.", "pick up", "pan"),
    ("He pours the oil into the wok.", "pour", "oil"),
    ("The man lifts the box.", "lift", "box"),
    ("The woman cuts the fabric.", "cut", "fabric"),
    ("They move the table.", "move", "table"),
    ("The chef slices the bread.", "slice", "bread"),
    ("C and his partner lift the table.", "lift", "table"),
    # --- compound objects / longer sentences ---
    ("C picks up the guitar string.", "pick up", "guitar string"),
    ("C moves the chess piece.", "move", "chess piece"),
    ("C lifts the water bottle.", "lift", "water bottle"),
    ("C holds the phone with her left hand.", "hold", "phone"),
    ("C pours the batter into the pan on the stove.", "pour", "batter"),
    ("C takes the towel from the rack.", "take", "towel"),
    ("C puts the knife into the drawer.", "put", "knife"),
    ("C places the cup onto the saucer.", "place", "cup"),
    ("C carries the tray to the table.", "carry", "tray"),
    ("C hands the plate to the customer.", "hand", "plate"),
    ("C folds the piece of paper.", "fold", "piece of paper"),
    ("C cuts the vegetables on the cutting board.", "cut", "vegetable"),
    # --- determiners / quantifiers stripped ---
    ("C picks up two onions.", "pick up", "onion"),
    ("C opens another box.", "open", "box"),
    ("C shakes his head.", "shake", "head"),
    ("C grabs one apple.", "grab", "apple"),
    # --- conjunction objects: first pair wins (matches svos[0]) ---
    ("C picks up the knife and the fork.", "pick up", "knife"),
    ("C grabs the bolt and the washer.", "grab", "bolt"),
    # --- progressives resolve to the content verb ---
    ("C is cutting the onion.", "cut", "onion"),
    ("C is holding the camera.", "hold", "camera"),
    # --- verb-only narrations ---
    ("C stirs.", "stir", None),
    ("C walks to the table.", "walk", None),
    ("C kneels down.", "kneel down", None),
    # --- adverbs between subject and verb ---
    ("C quickly grabs the handle.", "grab", "handle"),
    ("C gently places the glass.", "place", "glass"),
    # --- passives: role swap recovers the object (round-4 fix;
    # reference is_pas branch appends (obj, verb, subj) and
    # extract_verb_obj reads slot 2 -> the passive subject) ---
    ("The knife is picked up by C.", "pick up", "knife"),
    ("The onion is being cut.", "cut", "onion"),
    ("The bowl is placed by the man.", "place", "bowl"),
    ("The dough is rolled by C.", "roll", "dough"),
    ("The bolt is tightened by the mechanic.", "tighten", "bolt"),
    ("The guitar is tuned by C.", "tune", "guitar"),
    ("The towel is folded.", "fold", "towel"),
    ("The lid is removed by her.", "remove", "lid"),
    ("The wheel is spun by C.", "spin", "wheel"),
    ("The table is wiped.", "wipe", "table"),
    # --- conjoined verbs: both pairs extracted; svos[0] carries the
    # shared object like the reference conjV branch (round-4 fix) ---
    ("C turns and picks up the knife.", "turn", "knife"),
    ("C stands up and grabs the towel.", "stand up", "towel"),
    ("C reaches and takes the bottle.", "reach", "bottle"),
    ("C turns and opens the drawer.", "turn", "drawer"),
    ("C leans and picks up the wrench.", "lean", "wrench"),
    ("C turns around and lifts the box.", "turn around", "box"),
    # --- first verb keeps its own object when it has one ---
    ("C picks up the knife and cuts the onion.", "pick up", "knife"),
    ("C opens the fridge and takes the milk.", "open", "fridge"),
    ("C grabs the pan and places it on the stove.", "grab", "pan"),
    ("C lifts the lid and stirs the soup.", "lift", "lid"),
    # --- more everyday narrations (breadth) ---
    ("C zips up the bag.", "zip up", "bag"),
    ("C unzips the pouch.", "unzip", "pouch"),
    ("C plugs in the charger.", "plug in", "charger"),
    ("C unplugs the cable.", "unplug", "cable"),
    ("C wraps the sandwich in foil.", "wrap", "sandwich"),
    ("C unwraps the package.", "unwrap", "package"),
    ("C ties the shoelace.", "tie", "shoelace"),
    ("C unties the knot.", "untie", "knot"),
    ("C stacks the plates.", "stack", "plate"),
    ("C arranges the flowers in the vase.", "arrange", "flower"),
    ("C sweeps the floor with a broom.", "sweep", "floor"),
    ("C scrubs the pan.", "scrub", "pan"),
    ("C soaks the beans in water.", "soak", "bean"),
    ("C strains the stock.", "strain", "stock"),
    ("C scrapes the bowl with a spatula.", "scrape", "bowl"),
    ("C ladles the soup into the bowl.", "ladle", "soup"),
    ("C trims the stems.", "trim", "stem"),
    ("C drizzles the olive oil on the salad.", "drizzle", "olive oil"),
    ("C tosses the salad.", "toss", "salad"),
    ("C seasons the chicken.", "season", "chicken"),
    ("C garnishes the plate.", "garnish", "plate"),
    ("C weighs the flour on the scale.", "weigh", "flour"),
    ("C loads the dishwasher.", "load", "dishwasher"),
    ("C empties the bin.", "empty", "bin"),
    ("C fills the kettle with water.", "fill", "kettle"),
    ("C mounts the shelf on the wall.", "mount", "shelf"),
    ("C drills a hole in the wall.", "drill", "hole"),
    ("C hammers the nail.", "hammer", "nail"),
    ("C clamps the board.", "clamp", "board"),
    ("C glues the pieces together.", "glue together", "piece"),
    ("C tapes the box.", "tape", "box"),
    ("C paints the fence.", "paint", "fence"),
    ("C sands the edge of the plank.", "sand", "edge of plank"),
]


@pytest.mark.parametrize("raw,verb,obj", CORPUS, ids=[c[0] for c in CORPUS])
def test_svo_corpus(raw, verb, obj):
    assert svo(raw) == (verb, obj)


def test_corpus_size_and_coverage():
    """The corpus stays ≥150 narrations with the coverage classes the
    round-2/round-3 verdicts asked for."""
    assert len(CORPUS) >= 150
    raws = " ".join(c[0].lower() for c in CORPUS)
    assert "picks up" in raws and "puts down" in raws  # phrasal verbs
    assert "and the" in raws                           # conjoined objects
    assert "she picks" in raws and "they move" in raws  # pronoun subjects
    assert "piece of wood" in raws                     # prep-embedded NP
    assert "is picked up by" in raws                   # passives (fixed r4)
    assert "turns and picks up" in raws                # conjoined verbs (r4)


# ---------------------------------------------------------------------------
# Formerly-documented failure classes.  Rounds 4-5 fixed every class the
# round-3/round-4 verdicts enumerated; each test pins the FIXED behavior
# (and, where the fix needs the surface stream, also pins the lemma-only
# degradation so that call shape stays honest).


def test_negation_marked_fixed():
    """Round-5 fix: negated verbs are '!'-marked exactly like the
    reference (findSVOs '!'+lemma when verbNegated,
    suject_verb_object_extraction.py:302-318).  Contractions expand to
    'not' first (spaCy tokenizes "doesn't" -> "does"+"n't")."""
    assert svo("C does not pick up the knife.") == ("!pick up", "knife")
    assert svo("C doesn't cut the onion.") == ("!cut", "onion")
    assert svo("C never touches the dial.") == ("!touch", "dial")
    # stage 1 drops negated candidates (a non-action): consumer-side
    from egoscaler_tpu.data.tools.nlp_tools import PRONOUN_OBJECTS

    assert "it" in PRONOUN_OBJECTS  # consumers share one filter set


def test_passive_role_swap_fixed():
    """Round-4 fix: passives now role-swap like the reference is_pas
    branch (findSVOs appends (obj, verb, subj); extract_verb_obj reads
    slot 2 -> the passive subject becomes the object)."""
    assert svo("The knife is picked up by C.") == ("pick up", "knife")
    assert svo("The onion is being cut.") == ("cut", "onion")


def test_agentless_passive_with_instrument_fixed():
    """Round-5 fix: with the surface stream, the participle suffix
    disambiguates the agentless passive from a progressive (spaCy's
    auxpass analogue): 'is picked up with tongs' role-swaps while 'is
    walking with tongs' does not.  Lemma-only callers keep the old
    degradation (pinned) — the lemma stream alone cannot decide it."""
    assert svo("The knife is picked up with tongs.") == ("pick up", "knife")
    assert svo("The bolt is tightened with a wrench.") == \
        ("tighten", "bolt")
    # progressive with the same lemma shape does NOT role-swap
    assert svo("The man is walking with tongs.") == ("walk", None)
    # lemma-only: still ambiguous, object lost (documented degradation)
    assert svo_lemma_only(
        "The knife is picked up with tongs.") == ("pick up", None)


def test_conjoined_verbs_fixed():
    """Round-4 fix: 'turns and picks up' yields both pairs; svos[0]
    carries the shared object exactly like the reference conjV branch
    (findSVOs attributes conjV's objects to both verbs)."""
    from egoscaler_tpu.data.tools.nlp_tools import extract_svos
    from egoscaler_tpu.data.tools.nlp_tools import lemmatize_description

    pairs = extract_svos(
        lemmatize_description("C turns and picks up the knife.")
    )
    assert pairs == [("turn", "knife"), ("pick up", "knife")]
    # first verb with its own object keeps it; second pair still emitted
    pairs = extract_svos(
        lemmatize_description("C picks up the knife and cuts the onion.")
    )
    assert pairs == [("pick up", "knife"), ("cut", "onion")]


def test_bare_pronoun_object_passthrough_fixed():
    """Round-5 fix: bare pronouns pass through as objects like the
    reference (extract_verb_obj strips only articles, returns 'it');
    the groundability filter lives in the consumers (stage-1 candidate
    filter, stage-3 annotator)."""
    assert svo("C wipes it with a cloth.") == ("wipe", "it")

    from egoscaler_tpu.pipelines.llm import RuleBasedAnnotator

    # the stage-3 judgment still rejects ungroundable pronouns
    assert RuleBasedAnnotator().manipulated_object(
        ["C wipes it with a cloth."]
    ) == [(None, False)]


def test_verb_ambiguous_subject_noun_fixed():
    """Round-5 fix: a verb-scan candidate right after a determiner is a
    noun ('the cook ...'), so the scan continues to the real verb —
    spaCy resolves the same case with POS tags."""
    assert svo("The cook stirs the soup.") == ("stir", "soup")
    assert svo("The saw cuts the wood.") == ("cut", "wood")


def test_gerund_compound_lemmas_fixed():
    """Round-5 fix: with the surface stream, a non-head -ing modifier
    inside the object NP keeps its surface form ('cutting board'), as
    spaCy does for NOUN compound tokens; lemma-only callers keep the
    stripped form (pinned)."""
    assert svo("C picks up the cutting board.") == \
        ("pick up", "cutting board")
    assert svo("C grabs the frying pan.") == ("grab", "frying pan")
    # the NP head itself still lemmatizes ('the cutting' alone)
    assert svo_lemma_only(
        "C picks up the cutting board.") == ("pick up", "cut board")
