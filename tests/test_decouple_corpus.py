"""Scale evidence for the rule-based decoupler (VERDICT round-3 item 7).

Template-generates >=1k utterances compositionally over the real
vocabularies (485-class object nouns, attribute list, relation phrases,
scene nouns) with EXACT span ground truth tracked during generation, then
property-tests ``decouple.decoupled_spans`` against it.

What this measures (beyond the curated 200-utterance suite in
``test_decouple.py``):
* chunking accuracy at vocabulary scale — every object noun / attribute /
  relation phrase combination the grammar admits, not a hand-picked sample;
* that relation-subject resolution (the positional analog of the
  reference's dependency walks, ``sng_parser/backends/spacy_parser.py:221-300``)
  attributes each relation to the right entity: edges are asserted exactly
  per template, including the non-main-subject template where the rel span
  must stay OFF the main node (the ``edge['obj_idx']==0`` filter at
  :436-447 — the only consumer of relation spans is the main row of
  ``rel_positive_map``, ``src/joint_det_dataset.py:639-667``);
* that relation phrases never disturb other-entity target spans or the
  auxi entity: every relation-bearing template asserts ``others``/``auxi``
  exactly.

The generator only emits combinations whose expected parse is well-defined
under the reference semantics (filtered for cross-vocabulary homographs,
multi-word merges, and coref collisions); ambiguous words are exercised by
the curated suite instead.
"""

import numpy as np
import pytest

from eda_tpu.data import vocab
from eda_tpu.data.decouple import decoupled_spans, parse

_REL_WORDS = frozenset(
    w for p in vocab.RELATION_PHRASES for w in p.split()
)
_SPATIAL = frozenset("nearest closest farthest furthest".split())
_NUM_WORDS = frozenset(
    "one two three four five six seven eight nine ten eleven twelve".split()
)


def _clean_objects():
    """Single-word object nouns with an unambiguous NOUN_OBJ tagging."""
    bad = (
        vocab.COPULAS | vocab.PRONOUNS | vocab.DETERMINERS
        | vocab.CONJUNCTIONS | vocab.ATTRIBUTES | _NUM_WORDS
        | _REL_WORDS | vocab.NON_MAIN_OBJECTS | _SPATIAL
    )
    out = []
    for w in sorted(vocab.object_nouns()):
        if " " in w or not w.replace("-", "").isalnum() or w in bad:
            continue
        out.append(w)
    return out


def _clean_attributes():
    bad = (
        _REL_WORDS | _SPATIAL | vocab.COPULAS | vocab.DETERMINERS
        | vocab.CONJUNCTIONS | _NUM_WORDS | vocab.SCENE_NOUNS
    )
    return sorted(
        a for a in vocab.ATTRIBUTES
        if a not in bad and not vocab.is_object_noun(a)
    )


def _clean_scenes():
    bad = (
        vocab.COPULAS | vocab.PRONOUNS | vocab.DETERMINERS
        | vocab.CONJUNCTIONS | vocab.ATTRIBUTES | _NUM_WORDS | _REL_WORDS
    )
    return sorted(
        s for s in vocab.SCENE_NOUNS
        if " " not in s and s.isalnum() and s not in bad
        and not vocab.is_object_noun(s)
    )


_BIGRAMS = vocab.multiword_objects().get(2, frozenset())


def _merges(a: str, b: str) -> bool:
    return f"{a} {b}" in _BIGRAMS


class _Builder:
    """Assemble an utterance word by word, recording char spans."""

    def __init__(self):
        self.parts = []
        self.pos = 0

    def add(self, word: str):
        if self.parts:
            self.pos += 1  # single space
        start = self.pos
        self.parts.append(word)
        self.pos += len(word)
        return (start, start + len(word))

    def add_phrase(self, phrase: str):
        return [self.add(w) for w in phrase.split()]

    def text(self):
        return " ".join(self.parts)


def _expected():
    return {
        "main": [], "modifiers": [], "pronouns": [], "relations": [],
        "others": [], "auxi": [], "auxi_lemma": "",
        # expected ParseResult.edges as (subject_id, landmark_id, spans)
        "edges": [],
    }


def _gen_case(rng, objs, attrs, scenes, rels):
    """One templated utterance + its exact expected span dict."""
    b = _Builder()
    exp = _expected()

    def sample_obj(exclude=()):
        while True:
            w = objs[rng.integers(len(objs))]
            if w not in exclude:
                return w

    def sample_mods(k, before_word):
        """k attributes, last one not merging with the following word."""
        mods = []
        prev = "the"
        for i in range(k):
            nxt = before_word if i == k - 1 else None
            while True:
                a = attrs[rng.integers(len(attrs))]
                if _merges(prev, a):
                    continue
                if nxt is not None and _merges(a, nxt):
                    continue
                break
            mods.append(a)
            prev = a
        return mods

    t = int(rng.integers(9))
    obj = sample_obj()
    if t == 0:
        # "the [mods] obj ."
        nm = int(rng.integers(3))
        mods = sample_mods(nm, obj)
        b.add("the")
        exp["modifiers"] = [b.add(m) for m in mods]
        exp["main"] = [b.add(obj)]
        b.add(".")
    elif t == 1:
        # "the [mod] obj REL the [mod] obj2 ."
        obj2 = sample_obj(exclude={obj})
        rel = rels[rng.integers(len(rels))]
        m1 = sample_mods(int(rng.integers(2)), obj)
        m2 = sample_mods(int(rng.integers(2)), obj2)
        b.add("the")
        exp["modifiers"] += [b.add(m) for m in m1]
        exp["main"] = [b.add(obj)]
        exp["relations"] = b.add_phrase(rel)
        b.add("the")
        # other-entity modifiers belong to that node, not the main's
        for m in m2:
            b.add(m)
        exp["others"] = exp["auxi"] = [b.add(obj2)]
        exp["auxi_lemma"] = vocab.lemma(obj2)
        exp["edges"] = [(0, 1, list(exp["relations"]))]
        b.add(".")
    elif t == 2:
        # "the obj is a1 and a2 ."  (predicate attributes)
        a1, a2 = sample_mods(2, None)
        b.add("the")
        exp["main"] = [b.add(obj)]
        b.add("is")
        s1 = b.add(a1)
        b.add("and")
        s2 = b.add(a2)
        exp["modifiers"] = [s1, s2]
        b.add(".")
    elif t == 3:
        # "the obj REL the obj2 . it is a1 ."  (pronoun coref + predicate)
        obj2 = sample_obj(exclude={obj})
        rel = rels[rng.integers(len(rels))]
        a1 = sample_mods(1, None)[0]
        b.add("the")
        exp["main"] = [b.add(obj)]
        exp["relations"] = b.add_phrase(rel)
        b.add("the")
        exp["others"] = exp["auxi"] = [b.add(obj2)]
        exp["auxi_lemma"] = vocab.lemma(obj2)
        exp["edges"] = [(0, 1, list(exp["relations"]))]
        b.add(".")
        exp["pronouns"] = [b.add("it")]
        b.add("is")
        exp["modifiers"] = [b.add(a1)]
        b.add(".")
    elif t == 4:
        # "the obj REL the obj2 . the obj is a1 ."  (repeat-mention coref)
        obj2 = sample_obj(exclude={obj})
        rel = rels[rng.integers(len(rels))]
        a1 = sample_mods(1, None)[0]
        b.add("the")
        exp["main"] = [b.add(obj)]
        exp["relations"] = b.add_phrase(rel)
        b.add("the")
        exp["others"] = exp["auxi"] = [b.add(obj2)]
        exp["auxi_lemma"] = vocab.lemma(obj2)
        exp["edges"] = [(0, 1, list(exp["relations"]))]
        b.add(".")
        b.add("the")
        exp["pronouns"] = [b.add(obj)]  # repeated mention -> coref span
        b.add("is")
        exp["modifiers"] = [b.add(a1)]
        b.add(".")
    elif t == 5:
        # "the obj nearest the obj2 ."  (post-nominal spatial superlative)
        obj2 = sample_obj(exclude={obj})
        sup = sorted(_SPATIAL)[rng.integers(len(_SPATIAL))]
        b.add("the")
        exp["main"] = [b.add(obj)]
        exp["relations"] = [b.add(sup)]
        b.add("the")
        exp["others"] = exp["auxi"] = [b.add(obj2)]
        exp["auxi_lemma"] = vocab.lemma(obj2)
        exp["edges"] = [(0, 1, list(exp["relations"]))]
        b.add(".")
    elif t == 6:
        # "the wall behind the obj ." -> wall is never the main entity,
        # and the relation's SUBJECT is the wall (nearest preceding entity,
        # = the spaCy head chain), so the reference's edge['obj_idx']==0
        # filter keeps it off the main node: relations stays empty and the
        # edge is (wall=1, rel, main=0).
        rel = rels[rng.integers(len(rels))]
        b.add("the")
        wall_span = b.add("wall")
        rel_spans = b.add_phrase(rel)
        b.add("the")
        exp["main"] = [b.add(obj)]
        exp["others"] = exp["auxi"] = [wall_span]
        exp["auxi_lemma"] = vocab.lemma("wall")
        exp["edges"] = [(1, 0, rel_spans)]
        b.add(".")
    elif t == 7:
        # "the obj between the obj2 and the obj3 ."  (two other entities)
        obj2 = sample_obj(exclude={obj})
        obj3 = sample_obj(exclude={obj, obj2})
        rel = rels[rng.integers(len(rels))]
        b.add("the")
        exp["main"] = [b.add(obj)]
        exp["relations"] = b.add_phrase(rel)
        b.add("the")
        s2 = b.add(obj2)
        b.add("and")
        b.add("the")
        s3 = b.add(obj3)
        exp["others"] = [s2, s3]
        exp["auxi"] = [s2]
        exp["auxi_lemma"] = vocab.lemma(obj2)
        exp["edges"] = [(0, 1, list(exp["relations"]))]
        b.add(".")
    else:
        # "the [mod] obj in the scene ."  (Scene node: not an other/auxi)
        scene = scenes[rng.integers(len(scenes))]
        m1 = sample_mods(int(rng.integers(2)), obj)
        rel = "in"
        b.add("the")
        exp["modifiers"] = [b.add(m) for m in m1]
        exp["main"] = [b.add(obj)]
        exp["relations"] = [b.add(rel)]
        b.add("the")
        b.add(scene)
        landmark = -1 if scene in vocab.TRANSPARENT_SCENE_WORDS else 1
        exp["edges"] = [(0, landmark, list(exp["relations"]))]
        b.add(".")
    return b.text(), exp


def _corpus(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    objs, attrs, scenes = _clean_objects(), _clean_attributes(), _clean_scenes()
    # relations whose every word is uniquely a relation word here
    rels = [
        p for p in vocab.RELATION_PHRASES
        if all(not vocab.is_object_noun(w) and w not in vocab.ATTRIBUTES
               for w in p.split())
    ]
    assert len(objs) > 100 and len(attrs) > 50 and len(rels) > 20
    return [_gen_case(rng, objs, attrs, scenes, rels) for _ in range(n)]


def test_corpus_spans_exact():
    """>=1k generated utterances: every span group matches ground truth."""
    cases = _corpus()
    n_rel = 0
    for text, exp in cases:
        got = decoupled_spans(text)
        for key in ("main", "modifiers", "pronouns", "relations", "others",
                    "auxi"):
            assert got[key] == exp[key], (text, key, got[key], exp[key])
        if exp["auxi_lemma"]:
            assert got["auxi_lemma"] == exp["auxi_lemma"], text
        n_rel += bool(exp["relations"]) or bool(exp["edges"])
    # the relation-attachment claim needs real coverage:
    # most of the corpus must carry relations AND other-entity spans
    assert n_rel >= len(cases) * 0.6


def test_corpus_edges_exact():
    """ParseResult.edges carries (subject, landmark, spans) for every
    templated relation — incl. the non-main-subject template ("the wall
    REL the obj"), where the edge exists but the rel span stays OFF the
    main node (the reference's edge['obj_idx']==0 filter,
    spacy_parser.py:436-447)."""
    n_edges = n_nonmain = 0
    for text, exp in _corpus(n=600, seed=3):
        res = parse(text)
        got = [(e.subject_id, e.landmark_id, e.rel_char_span)
               for e in res.edges]
        assert got == exp["edges"], (text, got, exp["edges"])
        n_edges += len(exp["edges"])
        n_nonmain += sum(1 for s, _, _ in exp["edges"] if s != 0)
    assert n_edges >= 300 and n_nonmain >= 20


def test_relation_attachment_invariance():
    """Swapping the relation phrase in a relation-bearing utterance leaves
    the other-entity and auxi spans at the same WORDS (shifted by the
    changed chars) — the direct measurement that relation tagging cannot
    corrupt other_entity_map supervision."""
    rng = np.random.default_rng(1)
    objs, attrs, scenes = _clean_objects(), _clean_attributes(), _clean_scenes()
    rels = [
        p for p in vocab.RELATION_PHRASES
        if all(not vocab.is_object_noun(w) and w not in vocab.ATTRIBUTES
               for w in p.split())
    ]
    checked = 0
    for _ in range(400):
        obj = objs[rng.integers(len(objs))]
        obj2 = obj
        while obj2 == obj:
            obj2 = objs[rng.integers(len(objs))]
        rel = rels[rng.integers(len(rels))]
        with_rel = f"the {obj} {rel} the {obj2} ."
        without = f"the {obj} near the {obj2} ."  # fixed 1-word relation
        sa, sb = decoupled_spans(with_rel), decoupled_spans(without)

        def words(text, spans):
            return [text[s:e] for s, e in spans]

        assert words(with_rel, sa["others"]) == words(without, sb["others"])
        assert words(with_rel, sa["auxi"]) == words(without, sb["auxi"])
        assert sa["auxi_lemma"] == sb["auxi_lemma"]
        checked += 1
    assert checked == 400


def test_corpus_parse_node_schema():
    """Every generated utterance yields a main node (node_id 0) and only
    Object nodes as auxi candidates — the reference node invariants."""
    for text, exp in _corpus(n=300, seed=2):
        res = parse(text)
        assert res.main is not None, text
        if exp["auxi"]:
            assert res.auxi_entity is not None
            assert res.auxi_entity.node_type == "Object"


def test_docstring_attachment_cases():
    """The module docstring's worked examples, asserted as edges
    (advisor r4: the described conjunction/comma/entity-attachment rules
    must be exercised, not just described)."""
    def edges_of(cap):
        res = parse(cap)
        return [
            (e.subject_id, e.landmark_id,
             " ".join(cap[s:t] for s, t in e.rel_char_span))
            for e in res.edges
        ]

    # entity attachment: "above" belongs to the window (node 1), not the
    # curtain — and therefore stays OFF the main rel span
    cap = "the curtain hanging on the window above the desk ."
    assert edges_of(cap) == [(0, 1, "hanging on"), (1, 2, "above")]
    got = decoupled_spans(cap)
    assert [cap[s:e] for s, e in got["relations"]] == ["hanging", "on"]

    # comma: a trailing comma-phrase re-attaches to the sentence subject
    cap = "the nightstand is to the right of the bed , under the lamp ."
    assert edges_of(cap) == [
        (0, 1, "to the right of"), (0, 2, "under"),
    ]

    # conjunction: a conjoined relation inherits the previous relation's
    # subject instead of attaching to the nearest entity
    cap = "the chair to the left of the table and behind the desk ."
    assert edges_of(cap) == [
        (0, 1, "to the left of"), (0, 2, "behind"),
    ]
