"""Golden tests for the text decoupler + positive map construction."""

import numpy as np
import pytest

from eda_tpu.data.decouple import decoupled_spans, parse
from eda_tpu.data.positive_maps import build_positive_maps, spans_to_map
from eda_tpu.models.tokenizer import SimpleTokenizer


def words(text, spans):
    return [text[s:e] for s, e in spans]


GOLDEN = [
    (
        "this is a brown wooden chair. it is next to the table.",
        {
            "main": ["chair"],
            "modifiers": ["brown", "wooden"],
            "pronouns": ["it"],
            "others": ["table"],
            "auxi": ["table"],
        },
    ),
    (
        "the black office chair on the left of the desk near the window.",
        {
            "main": ["office", "chair"],
            "modifiers": ["black"],
            "pronouns": [],
            "others": ["desk", "window"],
            "auxi": ["desk"],
        },
    ),
    (
        "there is a trash can in the corner of the room. it is green.",
        {
            "main": ["trash", "can"],
            "modifiers": ["green"],
            "pronouns": ["it"],
            "others": [],
            "auxi": [],
        },
    ),
    (
        "the small round table between the two couches.",
        {
            "modifiers": ["small"],
            "others": ["couches"],
            "auxi": ["couches"],
        },
    ),
    (
        "it is a tall bookshelf. the bookshelf is against the wall behind the couch.",
        {
            "main": ["bookshelf"],
            "modifiers": ["tall"],
            "pronouns": ["bookshelf"],  # repeated mention corefs to main
            "others": ["wall", "couch"],
        },
    ),
    (
        "the wall has a picture on it.",
        {"main": ["picture"]},  # wall can never be the main entity
    ),
]


@pytest.mark.parametrize("caption,expected", GOLDEN)
def test_decoupler_golden(caption, expected):
    got = decoupled_spans(caption)
    for key, want in expected.items():
        assert words(caption, got[key]) == want, (key, words(caption, got[key]))


def test_relations_detected():
    caption = "the chair to the left of the desk."
    got = decoupled_spans(caption)
    rel_text = " ".join(words(caption, got["relations"]))
    assert rel_text == "to the left of"


def test_no_object_fallback():
    # utterance with no recognizable object: reference retries with a
    # prefixed "This is an object . " (joint_det_dataset.py:1380-1387)
    result = parse("glarbl fnord xyzzy")
    assert result.main is None
    result2 = parse("This is an object . glarbl fnord xyzzy")
    assert result2.main is not None


def test_positive_maps_align_with_tokens():
    caption = "the brown chair next to the table . not mentioned"
    tok = SimpleTokenizer(512)
    batch = tok.encode_batch([caption], max_len=32)
    d = decoupled_spans(caption)
    maps = build_positive_maps(batch, 0, d)

    # main map marks exactly the token 'chair'
    main = maps["main"]
    assert main.sum() == pytest.approx(1.0)
    tok_idx = int(np.argmax(main))
    s, e = batch.offsets[0][tok_idx]
    assert caption[s:e] == "chair"

    # modifiers map -> 'brown'
    mi = int(np.argmax(maps["modifiers"]))
    s, e = batch.offsets[0][mi]
    assert caption[s:e] == "brown"

    # relations map covers 'next to' (2 tokens, each weight 0.5)
    rel = maps["relations"]
    marked = [batch.offsets[0][i] for i in np.nonzero(rel)[0]]
    assert [caption[s:e] for s, e in marked] == ["next", "to"]
    np.testing.assert_allclose(rel[rel > 0], 0.5)


def test_spans_to_map_fallback_probing():
    caption = "a red sofa"
    tok = SimpleTokenizer(512)
    batch = tok.encode_batch([caption], max_len=16)
    # span starting on the whitespace before 'red' resolves via +1 probing
    m = spans_to_map(batch, 0, [(1, 5)])
    idx = np.nonzero(m)[0]
    texts = [caption[s:e] for s, e in (batch.offsets[0][i] for i in idx)]
    assert "red" in texts


def test_empty_spans_give_zero_map():
    tok = SimpleTokenizer(512)
    batch = tok.encode_batch(["a chair"], max_len=8)
    m = spans_to_map(batch, 0, [])
    assert m.sum() == 0
