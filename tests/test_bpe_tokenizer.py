"""Differential parity: native byte-level BPE vs RobertaTokenizerFast.

The native tokenizer (``eda_tpu/models/bpe.py``) must reproduce the HF fast
tokenizer bit-for-bit — input_ids, attention_mask, char offsets, and
``char_to_token`` — because the positive maps that supervise the dense
alignment losses are built from exactly those values
(``/root/reference/src/joint_det_dataset.py:1150-1177``).

Two vocab regimes:
* char-level (every byte-level char, no merges) — the fabrication used by
  ``test_full_model_parity.py``;
* a REAL BPE trained in-test with the `tokenizers` Rust trainer on an
  EDA-style corpus — exercises multi-char merges, 'Ġ'-prefixed merges, and
  the trim_offsets interactions the char-level vocab can't reach.
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
from transformers import RobertaTokenizerFast  # noqa: E402

from eda_tpu.models.bpe import BPETokenizer, _bytes_to_unicode, load_bpe  # noqa: E402

# EDA-style utterances + adversarial shapes (multi-space, tabs/newlines,
# unicode, contractions, numerals, punctuation runs, leading/trailing space,
# empty, the reference's ' . not mentioned' suffix)
CORPUS = [
    "this is a brown wooden chair. it is next to the table. . not mentioned",
    "the black office chair on the left of the desk near the window.",
    "find the second trash can from the door, not the first one",
    "it's the couch that is farthest from the kitchen counter",
    "the monitor on the desk. there are 2 monitors, pick the left one.",
    "chair . table . window . door . couch . bed . sofa . desk",
    "the    chair   with   extra   spaces",
    "  leading and trailing  ",
    "tab\tseparated\nand newline",
    "café au lait décor naïve",
    "UPPER Case MiXeD",
    "don't can't won't it's we're you'll i'd they've i'm",
    "123 4567 12.5 meters 2nd 3rd",
    "!!! ??? ... --- ,,,",
    "word,word.word;word:word",
    "",
    " ",
    "a",
    ".",
    "the round table near the whiteboard easel is off-white in color.",
    "this is a long utterance " * 20,  # forces truncation at max_len
]


def _char_vocab_files(tmp_path):
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in sorted(_bytes_to_unicode().values()):
        vocab[ch] = len(vocab)
    vocab["<mask>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    return tmp_path


def _trained_vocab_files(tmp_path):
    """Train a small but REAL byte-level BPE with the Rust trainer, then save
    vocab.json/merges.txt — the exact roberta-base file format."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS * 50, trainer)
    model_blob = json.loads(tok.to_str())["model"]
    (tmp_path / "vocab.json").write_text(json.dumps(model_blob["vocab"]))
    merges = model_blob["merges"]
    lines = [m if isinstance(m, str) else " ".join(m) for m in merges]
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(lines) + "\n"
    )
    return tmp_path


@pytest.fixture(params=["char", "trained"], scope="module")
def vocab_dir(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"bpe_{request.param}")
    if request.param == "char":
        return _char_vocab_files(tmp)
    return _trained_vocab_files(tmp)


@pytest.fixture(scope="module")
def pair(vocab_dir):
    hf = RobertaTokenizerFast(
        vocab_file=str(vocab_dir / "vocab.json"),
        merges_file=str(vocab_dir / "merges.txt"),
    )
    native = BPETokenizer.from_pretrained(str(vocab_dir))
    return hf, native


@pytest.mark.parametrize("max_len", [64, 256])
def test_ids_mask_offsets_match_hf(pair, max_len):
    hf, native = pair
    enc = hf(
        CORPUS,
        padding="max_length",
        truncation=True,
        max_length=max_len,
        return_offsets_mapping=True,
        return_tensors="np",
    )
    got = native.encode_batch(CORPUS, max_len=max_len)
    np.testing.assert_array_equal(got.input_ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(
        got.attention_mask, enc["attention_mask"].astype(bool)
    )
    want_offsets = enc["offset_mapping"].tolist()
    for b in range(len(CORPUS)):
        assert [list(o) for o in got.offsets[b]] == want_offsets[b], CORPUS[b]


def test_char_to_token_every_char(pair):
    """char_to_token at EVERY character of every utterance — the exact call
    the positive-map builder makes (joint_det_dataset.py:1158-1173)."""
    hf, native = pair
    enc = hf(
        CORPUS, padding="max_length", truncation=True, max_length=256,
        return_offsets_mapping=True,
    )
    got = native.encode_batch(CORPUS, max_len=256)
    checked = 0
    for b, text in enumerate(CORPUS):
        for ci in range(len(text)):
            assert got.char_to_token(b, ci) == enc.char_to_token(b, ci), (
                b, ci, repr(text[ci]),
            )
            checked += 1
    assert checked > 1000


def test_special_ids_and_lengths(pair):
    hf, native = pair
    got = native.encode_batch(["the chair"], max_len=16)
    assert got.input_ids[0, 0] == hf.bos_token_id
    n = int(got.lengths[0])
    assert got.input_ids[0, n - 1] == hf.eos_token_id
    assert (got.input_ids[0, n:] == hf.pad_token_id).all()


def test_tokenizer_json_loading(vocab_dir, pair, tmp_path):
    """Directories holding only tokenizer.json (fast-only saves) load too."""
    hf, native = pair
    hf.save_pretrained(str(tmp_path))
    (tmp_path / "vocab.json").unlink()
    (tmp_path / "merges.txt").unlink()
    tok = load_bpe(str(tmp_path))
    assert tok is not None
    a = tok.encode_batch(CORPUS, max_len=128)
    b = native.encode_batch(CORPUS, max_len=128)
    np.testing.assert_array_equal(a.input_ids, b.input_ids)
    assert a.offsets == b.offsets


def test_make_tokenizer_prefers_native(vocab_dir):
    from eda_tpu.models import make_tokenizer

    tok = make_tokenizer(str(vocab_dir))
    assert isinstance(tok, BPETokenizer)


def test_load_bpe_missing_dir(tmp_path):
    assert load_bpe(str(tmp_path / "nope")) is None
