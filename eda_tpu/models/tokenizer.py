"""Host-side tokenization with character-to-token alignment.

The reference uses ``RobertaTokenizerFast`` and leans hard on its
``char_to_token`` mapping to convert the text-decoupler's character spans
into token-level positive maps (``src/joint_det_dataset.py:1150-1177``).

This module provides:

* ``SimpleTokenizer`` — a deterministic, dependency-free word-level tokenizer
  with exact character offsets. Token ids come from a stable FNV-1a hash into
  the vocabulary (collisions are harmless for from-scratch training). Special
  ids match RoBERTa (<s>=0, <pad>=1, </s>=2) so checkpoints and tests share
  conventions with a later HF-tokenizer swap-in.
* ``HFTokenizer`` — a thin adapter over a local HuggingFace fast tokenizer,
  used automatically when a tokenizer directory exists (offline images
  without the vocab files fall back to ``SimpleTokenizer``).

Both return fixed-shape numpy batches (ids, mask, per-sequence offset lists),
so jit never retraces on text length — the reference's ``padding="longest"``
dynamic shapes (``bdetr.py:170-172``) are deliberately replaced by a static
``max_len`` bucket.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

BOS_ID = 0
PAD_ID = 1
EOS_ID = 2
_NUM_SPECIAL = 4  # bos, pad, eos, unk-reserve

_WORD_RE = re.compile(r"\w+|[^\w\s]")


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@dataclasses.dataclass
class TokenBatch:
    """Fixed-shape token batch.

    input_ids: (B, L) int32; attention_mask: (B, L) bool (True = real token);
    offsets: per sequence, a list of (char_start, char_end) for each token
    (specials get (0, 0)); lengths: (B,) number of real tokens incl. specials.
    """

    input_ids: np.ndarray
    attention_mask: np.ndarray
    offsets: List[List[Tuple[int, int]]]
    lengths: np.ndarray

    def char_to_token(self, b: int, char_idx: int) -> Optional[int]:
        """Token index covering character ``char_idx`` of sequence b, or None.

        Same contract as HF fast tokenizers' ``char_to_token`` used at
        ``src/joint_det_dataset.py:1158-1173``.
        """
        for t, (s, e) in enumerate(self.offsets[b]):
            if s <= char_idx < e:
                return t
        return None


class SimpleTokenizer:
    """Deterministic word-level tokenizer with stable hashed ids."""

    def __init__(self, vocab_size: int = 50265, lowercase: bool = True):
        self.vocab_size = vocab_size
        self.lowercase = lowercase

    def token_id(self, word: str) -> int:
        if self.lowercase:
            word = word.lower()
        return _NUM_SPECIAL + _fnv1a(word) % (self.vocab_size - _NUM_SPECIAL)

    def encode_batch(self, texts: Sequence[str], max_len: int = 256) -> TokenBatch:
        B = len(texts)
        ids = np.full((B, max_len), PAD_ID, np.int32)
        mask = np.zeros((B, max_len), bool)
        offsets: List[List[Tuple[int, int]]] = []
        lengths = np.zeros((B,), np.int32)
        for b, text in enumerate(texts):
            toks = [(m.group(), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
            toks = toks[: max_len - 2]
            ids[b, 0] = BOS_ID
            offs = [(0, 0)]
            for t, (w, s, e) in enumerate(toks):
                ids[b, t + 1] = self.token_id(w)
                offs.append((s, e))
            ids[b, len(toks) + 1] = EOS_ID
            offs.append((0, 0))
            n = len(toks) + 2
            mask[b, :n] = True
            lengths[b] = n
            offs += [(0, 0)] * (max_len - len(offs))
            offsets.append(offs)
        return TokenBatch(ids, mask, offsets, lengths)


class HFTokenizer:
    """Adapter over a local HuggingFace fast tokenizer directory."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = self._tok.vocab_size

    def encode_batch(self, texts: Sequence[str], max_len: int = 256) -> TokenBatch:
        enc = self._tok(
            list(texts),
            padding="max_length",
            truncation=True,
            max_length=max_len,
            return_offsets_mapping=True,
            return_tensors="np",
        )
        offsets = [
            [tuple(pair) for pair in seq] for seq in enc["offset_mapping"].tolist()
        ]
        mask = enc["attention_mask"].astype(bool)
        return TokenBatch(
            enc["input_ids"].astype(np.int32),
            mask,
            offsets,
            mask.sum(-1).astype(np.int32),
        )


def make_tokenizer(path: Optional[str] = None, vocab_size: int = 50265):
    """Best usable tokenizer for ``path``.

    Preference order: the NATIVE byte-level BPE (``models/bpe.py`` — exact
    RoBERTa ids/offsets from vocab.json+merges.txt, no transformers
    dependency), then the HF adapter (directories holding only formats the
    native loader doesn't parse), then ``SimpleTokenizer`` (synthetic-only;
    real datasets hard-error on it in ``data/dataset.py``).
    """
    if path is not None:
        from eda_tpu.models.bpe import load_bpe

        tok = load_bpe(path)
        if tok is not None:
            return tok
        try:
            return HFTokenizer(path)
        except Exception:
            pass
    return SimpleTokenizer(vocab_size)
