"""Native byte-level BPE tokenizer with HF-identical ids and char offsets.

The reference leans on ``RobertaTokenizerFast`` and its ``char_to_token``
mapping to turn the text-decoupler's character spans into token-level
positive maps (``/root/reference/src/joint_det_dataset.py:1150-1177``,
``/root/reference/models/bdetr.py:76-78``). This module reimplements the
GPT-2/RoBERTa byte-level BPE scheme from its file format so the framework
needs neither `transformers` nor `tokenizers` at run time:

* ``vocab.json`` (token string -> id) + ``merges.txt`` (ranked merge rules);
* the GPT-2 byte<->unicode table (printable bytes map to themselves, the
  rest shift into the U+0100 page, e.g. space -> 'Ġ');
* the GPT-2 pre-tokenization regex (contractions, letter runs with one
  optional leading space, number runs, punctuation runs, trailing spaces);
* the classic lowest-rank-first merge loop per pre-token (memoized);
* character offsets matching the Rust ``tokenizers`` ByteLevel +
  ``RobertaProcessing(trim_offsets=True)`` pipeline exactly: offsets are in
  ORIGINAL-STRING CHARACTERS (a multi-byte char's byte-tokens all carry that
  char's span), and each token's span is trimmed past its leading/trailing
  'Ġ' chars — ``new_start = min(start + n_lead, end)`` then
  ``new_end = max(end - n_trail, new_start)`` — so a pure-space token
  collapses to an empty ``(end, end)`` span and ``char_to_token`` of a space
  returns None (the reference's ±1/2-char probing at
  ``joint_det_dataset.py:1158-1173`` depends on exactly this behavior).

Differential parity vs ``RobertaTokenizerFast`` — ids, masks, offsets, and
``char_to_token`` on the full decoupler corpus, against both a char-level
vocab and a BPE vocab *trained* with the real ``tokenizers`` trainer — is
pinned in ``tests/test_bpe_tokenizer.py``.
"""

from __future__ import annotations

import functools
import json
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from eda_tpu.models.tokenizer import BOS_ID, EOS_ID, PAD_ID, TokenBatch

# GPT-2 split pattern (gpt2 encoder.py / tokenizers ByteLevel use_regex):
# contractions | " letters" | " numbers" | " punctuation" | space-runs not
# followed by non-space | space-runs. Requires the `regex` module for \p
# classes; imported lazily so the package works without it until a BPE
# tokenizer is actually constructed.
_GPT2_PAT = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> unicode-char table.

    Printable/latin bytes map to their own codepoint; the remaining bytes
    map to U+0100 + running index (so 0x20 -> 'Ġ', 0x0A -> 'Ċ'). Standard
    published algorithm (openai/gpt-2 encoder.py); rebuilt here rather than
    imported so the production path has no transformers dependency.
    """
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class BPETokenizer:
    """Byte-level BPE with RoBERTa special-token conventions.

    Produces fixed-shape ``TokenBatch``es: ``<s>`` + content + ``</s>``,
    padded with ``<pad>`` to ``max_len`` and truncated (content-first) like
    HF's ``padding="max_length", truncation=True``.
    """

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: Sequence[Tuple[str, str]],
        bos_token: str = "<s>",
        eos_token: str = "</s>",
        pad_token: str = "<pad>",
        unk_token: str = "<unk>",
    ):
        import regex

        self.encoder = dict(vocab)
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.bos_id = self.encoder.get(bos_token, BOS_ID)
        self.eos_id = self.encoder.get(eos_token, EOS_ID)
        self.pad_id = self.encoder.get(pad_token, PAD_ID)
        self.unk_id = self.encoder.get(unk_token, 3)
        self.vocab_size = len(self.encoder)
        self._pat = regex.compile(_GPT2_PAT)
        self._cache: Dict[str, Tuple[str, ...]] = {}

    # -- construction -----------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str) -> "BPETokenizer":
        """Load from an HF-format directory: ``vocab.json`` + ``merges.txt``
        (roberta-base layout), or ``tokenizer.json`` (fast-only saves)."""
        vj, mt = osp.join(path, "vocab.json"), osp.join(path, "merges.txt")
        if osp.isfile(vj) and osp.isfile(mt):
            with open(vj, encoding="utf-8") as f:
                vocab = json.load(f)
            merges: List[Tuple[str, str]] = []
            with open(mt, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line or line.startswith("#version"):
                        continue
                    a, _, b = line.partition(" ")
                    merges.append((a, b))
            return cls(vocab, merges)
        tj = osp.join(path, "tokenizer.json")
        if osp.isfile(tj):
            with open(tj, encoding="utf-8") as f:
                blob = json.load(f)
            model = blob["model"]
            merges = [
                tuple(m) if isinstance(m, list) else tuple(m.split(" ", 1))
                for m in model["merges"]
            ]
            return cls(model["vocab"], merges)
        raise FileNotFoundError(
            f"no vocab.json+merges.txt or tokenizer.json under {path}"
        )

    # -- core BPE ----------------------------------------------------------

    def _bpe(self, token: str) -> Tuple[str, ...]:
        """Merge loop over one byte-level pre-token string: repeatedly fuse
        the lowest-ranked adjacent pair until none ranks."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token)
        pairs = _get_pairs(word)
        while pairs:
            best = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if best not in self.bpe_ranks:
                break
            a, b = best
            out: List[str] = []
            i = 0
            while i < len(word):
                if word[i] == a and i + 1 < len(word) and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        self._cache[token] = word
        return word

    def _encode_text(
        self, text: str
    ) -> Tuple[List[int], List[Tuple[int, int]]]:
        """(ids, char offsets) for one text, no specials, untruncated."""
        ids: List[int] = []
        offsets: List[Tuple[int, int]] = []
        be = self.byte_encoder
        for m in self._pat.finditer(text):
            piece = m.group()
            # byte-level string + per-byte-level-char ORIGINAL char index
            chars: List[str] = []
            origin: List[int] = []
            for ci, ch in enumerate(piece, start=m.start()):
                for byte in ch.encode("utf-8"):
                    chars.append(be[byte])
                    origin.append(ci)
            pos = 0
            for tok in self._bpe("".join(chars)):
                n = len(tok)
                start = origin[pos]
                end = origin[pos + n - 1] + 1
                # trim_offsets (RobertaProcessing default): advance past
                # leading 'Ġ's, pull back past trailing 'Ġ's — only the
                # space byte trims; tab 'ĉ'/newline 'Ċ' keep full spans
                lead = 0
                while lead < n and tok[lead] == "Ġ":
                    lead += 1
                trail = 0
                while trail < n - lead and tok[n - 1 - trail] == "Ġ":
                    trail += 1
                if lead:
                    start = min(start + lead, end)
                if trail:
                    end = max(end - trail, start)
                ids.append(self.encoder.get(tok, self.unk_id))
                offsets.append((start, end))
                pos += n
        return ids, offsets

    # -- batch API (same contract as SimpleTokenizer / HFTokenizer) --------

    def encode_batch(
        self, texts: Sequence[str], max_len: int = 256
    ) -> TokenBatch:
        B = len(texts)
        ids = np.full((B, max_len), self.pad_id, np.int32)
        mask = np.zeros((B, max_len), bool)
        offsets: List[List[Tuple[int, int]]] = []
        lengths = np.zeros((B,), np.int32)
        for b, text in enumerate(texts):
            tids, toffs = self._encode_text(text)
            tids, toffs = tids[: max_len - 2], toffs[: max_len - 2]
            n = len(tids) + 2
            ids[b, 0] = self.bos_id
            ids[b, 1:n - 1] = tids
            ids[b, n - 1] = self.eos_id
            mask[b, :n] = True
            lengths[b] = n
            offs = [(0, 0)] + toffs + [(0, 0)]
            offs += [(0, 0)] * (max_len - len(offs))
            offsets.append(offs)
        return TokenBatch(ids, mask, offsets, lengths)


def load_bpe(path: str) -> Optional[BPETokenizer]:
    """``BPETokenizer.from_pretrained`` or None when files are missing."""
    try:
        return BPETokenizer.from_pretrained(path)
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        return None
