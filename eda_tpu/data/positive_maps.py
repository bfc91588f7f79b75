"""Character spans -> token-level positive maps.

Mirrors ``get_positive_map`` (reference ``src/joint_det_dataset.py:1150-1177``)
including the +-1/+-2 character fallback probing when a span boundary lands on
whitespace or a dropped character, and the row normalization. Maps are over a
fixed 256 token positions (the soft-token class space, MAX_TOKENS).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from eda_tpu.models.tokenizer import TokenBatch

MAX_TOKENS = 256

Span = Tuple[int, int]


def _char_to_token_with_fallback(batch: TokenBatch, b: int, char_idx: int, probes):
    for delta in probes:
        tok = batch.char_to_token(b, char_idx + delta)
        if tok is not None:
            return tok
    return None


def spans_to_map(batch: TokenBatch, b: int, spans: Sequence[Span]) -> np.ndarray:
    """Sum of per-span row-normalized (MAX_TOKENS,) maps.

    Follows joint_det_dataset.py:1150-1177 exactly: each span becomes its
    own map row normalized to mass 1 (``row / (row.sum() + 1e-12)``), and
    the component map is the SUM of those rows
    (``gt_map.sum(axis=0)``, :644-648) — so a component with k resolvable
    spans has total mass k, and tokens of shorter spans weigh more. Begin
    probes +1, +2; end probes -1, -2 on the inclusive end-1 (the reference
    probes -2, -3 on the exclusive end). Unresolvable spans contribute zero.
    """
    out = np.zeros((MAX_TOKENS,), np.float32)
    for start, end in spans:
        if end <= start:
            continue
        beg_tok = _char_to_token_with_fallback(batch, b, start, (0, 1, 2))
        end_tok = _char_to_token_with_fallback(batch, b, end - 1, (0, -1, -2))
        if beg_tok is None or end_tok is None or end_tok < beg_tok:
            continue
        row = np.zeros((MAX_TOKENS,), np.float32)
        row[beg_tok : end_tok + 1] = 1.0
        out += row / (row.sum() + 1e-12)
    return out


def build_positive_maps(
    batch: TokenBatch, b: int, decoupled: dict
) -> dict:
    """All five decoupled maps (+ auxi) for one caption.

    Args:
        batch: tokenized batch containing the caption at row ``b``.
        decoupled: output of ``eda_tpu.data.decouple.decoupled_spans``.

    Returns:
        dict of (MAX_TOKENS,) float32 arrays keyed
        main/modifiers/pronouns/relations/others/auxi.
    """
    return {
        key: spans_to_map(batch, b, decoupled[key])
        for key in ("main", "modifiers", "pronouns", "relations", "others", "auxi")
    }


def not_mentioned_suffix(utterance: str) -> str:
    """Append the ' . not mentioned' tail (joint_det_dataset.py:988-991)."""
    return utterance.rstrip() + " . not mentioned"
