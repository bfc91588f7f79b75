"""Flax model stack: backbone, text encoder, cross-modal grounder."""

from eda_tpu.models.grounder import EDAGrounder, decoder_prefixes  # noqa: F401
from eda_tpu.models.pointnet2 import PointNetPPBackbone  # noqa: F401
from eda_tpu.models.roberta import RobertaEncoder  # noqa: F401
from eda_tpu.models.bpe import BPETokenizer  # noqa: F401
from eda_tpu.models.tokenizer import SimpleTokenizer, make_tokenizer  # noqa: F401
