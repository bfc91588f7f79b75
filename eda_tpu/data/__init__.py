"""Host-side input pipeline: decoupling, positive maps, datasets."""

from eda_tpu.data.decouple import decoupled_spans, parse  # noqa: F401
from eda_tpu.data.positive_maps import (  # noqa: F401
    MAX_TOKENS,
    build_positive_maps,
    not_mentioned_suffix,
    spans_to_map,
)
from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes  # noqa: F401
