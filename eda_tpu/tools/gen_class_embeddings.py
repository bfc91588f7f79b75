"""Generate the detected-box class-name embedding table.

Equivalent of the reference ``data/gen_class_embeddings.py:1-25``: encode
each object-class name with the (frozen) text encoder and save the pooled
hidden state per class as a (num_classes, hidden) table, consumed by the
butd box stream (``models/bdetr.py:90-95`` / our ``EDAGrounder``
``butd_class_embeddings``).

Usage:
    python -m eda_tpu.tools.gen_class_embeddings --out class_embeddings.npy \
        [--params path/to/text_encoder_params.msgpack]
"""

from __future__ import annotations

import argparse

import numpy as np


def generate(params=None, class_names=None, hidden: int = 768) -> np.ndarray:
    """Encode class names; random-init encoder if no params are given."""
    import jax
    import jax.numpy as jnp

    from eda_tpu.data.class_config import class485_names
    from eda_tpu.models.roberta import RobertaEncoder
    from eda_tpu.models.tokenizer import make_tokenizer

    # the curated 485-name vocabulary in class-rank order — rows must line
    # up with det_class_ids (DC.class2type order, data/gen_class_embeddings.py:14)
    class_names = class_names or class485_names()
    tokenizer = make_tokenizer()
    encoder = RobertaEncoder(hidden=hidden)

    batch = tokenizer.encode_batch(class_names, max_len=16)
    ids = jnp.asarray(batch.input_ids)
    mask = jnp.asarray(batch.attention_mask)
    if params is None:
        params = encoder.init(jax.random.key(0), ids[:1], mask[:1], train=False)[
            "params"
        ]
    hidden_states = jax.jit(
        lambda p, i, m: encoder.apply({"params": p}, i, m, train=False)
    )(params, ids, mask)
    # masked mean pool over real tokens (the reference mean-pools the last
    # hidden state per class name)
    m = np.asarray(mask)[..., None]
    pooled = (np.asarray(hidden_states) * m).sum(1) / np.maximum(m.sum(1), 1)
    return pooled.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="class_embeddings3d.npy")
    parser.add_argument("--params", default=None, help="msgpack text-encoder params")
    parser.add_argument(
        "--accelerator", action="store_true",
        help="use the default accelerator backend; the table is an offline "
             "host artifact, so CPU is the default (the remote-TPU tunnel "
             "need not be up to generate it)",
    )
    args = parser.parse_args()
    if not args.accelerator:
        import jax

        jax.config.update("jax_platforms", "cpu")

    params = None
    if args.params:
        from flax import serialization

        with open(args.params, "rb") as f:
            params = serialization.msgpack_restore(f.read())
    table = generate(params)
    np.save(args.out, table)
    print(f"saved {table.shape} -> {args.out}")


if __name__ == "__main__":
    main()
