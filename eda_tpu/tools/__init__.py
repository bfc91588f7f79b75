"""Offline preparation tools (scan packing, class embeddings)."""
