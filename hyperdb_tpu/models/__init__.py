"""Embedding models: hermetic hashing encoder and JAX/Flax MiniLM."""
