"""Embedder fine-tuning: loss decreases, output plugs into the DB."""

import numpy as np
import pytest

from hyperdb_tpu.models.finetune import finetune


PAIRS = [
    ("sleepy creature", "a creature that sleeps all day in warm caves"),
    ("river hunter", "hunts fish along the river shallows at dawn"),
    ("storm flier", "rides mountain storms on wide wings"),
    ("rock burrower", "digs deep tunnels beneath the cold rocks"),
    ("night singer", "sings at dusk to mark its territory"),
    ("tide dweller", "hides in tide pools until the sea returns"),
    ("sun sleeper", "dozes in the sun and wakes only to feed"),
    ("plain racer", "races thunderstorms across the open plains"),
]


def test_finetune_reduces_loss():
    emb = finetune(PAIRS * 4, epochs=3, batch_size=8, seq_len=16, learning_rate=1e-4)
    first, last = emb.losses[0], np.mean(emb.losses[-3:])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_finetuned_embedder_encodes():
    emb = finetune(PAIRS, epochs=1, batch_size=4, seq_len=16)
    out = emb.encode(["sleepy creature", "storm flier"])
    assert out.shape == (2, 384)
    assert np.isfinite(out).all()


def test_finetune_requires_pairs():
    with pytest.raises(ValueError):
        finetune([("a", "b")])


def test_finetune_on_mesh():
    import jax

    from hyperdb_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    emb = finetune(PAIRS, mesh=mesh, epochs=1, batch_size=8, seq_len=16)
    assert emb.encode(["x"]).shape == (1, 384)
