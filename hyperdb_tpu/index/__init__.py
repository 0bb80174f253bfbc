"""ANN indexes: exact flat scan, TPU-native IVF, reduced-rank projscan."""

from hyperdb_tpu.index.flat import FlatIndex

__all__ = ["FlatIndex", "index_from_state"]


def index_from_state(state: dict):
    """Restore a persisted index from its ``state()`` dict by ``kind``.

    The single dispatch point for every persistence surface (pickle/.ann
    sidecar in core/db and the checkpoint format in persist/checkpoint —
    review r3: the checkpoint copy of this dispatch missed 'projscan' and
    crashed load() with KeyError for exactly the large-corpus dbs the
    format targets)."""
    kind = state.get("kind")
    if kind == "ivf":
        from hyperdb_tpu.index.ivf import IVFIndex

        return IVFIndex.from_state(state)
    if kind == "projscan":
        from hyperdb_tpu.index.projscan import ProjScanIndex

        return ProjScanIndex.from_state(state)
    return FlatIndex.from_state(state)
