"""ANN indexes: exact flat scan and the TPU-native IVF index."""

from hyperdb_tpu.index.flat import FlatIndex

__all__ = ["FlatIndex"]
