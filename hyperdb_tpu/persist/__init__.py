"""Persistence: pickle(.gz)/JSON/SQLite parity formats + index sidecars."""

from hyperdb_tpu.persist.io import (
    PAYLOAD_FIELDS,
    load_payload,
    save_payload,
)

__all__ = ["PAYLOAD_FIELDS", "load_payload", "save_payload"]
