"""Continuous-batching serving (slot-recycled decode pool)."""

from .engine import (  # noqa: F401
    Completion,
    DecodeState,
    MultiEngine,
    PrefillPack,
    Request,
    ServeEngine,
    ServeStats,
    SharedPrefix,
    decode_chunk,
    init_state,
    insert,
    prefill,
)
