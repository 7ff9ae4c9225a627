"""Streaming surface. Batch-checkable window operators register
queries on import; true Structured Streaming helpers live in
``.streams``."""

from . import stateful, streams, windows  # noqa: F401

__all__ = ["stateful", "streams", "windows"]
