"""Streaming surface. Batch-checkable window operators register
queries on import; true Structured Streaming helpers live in
``.streams``."""

__all__: list[str] = []
