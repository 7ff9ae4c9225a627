"""Operator modules. Importing this package registers every operator
in the query registry (see ``..registry``)."""

from . import relational  # noqa: F401

__all__ = ["relational"]
