"""Session-scoped scratch directories for query fixtures.

Registered queries that exercise the COW table format build their
tables in /tmp scratch dirs (the parquet fixtures are read-only).
Round 5's audit tooling re-runs those queries hundreds of times per
process, and bare ``tempfile.mkdtemp`` dirs accreted until someone
swept /tmp by hand. Every fixture scratch dir now comes from
:func:`scratch_dir`, which records it for one ``atexit`` sweep — a
long audit session leaves /tmp exactly as it found it.

The sweep is deliberately end-of-process, not per-query: a returned
DataFrame reads its COW table lazily, so the table must outlive the
query function (the driver collects AFTER the function returns).
Memoized fixtures (``matview.build_mutated_orders_table``) cap the
count at one dir per (family, sf_dir) on top of that.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is swept when the process exits."""
    path = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(path)
    return path


@atexit.register
def _sweep() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
