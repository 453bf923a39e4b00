"""Session-scoped scratch directories.

Catalog entries that materialize side state (ingest warehouses, staged
streaming sources, seed CSVs) need a FRESH directory per invocation —
re-using one would change semantics (a pre-completed ledger would turn
the idempotency assertion into a skip). This helper hands out fresh
dirs but registers them for removal at interpreter exit, so repeated
parity sweeps / bench reps don't accumulate unbounded /tmp usage.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)
    _CREATED.clear()
