"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
sf0.001; ``queries()`` exposes every implemented operator/pipeline
(SURVEY.md §2 + training-data extensions) as ``fn(sf_dir) -> Dataset |
pa.Table``; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, same rounding semantics).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the driver may import this module from any cwd; the package lives
# next to this file
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

def _ensure_workers_can_import() -> None:
    from vector_ray._compat import register_package_for_workers

    register_package_for_workers()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: per-sink per-source
    aggregate counts over the deterministic tokenized-sequence corpus."""
    _ensure_workers_can_import()
    from vector_ray.entry_queries import q_flagship_agg

    return q_flagship_agg("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    _ensure_workers_can_import()
    from vector_ray.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vector_ray.entry_queries import oracle_sql as _oracle

    return _oracle()
