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

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: per-sink per-source
    aggregate counts over the deterministic tokenized-sequence corpus."""
    from vector_ray.entry_queries import q_flagship_agg

    return q_flagship_agg("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from vector_ray.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vector_ray.entry_queries import oracle_sql as _oracle

    return _oracle()
