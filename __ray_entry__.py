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

_REGISTERED = False


def _ensure_workers_can_import() -> None:
    """Ray worker processes inherit the DRIVER's import environment from
    ray.init time — if the driver started Ray from another cwd, workers
    cannot import vector_ray and every task referencing its classes
    death-loops on deserialization. Registering the package for
    pickle-by-value ships the code inside each task instead, so workers
    never need the import."""
    global _REGISTERED
    if _REGISTERED:
        return
    # import the module tree up front so every submodule is registered
    import vector_ray  # noqa: F401
    import vector_ray.datagen  # noqa: F401
    import vector_ray.entry_queries  # noqa: F401
    import vector_ray.functions.dedup  # noqa: F401
    import vector_ray.functions.multimodal  # noqa: F401
    import vector_ray.functions.similarity  # noqa: F401
    import vector_ray.functions.text  # noqa: F401
    import vector_ray.pipelines.flagship  # noqa: F401
    import vector_ray.stages.shuffle  # noqa: F401
    import vector_ray.stages.window  # noqa: F401
    import vector_ray.testing  # noqa: F401

    try:
        import vector_ray.stages.enrich as _probe
        from ray import cloudpickle

        # only needed when workers can't already import the package
        for name, mod in list(sys.modules.items()):
            if name.startswith("vector_ray") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass
    _REGISTERED = True


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
