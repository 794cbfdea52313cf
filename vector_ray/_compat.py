"""Environment compatibility shims."""

from __future__ import annotations

import sys
import types


def install_fsspec_http_stub() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic in environments without aiohttp.

    fsspec's http module imports aiohttp at module scope; without it the
    import fails and is retried on EVERY ``ray.data.read_parquet`` call
    (ray's ``_is_http_filesystem`` catches only ModuleNotFoundError).
    Under concurrent dataset construction two threads can race the
    failed-import cleanup and one observes a partially-initialized module,
    raising a plain ImportError that escapes ray's handler. Installing a
    tiny stub module with an ``HTTPFileSystem`` sentinel class makes the
    import always succeed; the isinstance() check it feeds is then simply
    False, which is the correct answer for local files.
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module works
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass
    try:
        import fsspec.implementations  # noqa: F401
    except ImportError:
        return  # no fsspec at all — nothing to stub
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    setattr(sys.modules["fsspec.implementations"], "http", mod)


_REGISTERED_FOR_WORKERS = False


def register_package_for_workers() -> None:
    """Ship vector_ray code inside serialized tasks (cloudpickle
    by-value) so Ray workers never need to import the package — workers
    inherit the driver's import environment from ray.init time, which
    lacks the repo dir whenever the host process started elsewhere.
    Symptom otherwise: tasks referencing vector_ray classes death-loop
    on deserialization (an infinite hang, not an error)."""
    global _REGISTERED_FOR_WORKERS
    if _REGISTERED_FOR_WORKERS:
        return
    try:
        import vector_ray
        from ray import cloudpickle

        # registering the top-level package covers every submodule,
        # including ones imported later (cloudpickle walks parents)
        cloudpickle.register_pickle_by_value(vector_ray)
    except Exception:
        pass
    _REGISTERED_FOR_WORKERS = True
