"""vector_ray — a Ray-Data-native log/telemetry data-processing engine.

A from-scratch rebuild of the data-plane capabilities modeled by the
reference control plane (pezkins "Vectorize", /root/reference): the Vector
component catalog (sources → transforms → sinks DAGs), expressed idiomatically
on Ray Data:

* one ``ray.data.Dataset`` per edge, blocks are ``pyarrow.Table``
* stateless transforms = vectorized ``map_batches(batch_format="pyarrow")``
* stateful stages (enrichment tables, models) = actor pools
* wide steps (dedupe, reduce, aggregate) = two-phase partial aggregation
  followed by a small ``groupby``
* fan-out routing = one computed ``__route`` column + partitioned sinks

The flagship pipeline (parse → enrich → route → aggregate over Parquet
shards of pre-tokenized training sequences) lives in
``vector_ray.pipelines.flagship``; the generic DAG spec compiler (the
analog of the reference's PipelineConfig, shared/src/config.rs:12-24)
lives in ``vector_ray.pipeline``.
"""

from vector_ray._compat import install_fsspec_http_stub

install_fsspec_http_stub()

from vector_ray.pipeline import PipelineSpec, build_pipeline, run_pipeline
from vector_ray.ingest import run_ingest
from vector_ray.validate import validate_spec, ValidationError

__version__ = "0.1.0"

__all__ = [
    "PipelineSpec",
    "build_pipeline",
    "run_pipeline",
    "run_ingest",
    "validate_spec",
    "ValidationError",
    "__version__",
]
