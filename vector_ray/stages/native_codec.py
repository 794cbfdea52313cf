"""Vector ``native`` codec — protobuf wire-format encode/decode of the
event envelope.

The reference lists ``native`` among the source codecs
(ui/src/components/pipeline/config_panel.rs:853-896); Vector's native
codec is the protobuf serialization of its public event proto (an
EventWrapper with a ``log | metric | trace`` oneof; log fields are a
string->typed-Value map, metrics carry name/kind/value/tags — the same
event model the reference mirrors in shared/src/messages.rs:124-183).
This module implements that *shape* with a runtime-built descriptor —
no codegen step, nothing copied from any proto file:

    message Value   { oneof kind { string  string_v  = 1;
                                   int64   integer_v = 2;
                                   double  float_v   = 3;
                                   bool    bool_v    = 4; } }
    message Field   { string key = 1; Value value = 2; }
    message Log     { repeated Field fields = 1; }
    message Metric  { string name = 1; string kind = 2;
                      double value = 3; repeated Field tags = 4; }
    message Event   { oneof event { Log log = 1; Metric metric = 2; } }

One ``Event`` message per row in a binary column; pair with the
``length_delimited`` framing (stages/framing.py) when a single payload
carries a byte-stream of many events.

Scale notes: the protobuf wire format is inherently per-row, so encode/
decode are row loops — but they run inside ``map_batches`` tasks (the
loop is distributed, never on the driver) and the runtime here is upb
(C), so the per-row cost is a single C parse call. Message classes are
built once per process (module-level memo), not per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import VrlError

try:  # the codec is gated on a protobuf runtime being present
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    HAVE_PROTOBUF = True
except Exception:  # pragma: no cover - this container ships protobuf
    HAVE_PROTOBUF = False

def _class_cache() -> dict:
    """Process-local memo for the built message classes. upb descriptor
    objects are NOT picklable, and vector_ray is registered for
    cloudpickle by-value shipping (see _compat.register_package_for_
    workers) — a module-global memo here would be serialized into every
    task and fail. Stashing the memo on the google.protobuf module
    (always pickled by reference) keeps it strictly process-local."""
    import google.protobuf as _gp

    cache = getattr(_gp, "_vector_ray_native_cache", None)
    if cache is None:
        cache = {}
        _gp._vector_ray_native_cache = cache
    return cache


def _build_classes() -> dict:
    """Build the Event/Log/Metric message classes from a runtime
    FileDescriptorProto (once per process)."""
    cache = _class_cache() if HAVE_PROTOBUF else {}
    if cache:
        return cache
    if not HAVE_PROTOBUF:
        raise VrlError(
            "the protobuf `native` codec requires a protobuf runtime; "
            "use `parse_native_json` (Vector's native_json codec) instead"
        )
    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vector_ray_native.proto"
    fdp.package = "vector_ray.native"
    fdp.syntax = "proto3"

    value = fdp.message_type.add()
    value.name = "Value"
    value.oneof_decl.add().name = "kind"
    for num, (nm, typ) in enumerate(
        [
            ("string_v", F.TYPE_STRING),
            ("integer_v", F.TYPE_INT64),
            ("float_v", F.TYPE_DOUBLE),
            ("bool_v", F.TYPE_BOOL),
        ],
        start=1,
    ):
        f = value.field.add(name=nm, number=num, type=typ, label=F.LABEL_OPTIONAL)
        f.oneof_index = 0

    field = fdp.message_type.add()
    field.name = "Field"
    field.field.add(name="key", number=1, type=F.TYPE_STRING, label=F.LABEL_OPTIONAL)
    field.field.add(
        name="value",
        number=2,
        type=F.TYPE_MESSAGE,
        label=F.LABEL_OPTIONAL,
        type_name=".vector_ray.native.Value",
    )

    log = fdp.message_type.add()
    log.name = "Log"
    log.field.add(
        name="fields",
        number=1,
        type=F.TYPE_MESSAGE,
        label=F.LABEL_REPEATED,
        type_name=".vector_ray.native.Field",
    )

    metric = fdp.message_type.add()
    metric.name = "Metric"
    metric.field.add(name="name", number=1, type=F.TYPE_STRING, label=F.LABEL_OPTIONAL)
    metric.field.add(name="kind", number=2, type=F.TYPE_STRING, label=F.LABEL_OPTIONAL)
    metric.field.add(name="value", number=3, type=F.TYPE_DOUBLE, label=F.LABEL_OPTIONAL)
    metric.field.add(
        name="tags",
        number=4,
        type=F.TYPE_MESSAGE,
        label=F.LABEL_REPEATED,
        type_name=".vector_ray.native.Field",
    )

    event = fdp.message_type.add()
    event.name = "Event"
    event.oneof_decl.add().name = "event"
    for num, (nm, tn) in enumerate(
        [("log", ".vector_ray.native.Log"), ("metric", ".vector_ray.native.Metric")],
        start=1,
    ):
        f = event.field.add(
            name=nm, number=num, type=F.TYPE_MESSAGE, label=F.LABEL_OPTIONAL,
            type_name=tn,
        )
        f.oneof_index = 0

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    cache.update(
        {
            n: message_factory.GetMessageClass(
                pool.FindMessageTypeByName(f"vector_ray.native.{n}")
            )
            for n in ("Value", "Field", "Log", "Metric", "Event")
        }
    )
    return cache


def _set_value(value_msg, v) -> None:
    # bool before int: Python bools are ints
    if isinstance(v, bool):
        value_msg.bool_v = v
    elif isinstance(v, int):
        value_msg.integer_v = v
    elif isinstance(v, float):
        value_msg.float_v = v
    else:
        value_msg.string_v = str(v)


def encode_log_rows(t: pa.Table, keys: list[str], out: str = "message") -> pa.Table:
    """Encode each row's ``keys`` columns as one native log Event message
    in binary column ``out`` (other columns pass through)."""
    cls = _build_classes()
    Event = cls["Event"]
    cols = [t[k].to_pylist() for k in keys]
    payloads = []
    for row in zip(*cols):
        ev = Event()
        for k, v in zip(keys, row):
            if v is None:
                continue
            f = ev.log.fields.add()
            f.key = k
            _set_value(f.value, v)
        payloads.append(ev.SerializeToString())
    t = t.drop_columns([c for c in (out,) if c in t.column_names])
    return t.append_column(out, pa.array(payloads, pa.binary()))


def encode_metric_rows(
    t: pa.Table,
    name_field: str = "name",
    kind_field: str = "kind",
    value_field: str = "value",
    tag_fields: list[str] | None = None,
    out: str = "message",
) -> pa.Table:
    """Encode each row as one native metric Event message."""
    cls = _build_classes()
    Event = cls["Event"]
    names = t[name_field].to_pylist()
    kinds = t[kind_field].to_pylist()
    vals = t[value_field].to_pylist()
    tag_fields = tag_fields or []
    tags = [t[f].to_pylist() for f in tag_fields]
    payloads = []
    for i in range(t.num_rows):
        ev = Event()
        m = ev.metric
        if names[i] is not None:
            m.name = names[i]
        if kinds[i] is not None:
            m.kind = kinds[i]
        if vals[i] is not None:
            m.value = float(vals[i])
        for fname, col in zip(tag_fields, tags):
            if col[i] is None:
                continue
            f = m.tags.add()
            f.key = fname
            _set_value(f.value, col[i])
        payloads.append(ev.SerializeToString())
    t = t.drop_columns([c for c in (out,) if c in t.column_names])
    return t.append_column(out, pa.array(payloads, pa.binary()))


_ARROW_TYPES = {
    "int": pa.int64(),
    "float": pa.float64(),
    "string": pa.string(),
    "bool": pa.bool_(),
}


def compile_parse_native(op: dict):
    """remap-op compiler for ``parse_native`` (mirrors parse_native_json,
    stages/core.py): decode a binary column of Event messages into
    ``__kind`` + metric columns + the declared log-field columns."""
    field = op["field"]
    keys = list(op.get("keys", []))
    types = op.get("types", {})
    bad = {k: v for k, v in types.items() if v not in _ARROW_TYPES}
    if bad:
        raise VrlError(
            f"parse_native types must be one of {sorted(_ARROW_TYPES)}; got {bad}"
        )
    _build_classes()  # fail at compile time if protobuf is missing

    def _value_of(value_msg):
        which = value_msg.WhichOneof("kind")
        return getattr(value_msg, which) if which else None

    def _apply(t: pa.Table) -> pa.Table:
        from vector_ray.stages.core import _set_column

        Event = _build_classes()["Event"]
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)):
            col = pc.cast(col, pa.binary())
        kinds, names, mkinds, mvals = [], [], [], []
        logs: dict[str, list] = {k: [] for k in keys}
        for payload in col.to_pylist():
            ev = Event()
            if payload:
                ev.ParseFromString(payload)
            which = ev.WhichOneof("event")
            if which == "metric":
                m = ev.metric
                kinds.append("metric")
                names.append(m.name or None)
                mkinds.append(m.kind or None)
                mvals.append(m.value)
                for k in keys:
                    logs[k].append(None)
            else:
                kinds.append("log")
                names.append(None)
                mkinds.append(None)
                mvals.append(None)
                fields = (
                    {f.key: _value_of(f.value) for f in ev.log.fields}
                    if which == "log"
                    else {}
                )
                for k in keys:
                    logs[k].append(fields.get(k))
        t = _set_column(t, "__kind", pa.array(kinds, pa.string()))
        t = _set_column(t, "metric_name", pa.array(names, pa.string()))
        t = _set_column(t, "metric_kind", pa.array(mkinds, pa.string()))
        t = _set_column(t, "metric_value", pa.array(mvals, pa.float64()))
        for k in keys:
            want = _ARROW_TYPES.get(types.get(k), None)
            vals = pa.array(logs[k], want) if want else pa.array(logs[k])
            t = _set_column(t, k, vals)
        return t

    return _apply
