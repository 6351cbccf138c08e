"""Declarative mapping-config -> Catalyst ``Column``-tree compiler.

The reference's only "query language" is a JSON mapping tree interpreted
per row, per field, inside a Lambda (perform_transform,
transformation_function/app.py:112-148; dot locator app.py:92-109; enum
app.py:118-124; dispatch app.py:227-251; eventday app.py:73-81). This
module compiles the SAME config format ONCE into Column expressions, so
Catalyst constant-folds the literal subtrees, prunes unused input columns,
and whole-stage-codegens the transform — per-row Python never runs.

Config shape (see reference mappings/*.json)::

    {"custom_source_events": {
        "source_name": str,
        "matched_field": "$.EventId",               # event-type dispatch
        "timestamp": {"field": "$...", "format": "%Y-..." | "epoch"},
        "ocsf_mapping": {
            "<matched value>": {"schema": str, "schema_mapping": {...}}}}}

schema_mapping node semantics (all reference-compatible):
  * leaf str starting "$."      -> field extract (nested structs AND maps;
                                   "$.UserDefined.x" reads top-level x,
                                   app.py:95-96)
  * leaf anything else          -> literal, keeps its JSON type
  * {"enum": {"evaluate", "values", "other"}} -> dictionary/CASE lookup
  * other dict                  -> nested output struct (recursive)

Divergences from the reference (documented, deliberate — SURVEY.md §2.A
bug list): rejects are persisted with a reason instead of dropped
(app.py:414-415); epoch timestamps parse in UTC, not host TZ (app.py:75);
optional ``fix_type_uid`` recomputes class_uid*100+activity_id live
(app.py:68-70 is dead code; the shipped configs hardcode stale values).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .timeops import eventday as _eventday_col

# ---------------------------------------------------------------- strptime

_STRPTIME = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%f": "SSSSSS", "%y": "yy", "%j": "DDD", "%z": "XX",
    "%p": "a", "%I": "hh",
}


def strptime_to_spark(fmt: str) -> str:
    """Convert a Python strptime format to a Spark datetime pattern,
    quoting literal letters (e.g. the T / Z in ISO-8601)."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            chunk = "".join(lit)
            if any(c.isalpha() for c in chunk):
                chunk = "'" + chunk.replace("'", "''") + "'"
            out.append(chunk)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok == "%%":
                lit.append("%")
            else:
                if tok not in _STRPTIME:
                    raise ValueError(f"unsupported strptime token {tok!r}")
                flush()
                out.append(_STRPTIME[tok])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def parse_event_time(col: Column, fmt: str) -> Column:
    """timestamp_transform (app.py:73-81) minus the local-TZ bug:
    'epoch' -> UTC; else strptime pattern."""
    if fmt == "epoch":
        return F.timestamp_seconds(col.cast("long"))
    return F.to_timestamp(col, strptime_to_spark(fmt))


# ------------------------------------------------------------- dot locator


def resolve_dot_locator(
    path: str, schema: T.StructType, coerce_string: bool = True
) -> Column:
    """Compile ``$.a.b.c`` into a typed field access (struct fields and map
    keys both supported). Missing paths compile to NULL — the reference
    nulls them at runtime with a warning (app.py:101-106,131-136).

    ``$.UserDefined.x`` reads top-level ``x`` (app.py:95-96).
    ``coerce_string`` replicates the reference's str() coercion
    (app.py:106); struct/array/map results are JSON-encoded instead of
    Python-repr'd (documented divergence).
    """
    if not path.startswith("$."):
        raise ValueError(f"not a dot locator: {path!r}")
    parts = path.split(".")[1:]
    if parts and parts[0] == "UserDefined":
        parts = parts[1:2]

    dtype: T.DataType = schema
    col: Column | None = None
    for part in parts:
        if isinstance(dtype, T.StructType):
            if part not in dtype.fieldNames():
                return F.lit(None).cast("string")
            dtype = dtype[part].dataType
            col = F.col(part) if col is None else col.getField(part)
        elif isinstance(dtype, T.MapType):
            col = col.getItem(part)
            dtype = dtype.valueType
        else:
            return F.lit(None).cast("string")
    if col is None:
        return F.lit(None).cast("string")
    if coerce_string:
        if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
            return F.to_json(col)
        if not isinstance(dtype, T.StringType):
            return col.cast("string")
    return col


# ---------------------------------------------------------------- compiler


@dataclass
class TransformResult:
    """Mapped/unmapped split (the reference logs-and-drops rejects,
    app.py:414-415; we keep them, with a reason)."""

    mapped: DataFrame
    rejects: DataFrame


class MappingCompiler:
    """Compile one source mapping file into DataFrame transforms."""

    def __init__(
        self,
        mapping: dict[str, Any],
        as_reference_strings: bool = True,
        fix_type_uid: bool = False,
    ):
        self.cfg = mapping["custom_source_events"]
        self.source_name: str = self.cfg.get("source_name", "unknown")
        self.matched_field: str = self.cfg["matched_field"]
        self.ts_field: str = self.cfg["timestamp"]["field"]
        self.ts_format: str = self.cfg["timestamp"]["format"]
        self.coerce = as_reference_strings
        self.fix_type_uid = fix_type_uid

    # -- node compilers ----------------------------------------------------

    def _leaf(self, value: Any, schema: T.StructType) -> Column:
        if isinstance(value, str) and value.startswith("$."):
            return resolve_dot_locator(value, schema, self.coerce)
        return F.lit(value)

    def _enum(self, node: dict[str, Any], schema: T.StructType) -> Column:
        spec = node["enum"]
        evaluated = resolve_dot_locator(spec["evaluate"], schema, coerce_string=True)
        pairs: list[Column] = []
        for k, v in spec["values"].items():
            pairs.extend([F.lit(str(k)), F.lit(v)])
        # try_element_at: missing key -> NULL -> coalesce to 'other'
        # (plain element_at throws under ANSI mode)
        lookup = F.try_element_at(F.create_map(*pairs), evaluated)
        return F.coalesce(lookup, F.lit(spec.get("other")))

    def _node(self, node: Any, schema: T.StructType) -> Column:
        if isinstance(node, dict):
            if "enum" in node:
                return self._enum(node, schema)
            return F.struct(
                *[self._node(v, schema).alias(k) for k, v in node.items()]
            )
        return self._leaf(node, schema)

    def compile_event_type(
        self, matched_value: str, schema: T.StructType
    ) -> list[Column]:
        """Top-level schema_mapping keys -> one Column each (the write path
        flattens one level, app.py:401 json_normalize(max_level=0))."""
        emap = self.cfg["ocsf_mapping"][matched_value]["schema_mapping"]
        named = {k: self._node(v, schema) for k, v in emap.items()}
        if self.fix_type_uid and "class_uid" in emap and "activity_id" in emap:
            class_uid = self._node(emap["class_uid"], schema).cast("long")
            activity = self._node(emap["activity_id"], schema).cast("long")
            named["type_uid"] = class_uid * 100 + activity
        return [c.alias(k) for k, c in named.items()]

    # -- whole-source transform ---------------------------------------------

    def matched_col(self, schema: T.StructType) -> Column:
        return resolve_dot_locator(self.matched_field, schema, coerce_string=True)

    def event_time_col(self, schema: T.StructType) -> Column:
        raw = resolve_dot_locator(self.ts_field, schema, coerce_string=True)
        return parse_event_time(raw, self.ts_format)

    def transform(self, df: DataFrame) -> TransformResult:
        """Event-type dispatch (app.py:227-251) as filter + per-type select
        + unionByName(allowMissingColumns) — mixed-class unions with
        NULL-filled missing columns, exactly like the reference's
        mixed-schema parquet groups (app.py:396-401).

        Envelope columns: source, target_schema, event_time (typed), and
        the eventday partition key (app.py:239-244).
        """
        schema = df.schema
        matched = self.matched_col(schema)
        ts = self.event_time_col(schema)
        base = df.select(
            "*",
            matched.alias("__matched"),
            ts.alias("event_time"),
            _eventday_col(ts).alias("eventday"),
        )

        mapped_parts: list[DataFrame] = []
        for value, emap in self.cfg["ocsf_mapping"].items():
            part = base.filter(F.col("__matched") == str(value)).select(
                F.lit(self.source_name).alias("source"),
                F.lit(emap["schema"]).alias("target_schema"),
                F.col("event_time"),
                F.col("eventday"),
                *self.compile_event_type(value, schema),
            )
            mapped_parts.append(part)
        mapped = mapped_parts[0]
        for p in mapped_parts[1:]:
            mapped = mapped.unionByName(p, allowMissingColumns=True)

        known = [F.lit(str(v)) for v in self.cfg["ocsf_mapping"]]
        reason = (
            F.when(F.col("__matched").isNull(), "no_matched_value")
            .when(F.col("event_time").isNull(), "bad_timestamp")
            .when(~F.col("__matched").isin(*known), "no_mapping_for_value")
        )
        rejects = (
            base.select(
                F.lit(self.source_name).alias("source"),
                reason.alias("reject_reason"),
                F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("raw"),
            )
            .filter(F.col("reject_reason").isNotNull())
        )
        mapped = mapped.filter(
            F.col("event_time").isNotNull() & F.col("eventday").isNotNull()
        )
        return TransformResult(mapped=mapped, rejects=rejects)
