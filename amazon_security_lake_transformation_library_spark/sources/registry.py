"""Source registry: names, preprocessors, input routing, mapping configs.

Reference: transformation_function/sources_config.json (shape) +
app.py:27-65 (load + plugin import), app.py:151-201 (detection).
Detection here happens at PLAN time (path routing / partition pruning) or
as Column predicates — not per record in Python.

Fixes reference bug #1 (SURVEY.md §2.A): a missing ``mapping_file`` key is
a soft skip, not a module-import KeyError.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.mapping_compiler import MappingCompiler


def prefix_glob_to_regex(prefix: str) -> str:
    """create_regex_from_prefix (app.py:84-89): ``*`` -> ``.*``, anchored.
    (The reference escapes '/' which is a no-op in regex; we escape regex
    metacharacters properly and keep identical match behavior for the
    config shapes it supports.)"""
    escaped = re.escape(prefix).replace(r"\*", ".*")
    return f"^{escaped}$"


@dataclass
class Source:
    name: str
    mapping: dict[str, Any] | None = None
    preprocessor: Callable[[DataFrame], DataFrame] | None = None
    kinesis_metadata_field: str | None = None
    s3_buckets: list[dict[str, str]] = field(default_factory=list)

    def compiler(self, **kw) -> MappingCompiler:
        if self.mapping is None:
            raise ValueError(f"source {self.name} has no mapping")
        return MappingCompiler(self.mapping, **kw)


class SourceRegistry:
    def __init__(self, sources: list[Source]):
        self.sources = {s.name: s for s in sources}

    @classmethod
    def from_config(
        cls,
        config: dict[str, Any],
        mappings: dict[str, dict[str, Any]],
        preprocessors: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    ) -> "SourceRegistry":
        """Build from a sources_config.json-shaped dict + preloaded mapping
        dicts keyed by mapping file name + preprocessor callables keyed by
        module name (the plugin contract, app.py:46-65)."""
        preprocessors = preprocessors or {}
        out = []
        for s in config["sources"]:
            kin = s.get("input_paths", {}).get("kinesis", {})
            s3 = s.get("input_paths", {}).get("s3", {})
            out.append(
                Source(
                    name=s["name"],
                    mapping=mappings.get(s.get("mapping_file", "")),
                    preprocessor=preprocessors.get(s.get("preprocessor_module", "")),
                    kinesis_metadata_field=(
                        kin.get("metadata_field", "source")
                        if kin.get("enabled")
                        else None
                    ),
                    s3_buckets=(
                        s3.get("source_buckets", []) if s3.get("enabled") else []
                    ),
                )
            )
        return cls(out)

    @classmethod
    def from_files(cls, config_path: str, mappings_dir: str, preprocessors=None):
        with open(config_path) as f:
            config = json.load(f)
        mappings = {}
        for s in config["sources"]:
            # The reference KeyErrors on a missing mapping_file at import
            # (app.py:38 + sources_config.json:3-12, SURVEY.md bug #1) even
            # though mappings/windows_sysmon.json exists on disk. We read
            # the declared file when present and otherwise fall back to the
            # name convention <source-name with '-'->'_'>.json.
            mf = s.get("mapping_file") or s["name"].replace("-", "_") + ".json"
            try:
                with open(f"{mappings_dir}/{mf}") as f:
                    mappings[mf] = json.load(f)
                s.setdefault("mapping_file", mf)
            except FileNotFoundError:
                pass
        return cls.from_config(config, mappings, preprocessors)

    # -- detection ----------------------------------------------------------

    def detect_s3_key(self, bucket: str, key: str) -> str | None:
        """Path-time routing (app.py:178-201): used by the job planner to
        group input files by source BEFORE reading — Spark then does one
        scan per source with full partition/path pruning."""
        for s in self.sources.values():
            for b in s.s3_buckets:
                if b.get("bucket_name") == bucket and b.get("prefix"):
                    if re.match(prefix_glob_to_regex(b["prefix"]), key):
                        return s.name
        return None

    def s3_source_col(self, bucket: Column, key: Column) -> Column:
        """Plan-time Column analog of :meth:`detect_s3_key` (app.py:178-201)
        for when keys arrive as DATA (e.g. an inventory / SQS-notification
        table) rather than as the file listing: ordered first-match CASE
        over the configured (bucket, prefix-glob) routes. NULL for
        unrouted keys — same contract as detect_s3_key returning None."""
        routes = [
            (s.name, b["bucket_name"], prefix_glob_to_regex(b["prefix"]))
            for s in self.sources.values()
            for b in s.s3_buckets
            if b.get("bucket_name") and b.get("prefix")
        ]
        expr = F.lit(None).cast("string")
        for name, bname, pat in reversed(routes):
            expr = F.when(
                (bucket == F.lit(bname)) & key.rlike(pat), F.lit(name)
            ).otherwise(expr)
        return expr

    def kinesis_source_col(self, payload: Column, has_metadata: bool = True) -> Column:
        """Column-level source detection for decoded Kinesis payload structs
        (app.py:151-175): metadata-field equality, including nested
        ``metadata.<field>``."""
        expr = F.lit(None).cast("string")
        for s in reversed(list(self.sources.values())):
            mf = s.kinesis_metadata_field
            if not mf:
                continue
            direct = payload.getField(mf) == s.name
            cond = direct
            if has_metadata:
                nested = payload.getField("metadata").getField(mf) == s.name
                cond = direct | nested
            expr = F.when(cond, F.lit(s.name)).otherwise(expr)
        return expr
