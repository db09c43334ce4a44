"""Config-driven feature pipeline — the Featureset lifecycle analog.

The reference loads feature plugins from properties and applies them to
every migrated record (``feature/Featureset.java``,
``feature/FeatureFactory.java``; loaded ``job/BaseJobSession.java:45-57``,
validated ``job/AbstractJobSession.java:76-86``). Here the same property
keys build a list of ``DataFrame -> DataFrame`` steps applied to the
LWW winners of every commit slice — declaratively, so Catalyst fuses
the whole pipeline into the scan stage (no extra shuffle, no Python).

Key-preserving features only: ExtractJson, ConstantColumns,
column rename/skip, map null-value scrub, null-PK replacement. The
key-EXTENDING ExplodeMap (map key joins the target PK,
``data/PKFactory.java:241-254``) changes the lake's key shape and is a
table-design decision, not a per-run toggle — it stays an explicit
operator (``functions/transforms.explode_map``; driver queries
``explode_tokens`` / ``explode_map_kv``).

Symmetry invariant: ``jobs.ingest`` applies the pipeline to what it
writes and ``jobs.expected_state`` applies the same pipeline to its
independent WAL fold, so replay-and-verify still proves the lake
matches a from-scratch recompute under the active feature set.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from .config import EngineConfig
from .functions import transforms

# property keys honored here (names from KnownProperties.java:26-498 /
# src/resources/cdm-detailed.properties)
K_EXTRACT_COL = "spark.cdm.feature.extractJson.originColumn"
K_EXTRACT_MAP = "spark.cdm.feature.extractJson.propertyMapping"
K_EXTRACT_OVERWRITE = "spark.cdm.feature.extractJson.overwrite"
K_CONST_NAMES = "spark.cdm.feature.constantColumns.names"
K_CONST_VALUES = "spark.cdm.feature.constantColumns.values"
K_CONST_SPLIT = "spark.cdm.feature.constantColumns.splitRegex"
K_RENAMES = "spark.cdm.schema.origin.column.names.to.target"
K_SKIP = "spark.cdm.schema.origin.column.skip"
K_SCRUB_MAPS = "spark.cdm.transform.map.remove.null.value"
K_NULL_KEY_TS = "spark.cdm.transform.missing.key.ts.replace.value"


def feature_pipeline(cfg: EngineConfig) -> list[Callable[[DataFrame], DataFrame]]:
    """Build the ordered feature steps the active config enables.

    Order mirrors the reference's record path: extract/constant columns
    first (they may be rename targets), then renames, then scrubs/skips.
    """
    x = cfg.extra
    steps: list[Callable[[DataFrame], DataFrame]] = []

    col, mapping = x.get(K_EXTRACT_COL), x.get(K_EXTRACT_MAP)
    if col and mapping:
        # "field" or "field:targetColumn" (ExtractJson.java:46-71)
        field, _, target = str(mapping).partition(":")
        target = target or field
        overwrite = str(x.get(K_EXTRACT_OVERWRITE, "false")).lower() == "true"
        steps.append(
            lambda df, c=col, f=field, t=target, o=overwrite:
            transforms.extract_json(df, c, f, t, overwrite=o)
        )

    names, values = x.get(K_CONST_NAMES), x.get(K_CONST_VALUES)
    if names and values:
        # splitRegex is a REGEX in the reference (ConstantColumns feature;
        # a properties file commonly sets splitRegex=\| since values may
        # contain commas)
        split = x.get(K_CONST_SPLIT, ",")
        consts = dict(zip(str(names).split(","), re.split(str(split), str(values))))
        steps.append(lambda df, k=consts: transforms.constant_columns(df, k))

    renames = x.get(K_RENAMES)
    if renames:
        pairs = dict(p.split(":", 1) for p in str(renames).split(",") if ":" in p)
        steps.append(lambda df, m=pairs: transforms.rename_columns(df, m))

    if str(x.get(K_SCRUB_MAPS, "false")).lower() == "true":
        def scrub(df: DataFrame) -> DataFrame:
            map_cols = [f.name for f in df.schema.fields
                        if f.dataType.typeName() == "map"]
            return transforms.scrub_null_map_values(df, map_cols)
        steps.append(scrub)

    skip = x.get(K_SKIP)
    if skip:
        steps.append(
            lambda df, cols=str(skip).split(","): transforms.skip_columns(df, cols)
        )

    raw_replace = x.get(K_NULL_KEY_TS)
    if raw_replace is not None:
        # the property carries the replacement VALUE (epoch-millis for the
        # timestamp keys it targets); parse it against the key column's
        # actual type so the step is never a silent no-op.
        # INTENTIONAL DIVERGENCE from the reference: CqlTable.convertNull
        # applies this property only to timestamp keys and sources string
        # defaults from a separate property; here ONE property covers any
        # key type (applied verbatim to string keys) — a superset, locked
        # in by test_feature_null_key_ts_replace_value_applied, so a
        # single config knob replaces nulls regardless of key schema
        def replace_null_key(df: DataFrame, raw: str = str(raw_replace)) -> DataFrame:
            dt = dict(df.dtypes).get(cfg.key_col, "string")
            val: object
            if dt.startswith("timestamp"):
                val = datetime.fromtimestamp(
                    int(raw) / 1000.0, tz=timezone.utc
                ).replace(tzinfo=None)
            elif dt in ("bigint", "int", "smallint", "tinyint"):
                val = int(raw)
            elif dt in ("double", "float"):
                val = float(raw)
            else:
                val = raw
            return transforms.null_key_replace(
                df, [cfg.key_col], defaults={cfg.key_col: val}
            )
        steps.append(replace_null_key)

    return steps


def apply_features(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    for step in feature_pipeline(cfg):
        df = step(df)
    return df
