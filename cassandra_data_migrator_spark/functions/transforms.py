"""Feature transforms — the CDM feature-plugin surface as DataFrame ops.

Reference: CDM's ``Featureset`` plugins (``feature/FeatureFactory.java``)
mutate the statement column lists at bind time; here each feature is a
pure ``DataFrame -> DataFrame`` function built from Catalyst
expressions, so pushdown/pruning/codegen apply automatically.

| here                | reference                                        |
|---------------------|--------------------------------------------------|
| explode_map         | feature/ExplodeMap.java:181-201; fan-out data/PKFactory.java:241-254 |
| extract_json        | feature/ExtractJson.java:132-138                 |
| constant_columns    | feature/ConstantColumns.java:80-116              |
| rename_columns      | data/DataUtility.java:71-140 (origin→target map; -1 => unset, CqlTable.java:408-428) |
| null_key_replace    | schema/CqlTable.java:375-400 (convertNull)       |
| scrub_null_map_values | CqlTable.java:348-373 (map null-value scrub)   |
| greatest_writetime / greatest_ttl | feature/WritetimeTTL.java:235-281  |
| cast_columns        | cql/codec/Codecset.java:18-21 (14 codec pairs) — Catalyst casts |
| cast_nested         | data/CqlConversion.java:262-406 (UDT/tuple/collection codec chains) |
| skip_columns        | CqlTable.java:479-483                            |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_map(
    df: DataFrame, map_col: str, key_alias: str, value_alias: str, keep_map: bool = False
) -> DataFrame:
    """One row per map entry; map key typically joins the target PK
    (ExplodeMap feature)."""
    out = df.select("*", F.explode(F.col(map_col)).alias(key_alias, value_alias))
    return out if keep_map else out.drop(map_col)


def extract_json(
    df: DataFrame, json_col: str, field: str, out_col: str, overwrite: bool = True
) -> DataFrame:
    """Pull one top-level JSON field into a column. With
    ``overwrite=False`` an existing non-null target value is kept
    (ExtractJson overwrite-skip, DiffJobSession.java:265-270)."""
    extracted = F.get_json_object(F.col(json_col), f"$.{field}")
    if not overwrite and out_col in df.columns:
        extracted = F.coalesce(F.col(out_col), extracted)
    return df.withColumn(out_col, extracted)


def constant_columns(df: DataFrame, constants: dict[str, object]) -> DataFrame:
    """Add literal-valued columns (may participate in the downstream key,
    as in ConstantColumns + PKFactory.java:298-322)."""
    for name, value in constants.items():
        df = df.withColumn(name, F.lit(value))
    return df


def rename_columns(
    df: DataFrame, mapping: dict[str, str], target_cols: list[str] | None = None
) -> DataFrame:
    """Origin→target column correspondence by name with a rename map.

    Columns named in ``mapping`` are renamed; if ``target_cols`` is
    given, target columns with no origin counterpart are added as nulls
    (the reference's ``-1`` corresponding-index => written-as-unset
    semantics) and origin-only columns are dropped."""
    out = df
    for src, dst in mapping.items():
        out = out.withColumnRenamed(src, dst)
    if target_cols is not None:
        cols = []
        for c in target_cols:
            cols.append(F.col(c) if c in out.columns else F.lit(None).alias(c))
        out = out.select(*cols)
    return out


def null_key_replace(
    df: DataFrame, key_cols: list[str], defaults: dict[str, object] | None = None
) -> DataFrame:
    """Replace null key components with defaults ('' for strings,
    configured epoch for timestamps) instead of dropping the row."""
    defaults = defaults or {}
    for c in key_cols:
        dt = dict(df.dtypes)[c]
        default = defaults.get(c, "" if dt == "string" else None)
        if default is not None:
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit(default).cast(dt)))
    return df


def drop_invalid_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Validity filter: rows with any null key component are errors
    (EnhancedPK.java:130-152)."""
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(c).isNotNull()
    return df.where(cond)


def scrub_null_map_values(df: DataFrame, map_cols: list[str]) -> DataFrame:
    """Drop map entries whose value is null (avoids tombstone-equivalent
    writes)."""
    for c in map_cols:
        df = df.withColumn(c, F.map_filter(F.col(c), lambda k, v: v.isNotNull()))
    return df


def greatest_writetime(df: DataFrame, wt_cols: list[str], out_col: str = "writetime",
                       increment: int = 0) -> DataFrame:
    """Row timestamp = max column writetime (+ constant increment)."""
    expr = F.greatest(*[F.col(c) for c in wt_cols]) if len(wt_cols) > 1 else F.col(wt_cols[0])
    if increment:
        expr = expr + F.lit(increment)
    return df.withColumn(out_col, expr)


def greatest_ttl(df: DataFrame, ttl_cols: list[str], out_col: str = "ttl") -> DataFrame:
    expr = F.greatest(*[F.col(c) for c in ttl_cols]) if len(ttl_cols) > 1 else F.col(ttl_cols[0])
    return df.withColumn(out_col, expr)


def ttl_alive_predicate(ts_col: str, ttl_col: str, as_of) -> "F.Column":
    """True for rows still alive at ``as_of``: a row expires
    ``ttl_col`` seconds after its write timestamp (USING TTL analog,
    TargetInsertStatement.java:128); null TTL never expires. Epoch-ms
    arithmetic so the comparison is exact and oracle-reproducible."""
    exp_ms = (
        F.unix_millis(F.col(ts_col).cast("timestamp"))
        + F.col(ttl_col).cast("long") * F.lit(1000)
    )
    as_of_ms = F.unix_millis(F.lit(as_of).cast("timestamp"))
    return F.col(ttl_col).isNull() | (exp_ms > as_of_ms)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Per-column type conversion — the codec-pair pipeline collapsed
    into Catalyst casts (INT↔TEXT, TIMESTAMP↔TEXT, DECIMAL↔TEXT, ...)."""
    for c, t in casts.items():
        df = df.withColumn(c, F.col(c).cast(t))
    return df


def _convert_nested_expr(col, src, dst, renames: dict[str, str] | None = None):
    """Recursively convert ``col`` from type ``src`` to type ``dst``.

    Struct fields are matched by (renamed) name — absent target fields
    become typed nulls (the reference's missing-column => unset
    semantics); array elements and map keys/values recurse through
    ``transform`` / ``transform_keys`` / ``transform_values``; leaves are
    Catalyst casts. The reference equivalent is the codec-chain walk in
    ``data/CqlConversion.java:262-319`` (primitives), ``:321-357`` (UDT
    field-by-field), ``:359-406`` (collections).
    """
    from pyspark.sql import types as T

    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        ren = renames or {}
        by_target_name = {ren.get(f.name, f.name): f for f in src.fields}
        parts = []
        for tf in dst.fields:
            sf = by_target_name.get(tf.name)
            if sf is None:
                parts.append(F.lit(None).cast(tf.dataType).alias(tf.name))
            else:
                parts.append(
                    _convert_nested_expr(col.getField(sf.name), sf.dataType, tf.dataType)
                    .alias(tf.name)
                )
        # a null struct stays null (not a struct of nulls)
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(F.struct(*parts))
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(
            col, lambda e: _convert_nested_expr(e, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType) and isinstance(src, T.MapType):
        out = F.transform_keys(
            col, lambda k, v: _convert_nested_expr(k, src.keyType, dst.keyType)
        )
        return F.transform_values(
            out, lambda k, v: _convert_nested_expr(v, src.valueType, dst.valueType)
        )
    return col.cast(dst)


def cast_nested(
    df: DataFrame,
    specs: dict[str, object],
    field_renames: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """Recursive nested-type conversion — UDT/tuple/collection codec
    chains as pure Catalyst expressions (no UDFs, codegen-friendly).

    ``specs`` maps column name -> target type (DDL string or DataType):
    struct fields are cast/renamed/added field-by-field, array elements
    and map keys/values element-wise, recursively to any depth.
    ``field_renames[col]`` maps origin struct-field names to target
    names (the ``SIT/features/04_udt_mapper`` rename scenario).

    Reference: ``data/CqlConversion.java:262-406``.
    """
    from pyspark.sql import types as T

    schema = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for cname, target in specs.items():
        dst = (
            target
            if isinstance(target, T.DataType)
            else T._parse_datatype_string(str(target))
        )
        ren = (field_renames or {}).get(cname)
        out = out.withColumn(
            cname, _convert_nested_expr(F.col(cname), schema[cname], dst, ren)
        )
    return out


def format_timestamp(df: DataFrame, ts_col: str, out_col: str,
                     fmt: str = "yyyy-MM-dd HH:mm:ss", zone: str = "UTC") -> DataFrame:
    """TIMESTAMP↔formatted-TEXT codec: render the instant as wall-clock
    text IN ``zone`` (TIMESTAMP_StringFormatCodec.java:1-108 formats an
    Instant through a zoned DateTimeFormatter), so a non-UTC zone shifts
    the rendered clock, not the instant."""
    return df.withColumn(
        out_col, F.date_format(F.from_utc_timestamp(F.col(ts_col), zone), fmt)
    )


def skip_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.drop(*cols)


def pk_render(df: DataFrame, key_cols: list[str], out_col: str = "pk_str") -> DataFrame:
    """Render the (composite) primary key as one diagnostic string:
    ``[v1 %% v2 %% ...]`` with null components as ``(null)`` — the
    ``EnhancedPK.toString`` report format used in diff/guardrail logs
    (``data/EnhancedPK.java:155-166``; the null render is ``:160``)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("(null)")) for c in key_cols
    ]
    return df.withColumn(
        out_col, F.concat(F.lit("["), F.concat_ws(" %% ", *parts), F.lit("]"))
    )
