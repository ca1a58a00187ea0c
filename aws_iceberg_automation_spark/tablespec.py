"""Declarative table specs: YAML → validated TableSpec → StructType + DDL.

Layer-A parity with the reference's config-driven Iceberg DDL
(`create_iceberg_tables.py:10-12` load, `:24-37` SQL template,
`customers.yml:1-28` spec shape), rebuilt idiomatically:

- The spec is validated (the reference passed YAML through unchecked).
- The rendered DDL always derives from the spec — the reference's
  dead-code bug (`create_iceberg_tables.py:38-55` hardcodes a
  `bronze.customers` DDL over the config-rendered one) is *not*
  replicated; the template at `:29-37` is treated as the spec of the
  intended semantics.
- Types go through a real parser into Spark ``StructType`` (the
  reference interpolated strings verbatim), so bad specs fail at load
  time, not at DDL execution.
- Partition columns accept Iceberg transforms (``bucket(16, id)``,
  ``days(ts)``, ``truncate(4, s)``) alongside identity — at 100 TB the
  transform choice *is* the partition-pruning story.

Spec shape (YAML):

    database: bronze
    table: customers
    location: s3://bucket/warehouse/bronze/customers   # optional
    format_version: 2                                  # optional, default 2
    partitioned_by: [CountryRegion, PostalCode]        # optional
    columns:
      - {name: FirstName, type: string}
      ...
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


class SpecError(ValueError):
    """Invalid table spec — raised loudly (the reference swallowed errors,
    `create_iceberg_tables.py:153-156`; we fail the run instead)."""


_SIMPLE_TYPES: dict[str, DataType] = {
    "string": StringType(),
    "varchar": StringType(),
    "char": StringType(),
    "boolean": BooleanType(),
    "bool": BooleanType(),
    "binary": BinaryType(),
    "tinyint": ByteType(),
    "byte": ByteType(),
    "smallint": ShortType(),
    "short": ShortType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "bigint": LongType(),
    "long": LongType(),
    "float": FloatType(),
    "real": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "timestamp": TimestampType(),
    "timestamp_ltz": TimestampType(),
    "timestamp_ntz": TimestampNTZType(),
}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_TRANSFORM = re.compile(
    r"^(?P<fn>identity|bucket|truncate|years?|months?|days?|hours?)\s*"
    r"(\(\s*(?P<args>[^)]*)\s*\))?$",
    re.IGNORECASE,
)


def parse_type(s: str) -> DataType:
    """Parse a Spark SQL DDL type string into a DataType (pure Python —
    no running session needed, unlike ``DataType.fromDDL``)."""
    t, rest = _parse_type(s.strip())
    if rest.strip():
        raise SpecError(f"trailing input {rest!r} after type in {s!r}")
    return t


def _parse_type(s: str) -> tuple[DataType, str]:
    s = s.lstrip()
    m = re.match(r"^([A-Za-z_]+)", s)
    if not m:
        raise SpecError(f"cannot parse type {s!r}")
    head, rest = m.group(1).lower(), s[m.end():].lstrip()
    if head == "decimal" or head == "numeric":
        m = re.match(r"^\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)", rest)
        if m:
            return DecimalType(int(m.group(1)), int(m.group(2) or 0)), rest[m.end():]
        return DecimalType(10, 0), rest
    if head in ("varchar", "char"):
        m = re.match(r"^\(\s*\d+\s*\)", rest)
        return StringType(), rest[m.end():] if m else rest
    if head == "array":
        if not rest.startswith("<"):
            raise SpecError(f"array needs <element> in {s!r}")
        elem, rest = _parse_type(rest[1:])
        rest = rest.lstrip()
        if not rest.startswith(">"):
            raise SpecError(f"unclosed array<> in {s!r}")
        return ArrayType(elem), rest[1:]
    if head == "map":
        if not rest.startswith("<"):
            raise SpecError(f"map needs <k,v> in {s!r}")
        k, rest = _parse_type(rest[1:])
        rest = rest.lstrip()
        if not rest.startswith(","):
            raise SpecError(f"map needs value type in {s!r}")
        v, rest = _parse_type(rest[1:])
        rest = rest.lstrip()
        if not rest.startswith(">"):
            raise SpecError(f"unclosed map<> in {s!r}")
        return MapType(k, v), rest[1:]
    if head == "struct":
        if not rest.startswith("<"):
            raise SpecError(f"struct needs <fields> in {s!r}")
        rest = rest[1:]
        fields = []
        while True:
            rest = rest.lstrip()
            if rest.startswith(">"):
                rest = rest[1:]
                break
            m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*:", rest)
            if not m:
                raise SpecError(f"bad struct field near {rest!r}")
            fname, rest = m.group(1), rest[m.end():]
            ftype, rest = _parse_type(rest)
            fields.append(StructField(fname, ftype, True))
            rest = rest.lstrip()
            if rest.startswith(","):
                rest = rest[1:]
        return StructType(fields), rest
    if head in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[head], rest
    raise SpecError(f"unknown type {head!r} in {s!r}")


def type_to_ddl(t: DataType) -> str:
    """Canonical DDL rendering (Spark's simpleString is already DDL-legal)."""
    return t.simpleString()


@dataclass(frozen=True)
class PartitionField:
    """One PARTITIONED BY entry: identity column or Iceberg transform."""

    transform: str  # identity | bucket | truncate | year | month | day | hour
    column: str
    num: int | None = None  # bucket count / truncate width

    @classmethod
    def parse(cls, raw: str) -> "PartitionField":
        raw = raw.strip()
        if _IDENT.match(raw):
            return cls("identity", raw)
        m = _TRANSFORM.match(raw)
        if not m or not m.group("args"):
            raise SpecError(f"bad partition field {raw!r}")
        fn = m.group("fn").lower()
        if fn != "identity":
            fn = fn.rstrip("s")  # years→year, days→day, ...
        args = [a.strip() for a in m.group("args").split(",") if a.strip()]
        if fn in ("bucket", "truncate"):
            if len(args) != 2 or not args[0].isdigit() or not _IDENT.match(args[1]):
                raise SpecError(f"{fn} needs (N, column): {raw!r}")
            return cls(fn, args[1], int(args[0]))
        if fn in ("identity", "year", "month", "day", "hour"):
            if len(args) != 1 or not _IDENT.match(args[0]):
                raise SpecError(f"{fn} needs (column): {raw!r}")
            return cls(fn, args[0])
        raise SpecError(f"unknown partition transform in {raw!r}")

    def to_ddl(self) -> str:
        if self.transform == "identity":
            return self.column
        if self.num is not None:
            return f"{self.transform}({self.num}, {self.column})"
        return f"{self.transform}({self.column})"


@dataclass(frozen=True)
class TableSpec:
    database: str
    table: str
    columns: tuple[tuple[str, DataType], ...]
    location: str | None = None
    format_version: int = 2
    partitioned_by: tuple[PartitionField, ...] = ()
    properties: tuple[tuple[str, str], ...] = ()
    comment: str | None = None

    @classmethod
    def from_dict(cls, conf: dict) -> "TableSpec":
        missing = [k for k in ("database", "table", "columns") if not conf.get(k)]
        if missing:
            raise SpecError(f"table spec missing required keys: {missing}")
        for key in ("database", "table"):
            if not _IDENT.match(str(conf[key])):
                raise SpecError(f"bad identifier for {key}: {conf[key]!r}")
        cols: list[tuple[str, DataType]] = []
        seen: set[str] = set()
        for c in conf["columns"]:
            if not isinstance(c, dict) or "name" not in c or "type" not in c:
                raise SpecError(f"column entries need {{name, type}}: {c!r}")
            name = str(c["name"])
            if not _IDENT.match(name):
                raise SpecError(f"bad column name {name!r}")
            if name.lower() in seen:
                raise SpecError(f"duplicate column {name!r}")
            seen.add(name.lower())
            cols.append((name, parse_type(str(c["type"]))))
        parts = tuple(PartitionField.parse(str(p)) for p in conf.get("partitioned_by") or ())
        for p in parts:
            if p.column.lower() not in seen:
                raise SpecError(f"partition column {p.column!r} not in columns")
        fv = int(conf.get("format_version", 2))
        if fv not in (1, 2, 3):
            raise SpecError(f"format_version must be 1/2/3, got {fv}")
        props = tuple(
            (str(k), str(v)) for k, v in (conf.get("properties") or {}).items()
        )
        return cls(
            database=conf["database"],
            table=conf["table"],
            columns=tuple(cols),
            location=conf.get("location"),
            format_version=fv,
            partitioned_by=parts,
            properties=props,
            comment=conf.get("comment"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "TableSpec":
        import yaml

        with open(path) as f:
            conf = yaml.safe_load(f)
        if not isinstance(conf, dict):
            raise SpecError(f"{path}: top-level YAML must be a mapping")
        return cls.from_dict(conf)

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.table}"

    def to_struct_type(self) -> StructType:
        return StructType([StructField(n, t, True) for n, t in self.columns])

    def to_ddl(
        self,
        catalog: str | None = None,
        using: str = "iceberg",
        if_not_exists: bool = True,
        include_location: bool = True,
    ) -> str:
        """Render CREATE TABLE DDL (the reference's template,
        `create_iceberg_tables.py:29-37`, made config-faithful)."""
        fq = f"{catalog}.{self.qualified_name}" if catalog else self.qualified_name
        cols = ",\n  ".join(f"{n} {type_to_ddl(t)}" for n, t in self.columns)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        lines = [f"CREATE TABLE {ine}{fq} (", f"  {cols}", f") USING {using}"]
        if self.comment:
            lines.append(f"COMMENT '{self.comment}'")
        if self.partitioned_by:
            parts = ", ".join(p.to_ddl() for p in self.partitioned_by)
            lines.append(f"PARTITIONED BY ({parts})")
        if self.location and include_location:
            lines.append(f"LOCATION '{self.location}'")
        props = dict(self.properties)
        if using == "iceberg":
            props.setdefault("format-version", str(self.format_version))
        if props:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            lines.append(f"TBLPROPERTIES ({kv})")
        return "\n".join(lines)


def _is_safe_widening(old: DataType, new: DataType) -> bool:
    """Iceberg's schema-evolution promotion rules (the only type changes
    that never rewrite data files): int→bigint, float→double, and
    decimal precision growth at the same scale."""
    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
    )

    if isinstance(old, IntegerType) and isinstance(new, LongType):
        return True
    if isinstance(old, FloatType) and isinstance(new, DoubleType):
        return True
    if isinstance(old, DecimalType) and isinstance(new, DecimalType):
        return new.scale == old.scale and new.precision >= old.precision
    return False


def evolve_ddl(
    old: "TableSpec", new: "TableSpec", catalog: str | None = None
) -> list[str]:
    """Diff two versions of a table spec → the ALTER TABLE statements
    that evolve the live table from ``old`` to ``new`` (spec-driven
    schema evolution — the CI flow where the YAML in git is the desired
    state and deploys reconcile the catalog against it).

    Emits, in apply-safe order: ADD COLUMNS (new columns append at the
    end — Iceberg position semantics), safe type widenings (Iceberg's
    promotion rules only — anything else would silently corrupt or
    require a rewrite, so it fails loudly as a SpecError), DROP COLUMN,
    partition-spec changes (Iceberg partition evolution: ADD/DROP
    PARTITION FIELD — metadata-only, old files keep the old layout),
    and TBLPROPERTIES set/unset. Renames are deliberately unsupported:
    a rename is indistinguishable from drop+add in a spec diff, and
    guessing wrong destroys data — rename explicitly in SQL instead."""
    if (old.database, old.table) != (new.database, new.table):
        raise SpecError(
            f"evolve_ddl diffs versions of ONE table, got "
            f"{old.qualified_name} vs {new.qualified_name}"
        )
    fq = f"{catalog}.{new.qualified_name}" if catalog else new.qualified_name
    old_cols = {n.lower(): (n, t) for n, t in old.columns}
    new_cols = {n.lower(): (n, t) for n, t in new.columns}
    stmts: list[str] = []

    added = [new_cols[k] for k in new_cols if k not in old_cols]
    if added:
        cols = ", ".join(f"{n} {type_to_ddl(t)}" for n, t in added)
        stmts.append(f"ALTER TABLE {fq} ADD COLUMNS ({cols})")

    for k in new_cols:
        if k in old_cols:
            (_, ot), (n, nt) = old_cols[k], new_cols[k]
            if ot == nt:
                continue
            if not _is_safe_widening(ot, nt):
                raise SpecError(
                    f"unsafe type change for column {n!r}: "
                    f"{type_to_ddl(ot)} -> {type_to_ddl(nt)} (only int->bigint, "
                    f"float->double, decimal precision growth are in-place)"
                )
            stmts.append(f"ALTER TABLE {fq} ALTER COLUMN {n} TYPE {type_to_ddl(nt)}")

    for k in old_cols:
        if k not in new_cols:
            stmts.append(f"ALTER TABLE {fq} DROP COLUMN {old_cols[k][0]}")

    old_parts = {p.to_ddl() for p in old.partitioned_by}
    new_parts = {p.to_ddl() for p in new.partitioned_by}
    for p in new.partitioned_by:
        if p.to_ddl() not in old_parts:
            stmts.append(f"ALTER TABLE {fq} ADD PARTITION FIELD {p.to_ddl()}")
    for p in old.partitioned_by:
        if p.to_ddl() not in new_parts:
            stmts.append(f"ALTER TABLE {fq} DROP PARTITION FIELD {p.to_ddl()}")

    op, np_ = dict(old.properties), dict(new.properties)
    set_kv = {k: v for k, v in np_.items() if op.get(k) != v}
    if set_kv:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(set_kv.items()))
        stmts.append(f"ALTER TABLE {fq} SET TBLPROPERTIES ({kv})")
    unset = sorted(k for k in op if k not in np_)
    if unset:
        kv = ", ".join(f"'{k}'" for k in unset)
        stmts.append(f"ALTER TABLE {fq} UNSET TBLPROPERTIES ({kv})")
    return stmts
