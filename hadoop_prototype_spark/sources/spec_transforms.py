"""Iceberg-style partition TRANSFORMS for the snapshot-table spec
(round-13 verdict #3): ``days(ts)`` / ``hours(ts)`` / ``months(ts)`` /
``years(ts)`` / ``bucket(n, col)`` / ``truncate(w, col)`` alongside the
existing identity columns — so an events table partitions by a raw
timestamp column at day granularity without materializing a derived
column, exactly the gap a Hive/Iceberg user hits first.

Semantics follow Iceberg's spec (time transforms count whole units
since the Unix epoch; truncate is floor-to-width for integers and
prefix for strings; bucket is a hash mod — this engine uses Spark's
``hash`` (Murmur3), not Iceberg's bucket function, since files never
need to be byte-compatible with an Iceberg reader). Each transform
exists in two forms that MUST agree:

- ``expr_sql``: the Spark SQL expression used to (a) range-cluster
  every write on the transformed value and (b) evaluate residual
  predicates after manifest pruning;
- ``transform_py``: the driver-side Python twin used to fold a footer
  [min, max] of the SOURCE column into the transformed range recorded
  in the log, and to transform probe values before manifest comparison.
  Defined only for ORDER-PRESERVING transforms (everything but bucket):
  monotonicity is what makes T(lo)..T(hi) a valid file range. Bucket
  ranges are not derivable from source stats, so commit records them
  with one grouped min/max scan of the new files (O(new data), same
  cost class as the staging write that just produced them).

No reference counterpart: MapReduce partitioning is physical fan-out
(MR lib/partition/*), not a pruning contract; this extends the
snapshot layer's Iceberg-model manifest (SURVEY §1.3).
"""

from __future__ import annotations

import datetime as dt
import re

_EPOCH_DATE = dt.date(1970, 1, 1)
_EPOCH_DT = dt.datetime(1970, 1, 1)

_TIME_KINDS = ("days", "hours", "months", "years")

_SPEC_RE = re.compile(
    r"""^\s*(?:
      (?P<tk>days|hours|months|years)\s*\(\s*(?P<tc>[A-Za-z_]\w*)\s*\)
    | (?P<nk>bucket|truncate)\s*\(\s*(?P<n>\d+)\s*,\s*(?P<nc>[A-Za-z_]\w*)\s*\)
    | (?P<ident>[A-Za-z_]\w*)
    )\s*$""",
    re.VERBOSE | re.IGNORECASE,
)


class SpecItem:
    """One parsed partition-spec entry: an identity column or a
    transform over a source column."""

    __slots__ = ("kind", "col", "n")

    def __init__(self, kind: str, col: str, n: int | None = None):
        self.kind = kind
        self.col = col
        self.n = n

    @classmethod
    def parse(cls, text: str) -> "SpecItem":
        m = _SPEC_RE.match(text)
        if not m:
            raise ValueError(
                f"cannot parse partition spec item {text!r}: expected a "
                "column name, days/hours/months/years(col), "
                "bucket(n, col) or truncate(w, col)"
            )
        if m.group("ident"):
            return cls("identity", m.group("ident"))
        if m.group("tk"):
            return cls(m.group("tk").lower(), m.group("tc"))
        n = int(m.group("n"))
        if n <= 0:
            raise ValueError(f"transform width must be positive: {text!r}")
        return cls(m.group("nk").lower(), m.group("nc"), n)

    @property
    def is_identity(self) -> bool:
        return self.kind == "identity"

    @property
    def order_preserving(self) -> bool:
        return self.kind != "bucket"

    def render(self, col: str | None = None) -> str:
        """Canonical text form (used in the log's partition_spec and as
        the per-file stats key when ``col`` is the PHYSICAL name)."""
        c = col or self.col
        if self.kind == "identity":
            return c
        if self.n is not None:
            return f"{self.kind}({self.n},{c})"
        return f"{self.kind}({c})"

    def with_col(self, col: str) -> "SpecItem":
        return SpecItem(self.kind, col, self.n)

    def expr_sql(self, col: str | None = None, string: bool = False) -> str:
        """Spark SQL for the transformed value of ``col`` (identity =
        the column itself). ``string=True`` picks prefix semantics for
        truncate."""
        c = col or self.col
        if self.kind == "identity":
            return c
        if self.kind == "days":
            return f"datediff(CAST({c} AS DATE), DATE '1970-01-01')"
        if self.kind == "hours":
            return f"CAST(FLOOR(unix_micros(CAST({c} AS TIMESTAMP)) / 3600000000.0) AS BIGINT)"
        if self.kind == "months":
            return f"(year({c}) - 1970) * 12 + month({c}) - 1"
        if self.kind == "years":
            return f"year({c}) - 1970"
        if self.kind == "bucket":
            return f"pmod(hash({c}), {self.n})"
        # truncate: floor-to-width for numbers, prefix for strings
        if string:
            return f"substring({c}, 1, {self.n})"
        w = self.n
        return f"{c} - ((({c} % {w}) + {w}) % {w})"

    def transform_py(self, v):
        """Driver-side twin of expr_sql for ORDER-PRESERVING transforms:
        fold a probe value / footer bound into the transformed domain.
        Accepts datetime/date (footer stats), ISO strings (probe
        convenience) and numbers; raises for bucket (not computable
        without the JVM hash — callers use a one-row Spark job)."""
        if self.kind == "identity":
            return v
        if self.kind == "bucket":
            raise ValueError("bucket() is not computable driver-side")
        if self.kind == "truncate":
            if isinstance(v, str):
                return v[: self.n]
            return v - (v % self.n)  # Python % floors: Iceberg semantics
        # time transforms — tz-aware inputs normalize to UTC first (the
        # engine's session timezone), so the folded day/month/year id
        # always matches the SQL expression; a local-zone .date() here
        # would silently skip the wrong files
        if isinstance(v, str):
            v = dt.datetime.fromisoformat(v)
        if isinstance(v, dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        if isinstance(v, dt.datetime):
            d, t = v.date(), v
        elif isinstance(v, dt.date):
            d, t = v, dt.datetime(v.year, v.month, v.day)
        else:
            raise ValueError(
                f"{self.render()} expects a date/datetime/ISO string, "
                f"got {type(v).__name__}"
            )
        if self.kind == "days":
            return (d - _EPOCH_DATE).days
        if self.kind == "hours":
            secs = (t - _EPOCH_DT).total_seconds()
            return int(secs // 3600)
        if self.kind == "months":
            return (d.year - 1970) * 12 + d.month - 1
        return d.year - 1970  # years


def parse_spec(spec: list[str] | None) -> list[SpecItem]:
    return [SpecItem.parse(s) for s in (spec or [])]


def canon(text: str) -> str:
    """Canonical form of a spec-item string for lookup (case/space
    normalization), e.g. 'Days( ts )' -> 'days(ts)'."""
    return SpecItem.parse(text).render()
