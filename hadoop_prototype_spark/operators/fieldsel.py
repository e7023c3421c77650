"""Field-selection operator: the reference's unix-cut projection.

Reference: FieldSelectionMapper/Reducer/Helper
(MR lib/fieldsel/FieldSelectionMapper.java:34-61, FieldSelectionHelper.java:60).

Spec grammar (documented at FieldSelectionMapper.java:34-58): a field spec
is `keySpec:valueSpec`, each a comma list of positions and ranges, e.g.
``"4,3,0,1:6,5,1-3,7-"``. Ranges ``a-b`` are inclusive; an open range
``a-`` means "field a through the last field". Fields come from splitting
the input line on a separator (default tab).

Spark-first design: the spec compiles into a list of Column expressions
over ``split(line, sep)`` — a pure projection that Catalyst folds into the
scan (column pruning), no UDF. Open ranges use ``slice`` +
``array_join`` so they work for ragged rows, like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Piece:
    start: int
    end: int | None  # None = open range "a-"; else inclusive end


def _parse_list(spec: str) -> list[_Piece]:
    pieces: list[_Piece] = []
    if not spec:
        return pieces
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok:
            a, b = tok.split("-", 1)
            pieces.append(_Piece(int(a), int(b) if b else None))
        else:
            pieces.append(_Piece(int(tok), int(tok)))
    return pieces


def parse_spec(spec: str) -> tuple[list[_Piece], list[_Piece]]:
    """Split ``keySpec:valueSpec`` (value part optional)."""
    if ":" in spec:
        key_s, val_s = spec.split(":", 1)
    else:
        key_s, val_s = spec, ""
    return _parse_list(key_s), _parse_list(val_s)


def _piece_col(arr: Column, p: _Piece, sep: str) -> Column:
    if p.end is None:
        # open range: fields p.start.. joined by sep (empty if out of bounds)
        return F.coalesce(
            F.array_join(F.slice(arr, p.start + 1, F.greatest(F.size(arr) - p.start, F.lit(0))), sep),
            F.lit(""),
        )
    if p.end == p.start:
        # try_element_at: out-of-range → null (ANSI-safe), like DuckDB arr[i]
        return F.coalesce(F.try_element_at(arr, F.lit(p.start + 1)), F.lit(""))
    return F.coalesce(
        F.array_join(F.slice(arr, p.start + 1, p.end - p.start + 1), sep), F.lit("")
    )


def field_selection(
    df: DataFrame,
    spec: str,
    line_col: str = "line",
    sep: str = "\t",
    key_out: str = "key",
    value_out: str = "value",
) -> DataFrame:
    """Apply a FieldSelection spec to a line column → (key, value) strings.

    Mirrors FieldSelectionHelper.selectFields: selected key fields joined
    by the separator form the key, value fields the value.
    """
    key_pieces, val_pieces = parse_spec(spec)
    arr = F.split(F.col(line_col), _regex_escape(sep))

    def join_pieces(pieces: list[_Piece]) -> Column:
        if not pieces:
            return F.lit("")
        cols = [_piece_col(arr, p, sep) for p in pieces]
        return F.concat_ws(sep, *cols)

    return df.select(
        join_pieces(key_pieces).alias(key_out), join_pieces(val_pieces).alias(value_out)
    )


def _regex_escape(sep: str) -> str:
    return "".join(("\\" + c) if c in r"\.[]{}()*+?^$|" else c for c in sep)


def sql_str(s: str) -> str:
    """A DuckDB e'...' string literal for arbitrary separator chars."""
    out = s.replace("\\", "\\\\").replace("'", "''").replace("\t", "\\t").replace("\n", "\\n")
    return f"e'{out}'"


def fieldsel_oracle_sql(
    spec: str, line_expr: str, from_clause: str, sep: str = "\t"
) -> str:
    """Generate the equivalent DuckDB SQL for a FieldSelection application.

    Used to build oracle strings so Spark impl and oracle share one parser.
    """
    key_pieces, val_pieces = parse_spec(spec)
    lit = sql_str(sep)
    arr = f"string_split({line_expr}, {lit})"

    def piece_sql(p: _Piece) -> str:
        if p.end is None:
            return f"coalesce(array_to_string({arr}[{p.start + 1}:], {lit}), '')"
        if p.end == p.start:
            return f"coalesce({arr}[{p.start + 1}], '')"
        return f"coalesce(array_to_string({arr}[{p.start + 1}:{p.end + 1}], {lit}), '')"

    def join_sql(pieces: list[_Piece]) -> str:
        if not pieces:
            return "''"
        return f"concat_ws({lit}, " + ", ".join(piece_sql(p) for p in pieces) + ")"

    return (
        f"SELECT {join_sql(key_pieces)} AS key, {join_sql(val_pieces)} AS value "
        f"{from_clause}"
    )
