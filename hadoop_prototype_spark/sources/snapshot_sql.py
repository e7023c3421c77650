"""SQL verb surface over snapshot tables (round-12 verdict #2): route
``MERGE INTO / UPDATE / DELETE FROM / OPTIMIZE / VACUUM / ALTER TABLE /
RESTORE / DESCRIBE / CREATE TABLE AS / INSERT INTO`` SQL text — plus
``SELECT … VERSION AS OF / TIMESTAMP AS OF`` time-travel reads — to the
existing Python verbs in sources/snapshots.py, so a user coming from
Delta/Iceberg can drive the whole table lifecycle with the statement
forms they already know instead of learning this engine's API first.

Reference anchor: the descriptor-string surface of the aggregate
framework (MR lib/aggregate/ValueAggregatorJob.java:85 — job behavior
declared as spec text, not code), which SURVEY §3.3 calls "the seed of
our engine's API": a text surface multiplies an operator library's
reach. This is that surface for the lakehouse layer.

Design:
- **a dispatcher, not a SQL engine.** The verb grammar (the part Spark's
  parser does not know) is parsed here with anchored patterns + a
  paren/quote-aware top-level splitter — the operators/joins.compose
  recursive-descent discipline; every EXPRESSION fragment (predicates,
  SET right-hand sides, sub-SELECTs) is handed verbatim to Spark SQL,
  so the expression dialect is exactly Spark's, never a re-invention.
- **names resolve through an explicit catalog** (``tables={name: path}``)
  or inline single-quoted paths (``DELETE FROM '/data/events' …``) —
  snapshot tables live at paths, not in a metastore; the catalog dict is
  the session-scoped binding a real deployment would keep in its own
  catalog service.
- **reads rewrite to temp views**: each referenced snapshot table
  (optionally with ``VERSION AS OF n`` / ``TIMESTAMP AS OF ts``) becomes
  a registered view of the exact log-pinned file list (read_table), and
  the rewritten statement runs through spark.sql — Catalyst sees a plain
  plan, all pushdown/pruning intact. Every verb's data plumbing reuses
  the corresponding Python verb, so OCC, constraints, column mapping,
  partition specs and deletion vectors behave identically whether the
  chain is driven by SQL or by API — pinned verb-for-verb in
  tests/test_snapshot_sql.py and value-hash-gated end-to-end by the
  z_snapshot_sql_verbs registry query.
"""

from __future__ import annotations

import hashlib
import re
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import snapshots as sn

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
# a table reference: 'quoted/path' or a catalog identifier
_TREF = rf"(?:'[^']+'|{_IDENT})"


class SqlSurfaceError(ValueError):
    """The statement is outside the supported verb grammar; the message
    says what IS supported — fail loud, never guess semantics."""


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/bracket depth 0, outside quotes."""
    parts, buf, depth, q = [], [], 0, None
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"`":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _resolve(token: str, tables: dict[str, str] | None) -> str:
    """A table reference token → its snapshot-table path."""
    token = token.strip()
    if token.startswith("'") and token.endswith("'"):
        return token[1:-1]
    if tables and token in tables:
        return tables[token]
    raise SqlSurfaceError(
        f"unknown snapshot table {token!r}: pass tables={{name: path}} or "
        "use a single-quoted path literal"
    )


def _parse_ts(lit: str) -> float:
    """TIMESTAMP AS OF operand: unix seconds (number) or an ISO string.
    A naive ISO string (no zone offset) is resolved as UTC — commit
    timestamps in the log are unix epoch seconds, so the pinned version
    must not depend on the host's local timezone (Delta resolves naive
    literals against the session zone for the same reason)."""
    lit = lit.strip()
    if lit.startswith("'") and lit.endswith("'"):
        import datetime as dt

        d = dt.datetime.fromisoformat(lit[1:-1])
        if d.tzinfo is None:
            d = d.replace(tzinfo=dt.timezone.utc)
        return d.timestamp()
    return float(lit)


# time-travel clause after a table reference; Spark's canonical
# `FOR VERSION/TIMESTAMP AS OF` spelling aliases to the Delta form
_ASOF = (
    r"\s+(?:FOR\s+)?(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+|'[^']+')"
    r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']*'|[0-9.]+))"
)


def _resolve_version(path: str, ver_tok: str | None) -> int | None:
    """VERSION AS OF operand: a number, or a quoted TAG name (the
    Iceberg ref form — `VERSION AS OF 'gold'`)."""
    if ver_tok is None:
        return None
    if ver_tok.startswith("'"):
        from . import refs

        return refs.tag_version(path, ver_tok[1:-1])
    return int(ver_tok)


def _scan_quote(s: str, i: int) -> int:
    """``s[i]`` opens a quote; return the index just past its close.
    Doubled quotes (SQL's `''` escape) stay inside the span."""
    q = s[i]
    j = i + 1
    n = len(s)
    while j < n:
        if s[j] == q:
            if j + 1 < n and s[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _quote_mask(text: str) -> bytearray:
    """1 at every index inside a '…' / "…" / `…` span — the guard that
    keeps every rewrite below away from data literals."""
    mask = bytearray(len(text))
    i = 0
    while i < len(text):
        if text[i] in "'\"`":
            j = _scan_quote(text, i)
            mask[i:j] = b"\x01" * (j - i)
            i = j
        else:
            i += 1
    return mask


def _collect_ctes(text: str, mask: bytearray) -> set[str]:
    """Names bound by any WITH clause (top-level or nested): a CTE name
    shadows a catalog table for the whole statement, so the rewriter
    must leave those references to Spark's own resolver."""
    names: set[str] = set()
    head = re.compile(
        rf"\s*({_IDENT})\s*(?:\([^)]*\)\s*)?AS\s*\(", re.IGNORECASE
    )
    comma = re.compile(r"\s*,")
    recursive = re.compile(r"\s*RECURSIVE\b", re.IGNORECASE)
    for m in re.finditer(r"\bWITH\b", text, re.IGNORECASE):
        if mask[m.start()]:
            continue
        p = m.end()
        # WITH RECURSIVE <name> AS (…): the keyword must not make the
        # head match fail, or a recursive CTE shadowing a catalog name
        # would be rewritten to the snapshot view (r15 ADVICE fix)
        rm = recursive.match(text, p)
        if rm:
            p = rm.end()
        while True:
            hm = head.match(text, p)
            if not hm:
                break
            names.add(hm.group(1))
            open_at = hm.end() - 1  # the '(' of AS (…)
            p = open_at + _balanced(text[open_at:])
            cm = comma.match(text, p)
            if not cm:
                break
            p = cm.end()
    return names


# after a table reference, a bare identifier that is one of these is the
# next grammar element, not an alias
_POST_REF_KEYWORDS = {
    "where", "group", "order", "having", "limit", "union", "intersect",
    "except", "minus", "join", "inner", "left", "right", "full", "cross",
    "natural", "on", "using", "lateral", "when", "then", "window", "sort",
    "distribute", "cluster", "values", "select", "tablesample", "pivot",
    "unpivot", "as", "anti", "semi", "and", "or", "not", "version",
    "timestamp", "for", "qualify", "offset", "fetch", "outer",
}


def _register_reads(
    spark: SparkSession, text: str, tables: dict[str, str] | None
) -> tuple[str, list[str]]:
    """Rewrite every table-position reference to a catalog name or
    quoted path — with its optional time-travel clause — to a temp view
    over the exact snapshot read, returning the rewritten statement for
    spark.sql. Two table-valued functions rewrite first (the Delta CDF
    TVF form): ``TABLE_CHANGES(<t>, from[, to])`` → the row-level change
    feed and ``SCD2_HISTORY(<t>)`` → the validity-interval build.

    Scope discipline (the round-13 rewriter bug's fix): only tokens in
    TABLE POSITION — immediately after FROM/JOIN or a comma in a FROM
    relation list — are candidates; string literals are never touched
    (quote mask), names bound by a WITH clause are skipped (CTE scoping),
    every occurrence of the same (path, version, timestamp) resolves to
    ONE cached view, and a catalog name without an explicit alias is
    rewritten to ``view AS name`` so qualified column references
    (``SELECT t.k FROM t``) keep resolving."""
    mask = _quote_mask(text)
    tvf = re.compile(
        rf"\bTABLE_CHANGES\s*\(\s*(?P<ref>{_TREF})\s*,\s*(?P<a>\d+)"
        rf"(?:\s*,\s*(?P<b>\d+))?\s*\)"
        rf"|\bSCD2_HISTORY\s*\(\s*(?P<ref2>{_TREF})\s*\)",
        re.IGNORECASE,
    )
    repls: list[tuple[int, int, str]] = []
    for m in tvf.finditer(text):
        if mask[m.start()]:
            continue
        view = f"_snap_tvf_{uuid.uuid4().hex[:12]}"
        if m.group("ref2"):
            df = sn.scd2_history(spark, _resolve(m.group("ref2"), tables))
        else:
            df = sn.table_changes(
                spark,
                _resolve(m.group("ref"), tables),
                int(m.group("a")),
                int(m.group("b")) if m.group("b") else None,
            )
        df.createOrReplaceTempView(view)
        repls.append((m.start(), m.end(), view))
    tvf_views = [r for _, _, r in repls]
    if repls:
        for s, e, r in sorted(repls, reverse=True):
            text = text[:s] + r + text[e:]
        mask = _quote_mask(text)

    ctes = _collect_ctes(text, mask)
    views: dict[tuple, str] = {}
    ws = re.compile(r"\s*")
    ident = re.compile(_IDENT)
    asof = re.compile(_ASOF, re.IGNORECASE)
    alias_re = re.compile(
        rf"(?:AS\s+(?P<a1>{_IDENT})|(?P<a2>{_IDENT}))", re.IGNORECASE
    )
    repls = []
    for kw in re.finditer(r"\b(?:FROM|JOIN)\b", text, re.IGNORECASE):
        if mask[kw.start()]:
            continue
        p = kw.end()
        while True:  # the comma-separated relation list after FROM
            p = ws.match(text, p).end()
            if p >= len(text):
                break
            start, ref = p, None
            if text[p] == "(":  # subquery/VALUES: its own FROMs match too
                p = start + _balanced(text[start:])
            elif text[p] == "'":
                p = _scan_quote(text, p)
                ref = text[start:p]
            else:
                im = ident.match(text, p)
                if not im:
                    break
                p = im.end()
                if p < len(text) and text[p] == ".":  # db.tbl: not ours
                    im2 = ident.match(text, p + 1)
                    p = im2.end() if im2 else p + 1
                else:
                    name = im.group(0)
                    if tables and name in tables and name not in ctes:
                        ref = name
            if ref is not None:
                am = asof.match(text, p)
                if am:
                    p = am.end()
                try:
                    path = _resolve(ref, tables)
                except SqlSurfaceError:
                    path = None
                if path is not None and not (
                    ref.startswith("'") and sn.current_version(path) == 0
                    # quoted literal with no snapshot log beneath: leave it
                ):
                    ver = _resolve_version(path, am.group("ver") if am else None)
                    ts = _parse_ts(am.group("ts")) if am and am.group("ts") else None
                    vkey = (path, ver, ts)
                    view = views.get(vkey)
                    if view is None:
                        # md5 of the snapshot key dedupes WITHIN this
                        # statement; the uuid salt keeps two CONCURRENT
                        # statements reading the same table at the same
                        # version from sharing one view name — one call's
                        # createOrReplaceTempView could otherwise swap
                        # the snapshot under the other between
                        # registration and analysis (r15 ADVICE fix)
                        view = "_snap_sql_" + hashlib.md5(
                            repr(vkey).encode()
                        ).hexdigest()[:12] + "_" + uuid.uuid4().hex[:8]
                        sn.read_table(
                            spark, path, version=ver, timestamp=ts
                        ).createOrReplaceTempView(view)
                        views[vkey] = view
                    repls.append((start, p, view, ref))
            # optional alias ([AS] ident [(col, …)]) — consumed, kept as-is
            q = ws.match(text, p).end()
            am2 = alias_re.match(text, q)
            if am2 and (
                am2.group("a1")
                or am2.group("a2").lower() not in _POST_REF_KEYWORDS
            ):
                if repls and repls[-1][1] == p:
                    s0, e0, v0, _ = repls[-1]
                    repls[-1] = (s0, e0, v0, None)  # explicit alias exists
                p = am2.end()
                q2 = ws.match(text, p).end()
                if q2 < len(text) and text[q2] == "(":
                    p = q2 + _balanced(text[q2:])
            q = ws.match(text, p).end()
            if q < len(text) and text[q] == ",":
                p = q + 1
                continue
            break
    out = text
    for s, e, view, ref in sorted(repls, reverse=True):
        # no explicit alias on a catalog name: alias the view back to the
        # name so qualified refs (t.k) and USING-column scoping still work
        rep = f"{view} AS {ref}" if ref and not ref.startswith("'") else view
        out = out[:s] + rep + out[e:]
    return out, [*tvf_views, *views.values()]


def _run_select(
    spark: SparkSession, text: str, tables: dict[str, str] | None
) -> DataFrame:
    sql, views = _register_reads(spark, text, tables)
    try:
        # spark.sql analyzes eagerly: the returned DataFrame holds the
        # RESOLVED plan, so the temp views can be dropped immediately —
        # without this every statement leaked its uuid-salted views into
        # the session catalog for the session's lifetime (r15 ADVICE)
        return spark.sql(sql)
    finally:
        for v in views:
            spark.catalog.dropTempView(v)


def _source_df(
    spark: SparkSession, token: str, tables: dict[str, str] | None
) -> DataFrame:
    """MERGE's USING operand: a parenthesized sub-SELECT, a catalog
    snapshot table, or an existing Spark temp view/table."""
    token = token.strip()
    if token.startswith("("):
        if not token.endswith(")"):
            raise SqlSurfaceError(f"unbalanced sub-select: {token!r}")
        return _run_select(spark, token[1:-1], tables)
    if (tables and token in tables) or token.startswith("'"):
        return sn.read_table(spark, _resolve(token, tables))
    return spark.table(token)


def _strip_parens(s: str) -> str:
    """Remove wrapping balanced parentheses: '((a = b))' -> 'a = b'."""
    s = s.strip()
    while s.startswith("(") and _balanced(s) == len(s):
        s = s[1:-1].strip()
    return s


def _is_key_equality(conj: str, key_col: str) -> bool:
    """Does this conjunct equate the table key on both sides
    (``[alias.]k = [alias.]k``), possibly parenthesized?"""
    sides = [s.strip() for s in _split_top(_strip_parens(conj), "=")]
    if len(sides) != 2:
        return False
    for s in sides:
        parts = s.split(".")
        if len(parts) > 2 or not re.fullmatch(_IDENT, parts[-1].strip()):
            return False
        if parts[-1].strip() != key_col:
            return False
    return True


def _split_on(cond: str, key_col: str) -> str:
    """Split a MERGE ON condition into its top-level AND conjuncts,
    require exactly one to be the key equality (the join shape the
    key-based merge machinery implements), and return the RESIDUAL
    condition ('' when ON is the pure key equality). Residual conjuncts
    are Spark SQL evaluated over the target⋈source pair — rows that
    key-match but fail the residual count as NOT matched, the Delta ON
    semantics."""
    cond = _strip_parens(cond)  # ON (k_eq AND residual) = ON k_eq AND …
    # a top-level OR would make the AND-conjunct split silently reinterpret
    # SQL's precedence ('key AND a=1 OR b=2' is '(key AND a=1) OR b=2', not
    # 'key AND (a=1 OR b=2)') — out-of-grammar input is refused, never
    # re-parenthesized (r15 ADVICE fix)
    if _kw_positions(cond, {"OR"}):
        raise SqlSurfaceError(
            "MERGE ON supports the key equality plus top-level AND "
            "conjuncts only; a top-level OR changes the matched set under "
            f"SQL precedence — parenthesize the OR inside one conjunct: "
            f"{cond!r}"
        )
    pos = _kw_positions(cond, {"AND"})
    bounds = [0] + [p for p, e, _ in pos] + [len(cond)]
    conjs = []
    for i, (b, e) in enumerate(zip(bounds, bounds[1:])):
        c = cond[b:e].strip()
        if i > 0:
            c = c[3:].strip()  # drop the leading AND
        if c:
            conjs.append(c)
    keyed = [i for i, c in enumerate(conjs) if _is_key_equality(c, key_col)]
    if len(keyed) != 1:
        raise SqlSurfaceError(
            f"MERGE ON must contain exactly one equality on the table key "
            f"{key_col!r} (plus optional AND residual conjuncts), got "
            f"{cond!r}"
        )
    rest = [c for i, c in enumerate(conjs) if i != keyed[0]]
    return " AND ".join(f"({c})" for c in rest)


def _result_df(spark: SparkSession, res) -> DataFrame:
    """A verb's accounting dict (or list of dicts: DESCRIBE HISTORY,
    SHOW TAGS) as a DataFrame — the ``as_df=True`` uniform-result form,
    so migration scripts can chain any statement's output into a SELECT.
    Scalar cells keep their type; nested values (schema lists,
    constraint maps) land as JSON strings. Falls back to all-string
    columns when a column's type varies across rows."""
    import json

    if isinstance(res, DataFrame):
        return res
    rows = res if isinstance(res, list) else [res]
    if not rows:
        return spark.createDataFrame([], "result string")
    if not all(isinstance(r, dict) for r in rows):
        return spark.createDataFrame([(str(r),) for r in rows], "value string")
    keys = list(dict.fromkeys(k for r in rows for k in r))

    def cell(v):
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        return json.dumps(v, default=str)

    data = [tuple(cell(r.get(k)) for k in keys) for r in rows]
    try:
        return spark.createDataFrame(data, keys)
    except Exception:
        return spark.createDataFrame(
            [tuple(None if c is None else str(c) for c in row) for row in data],
            ", ".join(f"{k} string" for k in keys),
        )


def snapshot_sql(
    spark: SparkSession,
    text: str,
    tables: dict[str, str] | None = None,
    as_df: bool = False,
):
    """Execute one snapshot-table SQL statement. Returns a DataFrame for
    reads (SELECT/WITH), the verb's accounting dict otherwise —
    ``as_df=True`` wraps EVERY result as a DataFrame (dict → one row,
    DESCRIBE HISTORY / SHOW TAGS → one row per entry) so script output
    is uniformly relational.

    Supported grammar (case-insensitive keywords; ``<t>`` is a catalog
    name from ``tables`` or a single-quoted path; every ``<expr>`` /
    ``<pred>`` / ``<select>`` fragment is Spark SQL, evaluated by Spark):

      SELECT/WITH …  FROM <t> [VERSION AS OF n|'tag' | TIMESTAMP AS OF ts] …
      SELECT … FROM TABLE_CHANGES(<t>, from[, to])   (row-level CDC feed)
      SELECT … FROM SCD2_HISTORY(<t>)                (validity intervals)
      CREATE TABLE <t> KEY <k> [PARTITIONED BY (c | days(c) | hours(c)
          | months(c) | years(c) | bucket(n, c) | truncate(w, c), …)]
          AS <select>
      INSERT INTO <t> <select>
      INSERT OVERWRITE <t> <select>   (versioned: old rows stay
                                       time-travel-readable until vacuum)
      MERGE [WITH SCHEMA EVOLUTION] INTO <t> [[AS] a] USING <src> [[AS] b]
          ON a.k = b.k [AND <residual conjuncts>]
          [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = <expr>, …]
          [WHEN MATCHED [AND <cond>] THEN DELETE]
          [WHEN NOT MATCHED [AND <cond>] THEN INSERT *
                                              | (cols) VALUES (<expr>, …)]
          [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
                                                  | UPDATE SET c = <expr>, …]
        (clauses apply FIRST-MATCH in statement order; the all-
         unconditional full-row forms keep their fast paths — sync =
         ONE atomic overwrite — and any conditional / column-level
         form routes through one atomic merge commit)
      UPDATE <t> SET c = <expr>[, …] [WHERE <pred>]
      DELETE FROM <t> WHERE <pred>
      OPTIMIZE <t> [WHERE <col> = <lit> [AND …] | <col> BETWEEN a AND b]
          [ZORDER BY (c, …)]
      VACUUM <t> [RETAIN <n> HOURS] [KEEP LAST <k>] [DRY RUN]
      RESTORE TABLE <t> TO VERSION AS OF <n>|'tag'
      RESTORE TABLE <t> TO TIMESTAMP AS OF <ts>
      CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF n|'tag']
      ALTER TABLE <t> RENAME COLUMN a TO b
                    | DROP COLUMN a
                    | ADD COLUMN a <type>  |  ADD COLUMNS (a t1, b t2, …)
                    | ALTER COLUMN a TYPE <type>
                    | ADD CONSTRAINT n CHECK (<pred>)
                    | DROP CONSTRAINT n
                    | SET PARTITION SPEC (c | days(c) | bucket(n, c) | …)
                    | DROP PARTITION SPEC
                    | CREATE TAG name [AS OF VERSION n]  |  DROP TAG name
      SHOW TAGS <t>
      DESCRIBE [DETAIL] <t>
      DESCRIBE HISTORY <t>

    ``snapshot_sql_script`` runs a ';'-separated sequence of these.
    """
    stmt = text.strip().rstrip(";").strip()
    head = stmt.split(None, 1)[0].upper() if stmt else ""

    def dispatch():
        if head in ("SELECT", "WITH"):
            return _run_select(spark, stmt, tables)
        if head == "MERGE":
            return _merge(spark, stmt, tables)
        if head == "UPDATE":
            return _update(spark, stmt, tables)
        if head == "DELETE":
            return _delete(spark, stmt, tables)
        if head == "OPTIMIZE":
            return _optimize(spark, stmt, tables)
        if head == "VACUUM":
            return _vacuum(stmt, tables)
        if head == "RESTORE":
            return _restore(stmt, tables)
        if head == "ALTER":
            return _alter(spark, stmt, tables)
        if head == "DESCRIBE":
            return _describe(stmt, tables)
        if head == "CREATE":
            return _create(spark, stmt, tables)
        if head == "INSERT":
            return _insert(spark, stmt, tables)
        if head == "SHOW":
            m = re.match(rf"SHOW\s+TAGS\s+(?P<t>{_TREF})$", stmt, re.IGNORECASE)
            if m:
                from . import refs

                return refs.list_tags(_resolve(m.group("t"), tables))
        raise SqlSurfaceError(
            f"unsupported statement {head!r} — see snapshot_sql.__doc__ for "
            "the verb grammar"
        )

    try:
        res = dispatch()
    except Exception as e:
        # the duplicate-source-key guard rides the merge's own jobs
        # (_guard_unique_source) and surfaces as a Spark runtime error;
        # re-raise it as the statement-level refusal it is. Nothing has
        # been committed: the guard fires in the probe/staging job,
        # before any log write.
        msg = str(e)
        if _DUP_SOURCE_MARK in msg:
            at = msg.find(_DUP_SOURCE_MARK)
            raise SqlSurfaceError(msg[at:].splitlines()[0]) from e
        raise
    return _result_df(spark, res) if as_df else res


def _balanced(s: str) -> int:
    """End index (exclusive) of the balanced paren group opening at
    ``s[0]`` — quote-aware, so a ')' inside a string literal never
    closes the sub-select."""
    depth, q = 0, None
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise SqlSurfaceError(f"unbalanced parentheses in {s[:60]!r}")


def _kw_positions(
    s: str, words: set[str]
) -> list[tuple[int, int, str]]:
    """(start, end, WORD) for every keyword occurrence at paren depth 0,
    outside quotes, and outside any CASE…END expression — so a WHEN/THEN
    inside a clause condition's CASE never splits the clause list."""
    out: list[tuple[int, int, str]] = []
    depth = case_depth = 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            i = _scan_quote(s, i)
        elif ch == "(":
            depth += 1
            i += 1
        elif ch == ")":
            depth -= 1
            i += 1
        elif ch.isalpha() or ch == "_":
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            w = s[i:j].upper()
            if w == "CASE":
                case_depth += 1
            elif w == "END" and case_depth:
                case_depth -= 1
            elif depth == 0 and case_depth == 0 and w in words:
                out.append((i, j, w))
            i = j
        else:
            i += 1
    return out


def _parse_merge_clauses(text: str, key: str) -> list[dict]:
    """The WHEN-clause list of a MERGE statement → a list of
    ``{"kind": matched|not_matched|by_source, "cond": str|None, "action":
    update|delete|insert, "assigns"|"insert": spec}`` dicts, in statement
    order (first-match semantics downstream). Grammar per clause:

      WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = <expr>, …
      WHEN MATCHED [AND <cond>] THEN DELETE
      WHEN NOT MATCHED [AND <cond>] THEN INSERT * | (cols) VALUES (exprs)
      WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
    """
    text = text.strip()
    if not text:
        return []
    whens = _kw_positions(text, {"WHEN"})
    if not whens or whens[0][0] != 0:
        raise SqlSurfaceError(f"cannot parse MERGE clauses at {text[:60]!r}")
    out: list[dict] = []
    bounds = [w[0] for w in whens] + [len(text)]
    for b, e in zip(bounds, bounds[1:]):
        body = text[b:e].strip()[4:].lstrip()  # past the WHEN keyword
        km = re.match(
            r"(?:(?P<bs>NOT\s+MATCHED\s+BY\s+SOURCE)"
            r"|(?P<nm>NOT\s+MATCHED)|(?P<ma>MATCHED))\b",
            body,
            re.IGNORECASE,
        )
        if not km:
            raise SqlSurfaceError(f"cannot parse MERGE clause {body[:60]!r}")
        kind = (
            "by_source" if km.group("bs")
            else "not_matched" if km.group("nm") else "matched"
        )
        rest = body[km.end():].strip()
        thens = _kw_positions(rest, {"THEN"})
        if not thens:
            raise SqlSurfaceError(f"MERGE clause missing THEN: {body[:60]!r}")
        head = rest[: thens[0][0]].strip()
        action = rest[thens[0][1]:].strip()
        cond = None
        if head:
            am = re.match(r"AND\b", head, re.IGNORECASE)
            if not am:
                raise SqlSurfaceError(
                    f"expected AND <cond> before THEN, got {head[:60]!r}"
                )
            cond = head[am.end():].strip()
        cl: dict = {"kind": kind, "cond": cond}
        if re.fullmatch(r"DELETE", action, re.IGNORECASE):
            if kind == "not_matched":
                raise SqlSurfaceError(
                    "WHEN NOT MATCHED supports INSERT only (DELETE is a "
                    "MATCHED / NOT MATCHED BY SOURCE action)"
                )
            cl["action"] = "delete"
        elif um := re.match(r"UPDATE\s+SET\s+([\s\S]+)$", action, re.IGNORECASE):
            if kind == "not_matched":
                raise SqlSurfaceError("UPDATE is not a WHEN NOT MATCHED action")
            rest_set = um.group(1).strip()
            if rest_set == "*":
                if kind == "by_source":
                    raise SqlSurfaceError(
                        "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs "
                        "explicit SET c = expr assignments (there is no "
                        "source row to take * from)"
                    )
                cl.update(action="update", assigns="*")
            else:
                assigns: dict[str, str] = {}
                for part in _split_top(rest_set):
                    am2 = re.match(
                        rf"(?:{_IDENT}\s*\.\s*)?({_IDENT})\s*=\s*([\s\S]+)$",
                        part,
                    )
                    if not am2:
                        raise SqlSurfaceError(
                            f"cannot parse SET assignment {part!r}"
                        )
                    if am2.group(1) == key:
                        raise SqlSurfaceError(
                            f"cannot UPDATE the table key {key!r} in MERGE "
                            "(it identifies the row)"
                        )
                    assigns[am2.group(1)] = am2.group(2).strip()
                cl.update(action="update", assigns=assigns)
        elif im := re.match(r"INSERT\s*([\s\S]+)$", action, re.IGNORECASE):
            if kind != "not_matched":
                raise SqlSurfaceError("INSERT is a WHEN NOT MATCHED action")
            spec = im.group(1).strip()
            if spec == "*":
                cl.update(action="insert", insert="*")
            else:
                if not spec.startswith("("):
                    raise SqlSurfaceError(
                        f"INSERT needs '*' or '(cols) VALUES (exprs)', got "
                        f"{spec[:60]!r}"
                    )
                ce = _balanced(spec)
                cols = [
                    c.strip().split(".")[-1]
                    for c in _split_top(spec[1:ce - 1])
                ]
                tail = spec[ce:].strip()
                vm = re.match(r"VALUES\s*\(", tail, re.IGNORECASE)
                if not vm:
                    raise SqlSurfaceError(
                        f"INSERT (cols) must be followed by VALUES (exprs), "
                        f"got {tail[:60]!r}"
                    )
                vopen = vm.end() - 1
                ve = vopen + _balanced(tail[vopen:])
                vals = _split_top(tail[vopen + 1:ve - 1])
                if tail[ve:].strip():
                    raise SqlSurfaceError(
                        f"unexpected text after VALUES list: {tail[ve:][:40]!r}"
                    )
                if len(cols) != len(vals):
                    raise SqlSurfaceError(
                        f"INSERT column/value arity mismatch: {len(cols)} "
                        f"cols, {len(vals)} values"
                    )
                if key not in cols:
                    # unlisted columns insert as NULL — a NULL key would
                    # break the keyed-table invariant every other path
                    # defends (pruning, upsert joins, the dup-key
                    # refusal); mirror the 'cannot UPDATE the key'
                    # refusal (r15 ADVICE fix)
                    raise SqlSurfaceError(
                        f"INSERT column list must include the table key "
                        f"{key!r} (unlisted columns insert NULL, and a "
                        "NULL key row could never be matched or deleted)"
                    )
                cl.update(action="insert", insert=(cols, vals))
        else:
            raise SqlSurfaceError(f"unsupported MERGE action {action[:60]!r}")
        out.append(cl)
    return out


def _merge(spark, stmt, tables):
    hm = re.match(
        rf"MERGE(?P<evo>\s+WITH\s+SCHEMA\s+EVOLUTION)?\s+INTO\s+"
        rf"(?P<tgt>{_TREF})(?:\s+AS\s+(?P<ta>{_IDENT})|\s+(?P<ta2>{_IDENT}))?"
        rf"\s+USING\s+",
        stmt,
        re.IGNORECASE,
    )
    if not hm:
        raise SqlSurfaceError(f"cannot parse MERGE statement: {stmt!r}")
    rest = stmt[hm.end():].lstrip()
    if rest.startswith("("):  # sub-select: scan its balanced close
        end = _balanced(rest)
        src_tok, rest = rest[:end], rest[end:]
    else:
        sm = re.match(_TREF, rest)
        if not sm:
            raise SqlSurfaceError(f"cannot parse MERGE USING operand: {rest[:60]!r}")
        src_tok, rest = sm.group(0), rest[sm.end():]
    tm = re.match(
        rf"(?:\s+AS\s+(?P<sa>{_IDENT})|\s+(?!ON\b)(?P<sa2>{_IDENT}))?\s+ON\s+"
        rf"(?P<on>[\s\S]+?)\s*(?P<clauses>WHEN\s[\s\S]*)?$",
        rest,
        re.IGNORECASE,
    )
    if not tm:
        raise SqlSurfaceError(f"cannot parse MERGE ON/WHEN tail: {rest[:80]!r}")
    m = {
        "evo": hm.group("evo"),
        "tgt": hm.group("tgt"),
        "src": src_tok,
        "on": tm.group("on"),
        "clauses": tm.group("clauses"),
    }.__getitem__
    path = _resolve(m("tgt"), tables)
    key = sn._read_entry(path, sn.current_version(path))["key_col"]
    on_extra = _split_on(m("on"), key)

    parsed = _parse_merge_clauses(m("clauses") or "", key)
    if not parsed:  # bare MERGE = full upsert
        parsed = [
            {"kind": "matched", "cond": None, "action": "update",
             "assigns": "*"},
            {"kind": "not_matched", "cond": None, "action": "insert",
             "insert": "*"},
        ]
    full_row = all(
        cl["cond"] is None
        and (cl["action"] != "update" or cl["assigns"] == "*")
        and (cl["action"] != "insert" or cl["insert"] == "*")
        for cl in parsed
    )
    matched = any(
        cl["kind"] == "matched" and cl["action"] == "update" for cl in parsed
    )
    not_matched = any(cl["kind"] == "not_matched" for cl in parsed)
    matched_delete = any(
        cl["kind"] == "matched" and cl["action"] == "delete" for cl in parsed
    )
    by_source_delete = any(cl["kind"] == "by_source" for cl in parsed)

    if not full_row or on_extra or (
        matched_delete and (matched or not_matched or by_source_delete)
    ):
        # conditional clauses, column-level SET / INSERT lists, residual
        # ON conjuncts, or a DELETE mixed with other clauses: the
        # general first-match path
        if m("evo"):
            raise SqlSurfaceError(
                "WITH SCHEMA EVOLUTION is supported on the full-row "
                "unconditional MERGE forms only (widen with ALTER TABLE "
                "ADD COLUMN first, then merge)"
            )
        t_alias = hm.group("ta") or hm.group("ta2") or (
            m("tgt") if re.fullmatch(_IDENT, m("tgt")) else None
        )
        s_alias = tm.group("sa") or tm.group("sa2") or (
            src_tok if re.fullmatch(_IDENT, src_tok) else None
        )
        src = _source_df(spark, m("src"), tables)
        src = _guard_unique_source(src, key)
        return _merge_general(
            spark, path, key, src, parsed, t_alias, s_alias,
            on_extra=on_extra,
        )

    src = _source_df(spark, m("src"), tables)
    merge_schema = bool(m("evo"))

    if matched_delete:
        # the Delta anti-join verb: delete the keys the source carries
        if matched or not_matched or by_source_delete or merge_schema:
            raise SqlSurfaceError(
                "WHEN MATCHED THEN DELETE is supported alone (it routes "
                "to the merge-on-read DELETE verb)"
            )
        return sn.delete_from_mor_retrying(spark, path, src.select(key), key)

    # every remaining form upserts source rows: duplicate source keys
    # would fan out through the keyed upsert — refuse loud (delete-only
    # above is immune: keys are distinct-ed)
    src = _guard_unique_source(src, key)

    if by_source_delete:
        # With every clause UNCONDITIONAL, the post-merge state is a pure
        # function of (table, source): src∩cur rows come from src (if
        # MATCHED updates) or cur (if not), src-only rows enter iff NOT
        # MATCHED inserts, cur-only rows die. One frame, ONE atomic
        # overwrite commit — the sync stays all-or-nothing instead of an
        # upsert version followed by a delete version.
        if merge_schema:
            raise SqlSurfaceError(
                "WITH SCHEMA EVOLUTION is not supported together with "
                "WHEN NOT MATCHED BY SOURCE (widen with ALTER TABLE ADD "
                "COLUMN first, then sync)"
            )
        def attempt() -> dict:
            # rebuilt per attempt: a retry after a lost OCC race must
            # classify against the WINNER's table state, not the one
            # read before the race (the merge_into_retrying discipline)
            cur2 = sn.read_table(spark, path)
            cols = cur2.columns
            cur_keys = cur2.select(key).distinct()
            src_keys = src.select(key).distinct()
            final = (
                src.select(*cols).join(cur_keys, key, "left_semi")
                if matched
                else cur2.join(src_keys, key, "left_semi")
            )
            if not_matched:
                final = final.unionByName(
                    src.select(*cols).join(cur_keys, key, "left_anti")
                )
            return sn.overwrite_table(spark, path, final, key)

        return sn._with_conflict_retry(attempt, 10)

    if matched and not_matched:
        return sn.merge_into_retrying(
            spark, path, src, key, merge_schema=merge_schema
        )

    def attempt() -> dict:
        # classified per attempt: after a lost OCC race the semi/anti
        # split must run against the WINNER's table state — classifying
        # once up front would let a MATCHED-only merge resurrect a key a
        # concurrent writer deleted between read and commit
        cur_keys = sn.read_table(spark, path).select(key).distinct()
        upd = src.join(cur_keys, key, "left_semi" if matched else "left_anti")
        return sn.merge_into(spark, path, upd, key, merge_schema=merge_schema)

    return sn._with_conflict_retry(attempt, 10)


# marker string the dispatcher greps runtime errors for — keep the two
# in sync (_guard_unique_source / snapshot_sql's except clause)
_DUP_SOURCE_MARK = "MERGE source has multiple rows for the same key"


def _guard_unique_source(src: DataFrame, key: str) -> DataFrame:
    """Refuse a MERGE source carrying duplicate keys: the keyed upsert
    would fan the duplicate out through its full-outer join and commit a
    duplicate-key table — the silent-corruption twin of Delta's 'multiple
    source rows matched' error.

    r15 this was a SEPARATE aggregation job (a full extra evaluation of
    the source sub-select per MERGE/UPDATE/INSERT); now the key column
    carries a window-count guard (r15 verdict item 6), so the check rides
    the merge's OWN first job over the source — the affected-file probe
    or the staging write — and duplicate keys fail there via
    raise_error, before anything is committed. The window partitions on
    the key the downstream join shuffles by; its count needs no ordering,
    and the raise branch is unreachable for unique sources, so the
    guarded plan computes the identical key values."""
    w = Window.partitionBy(key)
    ty = src.schema[key].dataType.simpleString()
    guarded = (
        F.when(
            F.count(F.lit(1)).over(w) > 1,
            F.raise_error(
                F.concat(
                    F.lit(_DUP_SOURCE_MARK + f" {key!r} (key value '"),
                    F.col(key).cast("string"),
                    F.lit(
                        "') — the result would be nondeterministic "
                        "(Delta's 'multiple source rows matched' error); "
                        "de-duplicate the source first"
                    ),
                )
            ).cast(ty),
        )
        .otherwise(F.col(key))
        .alias(key)
    )
    return src.select(
        *[guarded if c == key else F.col(c) for c in src.columns]
    )


def _merge_general(
    spark: SparkSession,
    path: str,
    key: str,
    src: DataFrame,
    clauses: list[dict],
    t_alias: str | None,
    s_alias: str | None,
    on_extra: str = "",
) -> dict:
    """The general MERGE path: conditional clauses, column-level
    ``UPDATE SET c = expr`` and ``INSERT (cols) VALUES (exprs)`` — the
    Delta/Iceberg statement forms every migration script uses. Clause
    conditions and assignment expressions are Spark SQL evaluated over
    the target⋈source join with the statement's own aliases in scope;
    per Delta semantics the FIRST clause whose condition holds applies
    to a row (encoded as one CASE chain per output column, so the whole
    matched side is a single join + projection — no per-clause passes).

    Everything lands in ONE merge_into commit: changed matched rows and
    inserted rows as the upsert frame, matched-DELETE and BY SOURCE
    DELETE keys as the same commit's ``delete_keys`` — atomic, and file
    pruning covers the union of touched keys so cost stays O(affected
    files), never O(table). The whole frame build re-runs per OCC retry
    attempt against the winner's table state.

    ``on_extra`` is the ON condition's residual (non-key-equality)
    conjuncts: a pair must satisfy key equality AND the residual to be
    MATCHED — a source row that key-matches but fails the residual is
    NOT matched, per Delta ON semantics. Because this engine's tables
    are keyed, inserting such a row would silently replace the existing
    key row; that case fails loud instead (Delta would produce a
    duplicate-key table, which a keyed table cannot represent).

    ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = expr``
    (Delta's by-source update) flows through the same first-match CASE
    machinery over the target-only rows — expressions see the target
    alias only."""
    ta = t_alias or "__tgt"
    sa = s_alias or "__src"
    if ta == sa:
        raise SqlSurfaceError(
            f"MERGE target and source aliases must differ, both are {ta!r}"
        )
    matched = [c for c in clauses if c["kind"] == "matched"]
    not_matched = [c for c in clauses if c["kind"] == "not_matched"]
    by_source = [c for c in clauses if c["kind"] == "by_source"]

    def _first_match(cs: list[dict], val_of, else_sql: str, ty: str) -> str:
        branches = " ".join(
            f"WHEN ({c['cond'] or 'true'}) THEN ({val_of(c)})" for c in cs
        )
        return f"CAST((CASE {branches} ELSE {else_sql} END) AS {ty})"

    def attempt() -> dict:
        cur = sn.read_table(spark, path)
        cols = cur.columns
        types = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
        t, s = cur.alias(ta), src.alias(sa)
        on_cond = F.col(f"{ta}.{key}") == F.col(f"{sa}.{key}")
        if on_extra:
            on_cond = on_cond & F.expr(on_extra)

        upd = ins = None
        del_frames: list[DataFrame] = []
        if matched:
            act = "CASE " + " ".join(
                f"WHEN ({c['cond'] or 'true'}) THEN "
                f"'{'u' if c['action'] == 'update' else 'd'}'"
                for c in matched
            ) + " ELSE 'k' END"

            def mval(c, col=None):
                if c["action"] == "delete":
                    return f"{ta}.{col}"  # placeholder: the row is dropped
                a = c["assigns"]
                return f"{sa}.{col}" if a == "*" else a.get(col, f"{ta}.{col}")

            sels = [
                _first_match(
                    matched, lambda c, col=col: mval(c, col),
                    f"{ta}.{col}", types[col],
                ) + f" AS {col}"
                for col in cols
            ]
            proc = t.join(s, on_cond, "inner").selectExpr(
                f"({act}) AS __act", *sels
            )
            upd = proc.filter(F.col("__act") == "u").drop("__act")
            if any(c["action"] == "delete" for c in matched):
                del_frames.append(
                    proc.filter(F.col("__act") == "d").select(key)
                )
        if not_matched:
            act = "CASE " + " ".join(
                f"WHEN ({c['cond'] or 'true'}) THEN 'i'" for c in not_matched
            ) + " ELSE 'k' END"

            def ival(c, col=None):
                if c["insert"] == "*":
                    return f"{sa}.{col}"
                icols, ivals = c["insert"]
                mapping = dict(zip(icols, ivals))
                return mapping.get(col, "NULL")

            sels = [
                _first_match(
                    not_matched, lambda c, col=col: ival(c, col),
                    "NULL", types[col],
                ) + f" AS {col}"
                for col in cols
            ]
            # NOT matched = no pair satisfies the FULL ON condition
            anti = (
                s.join(t, on_cond, "left_anti")
                if on_extra
                else s.join(
                    cur.select(F.col(key).alias("__ck")).distinct(),
                    F.col(f"{sa}.{key}") == F.col("__ck"),
                    "left_anti",
                )
            )
            proc = anti.selectExpr(f"({act}) AS __act", *sels)
            ins = proc.filter(F.col("__act") == "i").drop("__act")
            if on_extra:
                # a keyed table cannot hold the duplicate Delta would
                # insert when a row key-matches but fails the residual
                clash = (
                    ins.join(cur.select(key).distinct(), key, "left_semi")
                    .limit(1)
                    .count()
                )
                if clash:
                    raise SqlSurfaceError(
                        "MERGE with residual ON conjuncts would INSERT a "
                        "key that already exists in the target (the row "
                        "key-matched but failed the residual); a keyed "
                        "table cannot hold the duplicate — tighten the "
                        "insert clause's condition"
                    )
        if by_source:
            act = "CASE " + " ".join(
                f"WHEN ({c['cond'] or 'true'}) THEN "
                f"'{'u' if c['action'] == 'update' else 'd'}'"
                for c in by_source
            ) + " ELSE 'k' END"
            bs = (
                t.join(s, on_cond, "left_anti")
                if on_extra
                else t.join(
                    src.select(F.col(key).alias("__sk")).distinct(),
                    F.col(f"{ta}.{key}") == F.col("__sk"),
                    "left_anti",
                )
            )
            if any(c["action"] == "update" for c in by_source):

                def bval(c, col=None):
                    if c["action"] == "delete":
                        return f"{ta}.{col}"
                    return c["assigns"].get(col, f"{ta}.{col}")

                sels = [
                    _first_match(
                        by_source, lambda c, col=col: bval(c, col),
                        f"{ta}.{col}", types[col],
                    ) + f" AS {col}"
                    for col in cols
                ]
                proc = bs.selectExpr(f"({act}) AS __act", *sels)
                bs_upd = proc.filter(F.col("__act") == "u").drop("__act")
                upd = bs_upd if upd is None else upd.unionByName(bs_upd)
                if any(c["action"] == "delete" for c in by_source):
                    del_frames.append(
                        proc.filter(F.col("__act") == "d").select(key)
                    )
            else:
                proc = bs.selectExpr(f"({act}) AS __act", f"{ta}.{key} AS {key}")
                del_frames.append(
                    proc.filter(F.col("__act") == "d").select(key)
                )

        updates = upd
        if ins is not None:
            updates = ins if updates is None else updates.unionByName(ins)
        if updates is None:
            updates = cur.limit(0)
        dk = None
        for f in del_frames:
            dk = f if dk is None else dk.unionByName(f)
        return sn.merge_into(
            spark, path, updates.select(*cols), key, delete_keys=dk
        )

    return sn._with_conflict_retry(attempt, 10)


def _update(spark, stmt, tables):
    m = re.match(
        rf"UPDATE\s+(?P<t>{_TREF})\s+SET\s+(?P<sets>[\s\S]+?)"
        rf"(?:\s+WHERE\s+(?P<pred>[\s\S]+))?$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse UPDATE statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    key = sn._read_entry(path, sn.current_version(path))["key_col"]
    cur = sn.read_table(spark, path)
    assigns: dict[str, str] = {}
    for part in _split_top(m.group("sets")):
        am = re.match(rf"({_IDENT})\s*=\s*([\s\S]+)$", part)
        if not am:
            raise SqlSurfaceError(f"cannot parse SET assignment {part!r}")
        col, expr = am.group(1), am.group(2).strip()
        if col not in cur.columns:
            raise SqlSurfaceError(f"UPDATE SET of unknown column {col!r}")
        if col == key:
            raise SqlSurfaceError(
                f"cannot UPDATE the table key {key!r} (it identifies the "
                "row; DELETE + INSERT instead)"
            )
        assigns[col] = expr
    tgt = cur.filter(m.group("pred")) if m.group("pred") else cur
    upd = tgt.selectExpr(
        *[f"({e}) AS {c}" if (e := assigns.get(c)) else c for c in cur.columns]
    )
    return sn.merge_into_retrying(spark, path, upd, key)


def _delete(spark, stmt, tables):
    m = re.match(
        rf"DELETE\s+FROM\s+(?P<t>{_TREF})\s+WHERE\s+(?P<pred>[\s\S]+)$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(
            f"cannot parse DELETE statement (an unqualified DELETE is "
            f"refused — say WHERE true to truncate): {stmt!r}"
        )
    path = _resolve(m.group("t"), tables)
    key = sn._read_entry(path, sn.current_version(path))["key_col"]
    keys = sn.read_table(spark, path).filter(m.group("pred")).select(key)
    # merge-on-read (the Delta DV default): O(deleted rows), not O(files)
    return sn.delete_from_mor_retrying(spark, path, keys, key)


_LIT = r"(?:'[^']*'|-?\d+(?:\.\d+)?)"


def _lit(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _optimize(spark, stmt, tables):
    m = re.match(
        rf"OPTIMIZE\s+(?P<t>{_TREF})"
        rf"(?:\s+WHERE\s+(?P<where>[\s\S]+?))?"
        rf"(?:\s+ZORDER\s+BY\s+\((?P<z>[^)]+)\))?$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse OPTIMIZE statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    where = None
    if m.group("where"):
        where = {}
        # split conjunctions on AND, re-joining the AND that belongs to a
        # BETWEEN (…col BETWEEN lo AND hi…)
        raw = re.split(r"\s+AND\s+", m.group("where"), flags=re.IGNORECASE)
        clauses: list[str] = []
        for part in raw:
            if clauses and re.search(
                rf"BETWEEN\s+{_LIT}\s*$", clauses[-1], re.IGNORECASE
            ):
                clauses[-1] += f" AND {part}"
            else:
                clauses.append(part)
        for clause in clauses:
            em = re.fullmatch(
                rf"\s*({_IDENT})\s*=\s*({_LIT})\s*", clause
            )
            bm = re.fullmatch(
                rf"\s*({_IDENT})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})\s*",
                clause,
                re.IGNORECASE,
            )
            if em:
                where[em.group(1)] = _lit(em.group(2))
            elif bm:
                where[bm.group(1)] = (_lit(bm.group(2)), _lit(bm.group(3)))
            else:
                raise SqlSurfaceError(
                    f"OPTIMIZE WHERE supports col = literal / col BETWEEN "
                    f"a AND b conjunctions (file-scope pruning), got "
                    f"{clause!r}"
                )
    z = (
        [c.strip() for c in m.group("z").split(",")] if m.group("z") else None
    )
    return sn.optimize_retrying(spark, path, where=where, zorder_by=z)


def _vacuum(stmt, tables):
    m = re.match(
        rf"VACUUM\s+(?P<t>{_TREF})"
        rf"(?:\s+RETAIN\s+(?P<h>\d+(?:\.\d+)?)\s+HOURS)?"
        rf"(?:\s+KEEP\s+LAST\s+(?P<k>\d+))?"
        rf"(?:\s+(?P<dry>DRY\s+RUN))?$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse VACUUM statement: {stmt!r}")
    kwargs: dict = {}
    if m.group("h") is not None:
        kwargs["retention_seconds"] = float(m.group("h")) * 3600.0
    if m.group("k") is not None:
        kwargs["keep_last"] = int(m.group("k"))
    if m.group("dry"):
        kwargs["dry_run"] = True
    return sn.vacuum(_resolve(m.group("t"), tables), **kwargs)


def _restore(stmt, tables):
    m = re.match(
        rf"RESTORE\s+TABLE\s+(?P<t>{_TREF})\s+TO\s+"
        rf"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+|'[^']+')"
        rf"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']*'|[0-9.]+))$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse RESTORE statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    if m.group("ts"):
        v = sn.version_at_timestamp(path, _parse_ts(m.group("ts")))
    else:
        v = _resolve_version(path, m.group("v"))
    return sn.restore_table(path, v)


def _alter(spark, stmt, tables):
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_TREF})\s+(?P<rest>[\s\S]+)$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse ALTER TABLE statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    rest = m.group("rest").strip()

    rm = re.fullmatch(
        rf"RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})", rest, re.IGNORECASE
    )
    if rm:
        return sn.rename_column(spark, path, rm.group(1), rm.group(2))
    dm = re.fullmatch(rf"DROP\s+COLUMN\s+({_IDENT})", rest, re.IGNORECASE)
    if dm:
        return sn.drop_column(spark, path, dm.group(1))
    am = re.fullmatch(
        rf"ADD\s+COLUMN\s+({_IDENT})\s+([\s\S]+)", rest, re.IGNORECASE
    )
    if am:
        return sn.add_columns(spark, path, [(am.group(1), am.group(2).strip())])
    asm = re.fullmatch(r"ADD\s+COLUMNS\s*\(([\s\S]+)\)", rest, re.IGNORECASE)
    if asm:
        cols = []
        for part in _split_top(asm.group(1)):
            cm = re.match(rf"({_IDENT})\s+([\s\S]+)$", part)
            if not cm:
                raise SqlSurfaceError(f"cannot parse column spec {part!r}")
            cols.append((cm.group(1), cm.group(2).strip()))
        return sn.add_columns(spark, path, cols)
    tm = re.fullmatch(
        rf"ALTER\s+COLUMN\s+({_IDENT})\s+TYPE\s+([\s\S]+)", rest, re.IGNORECASE
    )
    if tm:
        return sn.alter_column_type(spark, path, tm.group(1),
                                    tm.group(2).strip())
    cm_ = re.fullmatch(
        rf"ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\(([\s\S]+)\)",
        rest,
        re.IGNORECASE,
    )
    if cm_:
        return sn.set_check_constraints(
            spark, path, {cm_.group(1): cm_.group(2).strip()}
        )
    dcm = re.fullmatch(
        rf"DROP\s+CONSTRAINT\s+({_IDENT})", rest, re.IGNORECASE
    )
    if dcm:
        return sn.drop_check_constraint(path, dcm.group(1))
    tg = re.fullmatch(
        rf"CREATE\s+TAG\s+({_IDENT})(?:\s+AS\s+OF\s+VERSION\s+(\d+))?",
        rest,
        re.IGNORECASE,
    )
    if tg:
        from . import refs

        return refs.create_tag(
            path, tg.group(1),
            version=int(tg.group(2)) if tg.group(2) else None,
        )
    dtg = re.fullmatch(rf"DROP\s+TAG\s+({_IDENT})", rest, re.IGNORECASE)
    if dtg:
        from . import refs

        refs.delete_tag(path, dtg.group(1))
        return {"deleted_tag": dtg.group(1)}
    sm = re.match(
        r"SET\s+PARTITION\s+SPEC\s*(?=\()", rest, re.IGNORECASE
    )
    if sm:
        open_at = rest.index("(", sm.end() - 1)
        end = open_at + _balanced(rest[open_at:])
        if rest[end:].strip():
            raise SqlSurfaceError(
                f"unexpected text after SET PARTITION SPEC: {rest[end:]!r}"
            )
        # _split_top keeps transform arguments together: bucket(16, c)
        return sn.set_partition_spec(
            spark, path, _split_top(rest[open_at + 1:end - 1])
        )
    if re.fullmatch(r"DROP\s+PARTITION\s+SPEC", rest, re.IGNORECASE):
        return sn.set_partition_spec(spark, path, None)
    raise SqlSurfaceError(f"unsupported ALTER TABLE action: {rest!r}")


def _describe(stmt, tables):
    m = re.match(
        rf"DESCRIBE\s+(?:(?P<hist>HISTORY)\s+|(?:DETAIL\s+)?)(?P<t>{_TREF})$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse DESCRIBE statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    return sn.history(path) if m.group("hist") else sn.describe(path)


def _create(spark, stmt, tables):
    cm = re.match(
        rf"CREATE\s+TABLE\s+(?P<dst>{_TREF})\s+SHALLOW\s+CLONE\s+"
        rf"(?P<src>{_TREF})(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+|'[^']+'))?$",
        stmt,
        re.IGNORECASE,
    )
    if cm:
        from . import refs

        src = _resolve(cm.group("src"), tables)
        return refs.clone_table(
            src,
            _resolve(cm.group("dst"), tables),
            version=_resolve_version(src, cm.group("v")),
        )
    m = re.match(
        rf"CREATE\s+TABLE\s+(?P<t>{_TREF})\s+KEY\s+(?P<k>{_IDENT})"
        rf"(?:\s+PARTITIONED\s+BY\s*(?P<par>\()|\s+AS\s+(?P<sel>[\s\S]+)$)",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(
            f"cannot parse CREATE TABLE (expected CREATE TABLE <t> KEY <k> "
            f"[PARTITIONED BY (…)] AS <select>): {stmt!r}"
        )
    spec = None
    if m.group("par"):  # balanced spec list: transforms carry commas/parens
        open_at = m.start("par")
        end = open_at + _balanced(stmt[open_at:])
        spec = _split_top(stmt[open_at + 1:end - 1])
        am = re.match(r"\s+AS\s+([\s\S]+)$", stmt[end:], re.IGNORECASE)
        if not am:
            raise SqlSurfaceError(
                f"expected AS <select> after PARTITIONED BY: {stmt[end:][:60]!r}"
            )
        sel = am.group(1)
    else:
        sel = m.group("sel")
    df = _run_select(spark, sel, tables)
    path = _resolve(m.group("t"), tables)
    v = sn.create_table(df, path, m.group("k"), partition_by=spec)
    return {"version": v, "table": path, "key_col": m.group("k")}


def _insert(spark, stmt, tables):
    m = re.match(
        rf"INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<t>{_TREF})\s+"
        rf"(?P<sel>[\s\S]+)$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlSurfaceError(f"cannot parse INSERT statement: {stmt!r}")
    path = _resolve(m.group("t"), tables)
    key = sn._read_entry(path, sn.current_version(path))["key_col"]
    df = _run_select(spark, m.group("sel"), tables)
    if m.group("mode").upper() == "OVERWRITE":
        return sn.overwrite_table(spark, path, df, key)
    return sn.append_table(spark, path, df, key)


def snapshot_sql_script(
    spark: SparkSession,
    script: str,
    tables: dict[str, str] | None = None,
    as_df: bool = False,
) -> list:
    """Run a ';'-separated sequence of snapshot_sql statements (split at
    paren/quote depth 0, so literals and sub-selects keep their
    semicolons) and return each statement's result in order — the CLI /
    migration-file form of the surface. ``as_df=True`` makes every
    entry a DataFrame (DESCRIBE/VACUUM/SHOW included), so script output
    is uniformly queryable. No transactionality ACROSS statements (each
    verb commits its own version, the engine's single-statement
    atomicity contract); a failing statement stops the script with
    prior commits intact, like every SQL shell."""
    return [
        snapshot_sql(spark, stmt, tables, as_df=as_df)
        for stmt in _split_top(script, ";")
        if stmt.strip()
    ]
