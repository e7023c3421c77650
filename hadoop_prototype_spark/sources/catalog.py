"""A file-backed table catalog for the snapshot SQL surface: one JSON
document mapping logical table names → snapshot-table paths, so SQL
statements can say ``MERGE INTO sales …`` across sessions and machines
instead of carrying path literals (the role a metastore plays for
Delta/Iceberg, scoped down to the single artifact this engine needs:
the name binding — schemas, stats and versions already live in each
table's own log, which is the lakehouse rule this repo follows
everywhere: the log owns the metadata, the catalog only points at it).

Concurrency: updates take an ``fcntl.flock`` on a ``<catalog>.lock``
sibling around the read-merge-replace (the replace itself is atomic:
tmp, fsync, os.replace), so racing registrars serialize and lose no
entries — last write of the SAME name wins, which is the standard
catalog contract. Reads are
one json.load. The file lives wherever the caller puts it (a repo-local
``tables.json``, a shared NFS path); at 100 TB the catalog is still a
few KB — it scales with the number of TABLES, never the data.
"""

from __future__ import annotations

import json
import os
import uuid


def _load(path: str) -> dict[str, str]:
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        return {}
    if not isinstance(doc, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in doc.items()
    ):
        raise ValueError(f"{path} is not a catalog file (expect {{name: path}})")
    return doc


def _store(path: str, doc: dict[str, str]) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".cat-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(dict(sorted(doc.items())), f, indent=1)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class _locked:
    """Exclusive advisory lock on ``<catalog>.lock`` for the duration of
    a read-merge-replace update."""

    def __init__(self, catalog: str):
        self._path = catalog + ".lock"

    def __enter__(self):
        import fcntl

        d = os.path.dirname(os.path.abspath(self._path))
        os.makedirs(d, exist_ok=True)
        self._f = open(self._path, "w")
        fcntl.flock(self._f, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()


def register_table(catalog: str, name: str, table_path: str) -> dict:
    """Bind ``name`` → ``table_path`` (re-binding an existing name is
    allowed — pointing 'sales' at a rebuilt table is the use case)."""
    with _locked(catalog):
        doc = _load(catalog)
        doc[name] = table_path
        _store(catalog, doc)
    return {"catalog": catalog, "name": name, "path": table_path,
            "n_tables": len(doc)}


def unregister_table(catalog: str, name: str) -> dict:
    with _locked(catalog):
        doc = _load(catalog)
        if name not in doc:
            raise KeyError(f"no table {name!r} in catalog {catalog}")
        del doc[name]
        _store(catalog, doc)
    return {"catalog": catalog, "removed": name, "n_tables": len(doc)}


def catalog_tables(catalog: str) -> dict[str, str]:
    """The full name → path map (what snapshot_sql takes as ``tables``)."""
    return _load(catalog)


def resolve_table(catalog: str, name: str) -> str:
    doc = _load(catalog)
    if name not in doc:
        raise KeyError(
            f"no table {name!r} in catalog {catalog} (have {sorted(doc)})"
        )
    return doc[name]
