"""File-backed table catalog (sources/catalog.py): atomic updates,
validation, resolution — pure filesystem, no Spark."""

from __future__ import annotations

import json

import pytest

from hadoop_prototype_spark.sources import catalog as cat


def test_register_resolve_unregister_roundtrip(tmp_path):
    c = str(tmp_path / "tables.json")
    assert cat.catalog_tables(c) == {}  # absent file = empty catalog
    cat.register_table(c, "a", "/data/a")
    rep = cat.register_table(c, "b", "/data/b")
    assert rep["n_tables"] == 2
    assert cat.resolve_table(c, "a") == "/data/a"
    assert cat.catalog_tables(c) == {"a": "/data/a", "b": "/data/b"}
    # re-binding a name points it elsewhere (the rebuilt-table case)
    cat.register_table(c, "a", "/data/a2")
    assert cat.resolve_table(c, "a") == "/data/a2"
    cat.unregister_table(c, "b")
    assert cat.catalog_tables(c) == {"a": "/data/a2"}
    with pytest.raises(KeyError):
        cat.unregister_table(c, "b")
    with pytest.raises(KeyError):
        cat.resolve_table(c, "nope")


def test_catalog_rejects_non_catalog_files(tmp_path):
    c = str(tmp_path / "bad.json")
    with open(c, "w") as f:
        json.dump(["not", "a", "catalog"], f)
    with pytest.raises(ValueError):
        cat.catalog_tables(c)
    with open(c, "w") as f:
        json.dump({"x": 3}, f)  # non-string value
    with pytest.raises(ValueError):
        cat.register_table(c, "y", "/p")


def test_concurrent_registrars_lose_no_entries(tmp_path):
    """Racing register_table calls re-read + merge + atomic-replace: all
    names survive (same-name races are last-write-wins by contract)."""
    from concurrent.futures import ThreadPoolExecutor

    c = str(tmp_path / "tables.json")
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda i: cat.register_table(c, f"t{i}", f"/data/{i}"),
                range(32),
            )
        )
    doc = cat.catalog_tables(c)
    # the flock serializes the read-merge-replace: EVERY entry survives
    assert doc == {f"t{i}": f"/data/{i}" for i in range(32)}
