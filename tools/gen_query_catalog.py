"""Generate QUERIES.md — one row per driver-gate query: name, oracle
status, and the first docstring line of its callable (or of the underlying
pipeline function for registry-level lambdas).

Usage: PYTHONPATH=/root/repo python tools/gen_query_catalog.py
"""

from __future__ import annotations

import inspect


def _delegated_doc(fn) -> str:
    """Registry wrappers are often two-liners delegating to a documented
    stage/pipeline function — chase the `from duke_ray.x import y` inside
    the wrapper body and use that function's docstring."""
    import importlib
    import re

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    for mod, names in re.findall(r"from (duke_ray[\w.]*) import ([\w, ]+)", src):
        for name in [n.strip().split(" as ")[0] for n in names.split(",")]:
            try:
                target = getattr(importlib.import_module(mod), name)
            except (ImportError, AttributeError):
                continue
            d = inspect.getdoc(target)
            if d:
                return d
    return ""


def first_doc_line(fn) -> str:
    doc = inspect.getdoc(fn) or _delegated_doc(fn)
    line = " ".join(doc.split("\n\n")[0].split()) if doc else ""
    return line


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    rows = []
    for name in sorted(qs):
        status = "oracled" if name in oracles else "rows-only"
        rows.append((name, status, first_doc_line(qs[name])))

    n_oracled = sum(1 for _, s, _ in rows if s == "oracled")
    lines = [
        "# Query catalog (generated — do not edit; tools/gen_query_catalog.py)",
        "",
        f"{len(rows)} driver-gate queries: {n_oracled} DuckDB-oracled, "
        f"{len(rows) - n_oracled} rows-only (each rows-only query carries "
        "in-query self-checking invariants; see __ray_entry__.py).",
        "",
        "| query | oracle | what it does |",
        "|---|---|---|",
    ]
    for name, status, doc in rows:
        doc = doc.replace("|", "\\|")
        if len(doc) > 220:
            doc = doc[:217] + "..."
        lines.append(f"| {name} | {status} | {doc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(rows)} queries, {n_oracled} oracled")
    ray.shutdown()


if __name__ == "__main__":
    main()
