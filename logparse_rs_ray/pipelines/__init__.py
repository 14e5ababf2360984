"""End-to-end pipelines (flagship webtext, relational suite, dedup, similarity)."""

from __future__ import annotations

# the one module list both __ray_entry__ and the CLI build their merged
# registries from — add new pipeline modules HERE, nowhere else
REGISTRY_MODULES = ("relational", "logops", "dedup", "similarity", "textops",
                    "multimodal", "windows", "curation")


def query_registry() -> dict:
    """Merged ``{name: callable}`` over every pipeline module's QUERIES."""
    import importlib

    q: dict = {}
    for m in REGISTRY_MODULES:
        q.update(importlib.import_module(
            f"logparse_rs_ray.pipelines.{m}").QUERIES)
    return q


def oracle_registry() -> dict:
    """Merged ``{name: sql}`` over every pipeline module's ORACLE_SQL."""
    import importlib

    s: dict = {}
    for m in REGISTRY_MODULES:
        s.update(importlib.import_module(
            f"logparse_rs_ray.pipelines.{m}").ORACLE_SQL)
    return s
