"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship webtext pipeline (parse -> enrich -> route ->
aggregate) on a deterministic synthetic webtext table derived from sf0.001
scale and returns the per-sink aggregate Dataset.

``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
as ``sf_dir -> Dataset/DataFrame/Table`` callables; ``oracle_sql()`` holds
the DuckDB-equivalent SQL for each (omitted only for non-SQL-expressible
ops — FNV anonymization tokens, MinHash sketches — which the pytest suite
verifies against serial oracles instead).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_TINY = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline at tiny scale; returns per-sink aggregate counts."""
    import ray.data as rd

    from logparse_rs_ray.pipelines.flagship import run_flagship
    from logparse_rs_ray.webtext import webtext_dataset

    out_dir = "/tmp/logparse_rs_ray_entry"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    run_flagship(webtext_dataset(6000, seed=42), out_dir,
                 generated_at="2025-01-01T00:00:00Z")
    # return the routed per-sink aggregate as a Dataset (stable schema)
    from logparse_rs_ray.stages.aggregate import count_by

    sinks = rd.read_parquet(f"{out_dir}/sinks")
    return count_by(sinks, "sink", count_name="n_rows").sort("sink")


def queries() -> dict[str, Callable[[str], Any]]:
    from logparse_rs_ray.pipelines import query_registry

    return query_registry()


def oracle_sql() -> dict[str, str]:
    from logparse_rs_ray.pipelines import oracle_registry

    return oracle_registry()
