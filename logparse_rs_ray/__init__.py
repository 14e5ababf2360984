"""logparse_rs_ray — a Ray-Data-native log/telemetry data-processing engine.

A from-scratch reimplementation of the capabilities of ``rmarnold/logparse_rs``
(reference snapshot at /root/reference) as a streaming
parse -> enrich -> route -> aggregate pipeline over Arrow batches on
``ray.data.Dataset``.  This is NOT a port: the reference is a single-node
Rust/PyO3 engine; this package expresses every operator as vectorized
``map_batches`` transforms, actor-pool stages for stateful work, and
groupby/sort shuffles, designed for multi-node execution over ~100 TB of
Parquet web-text.

Layout:
    core/       pure, Ray-free semantics kernels (tokenizer, schema compile,
                FNV-1a hashing, anonymizer rules) — unit-tested against the
                reference's pinned behaviors.
    stages/     map_batches / actor-pool stage implementations.
    sources/    read/write helpers (column-pruned parquet, routed sinks).
    functions/  text analysis, dedup sketches, similarity kernels.
    pipelines/  end-to-end pipelines (flagship webtext pipeline, relational
                query suite, dedup/similarity pipelines).
    state/      checkpoint manifest + resume logic.

Nothing in this package calls ``ray.init()``: the caller (driver, bench.py,
test fixture) owns the Ray session.
"""

__version__ = "0.1.0"


def tune_worker_threads() -> None:
    """Pin per-process Arrow thread pools inside Ray workers.

    Every pyarrow kernel call otherwise spins a CPU pool sized to the whole
    machine — 32 Ray workers x 32 Arrow threads oversubscribes the box ~30x
    and measurably ANTI-scales (32-CPU runs slower than 8-CPU).  Ray already
    reserves one CPU per map task, so one Arrow compute thread per worker is
    the right shape.  Idempotent; no-op on the driver.
    """
    try:
        import ray
        from ray._private import worker as _w

        if _w.global_worker.mode != ray.WORKER_MODE:
            return
        import pyarrow as _pa

        if _pa.cpu_count() > 1:
            _pa.set_cpu_count(1)
            _pa.set_io_thread_count(2)
    except Exception:
        pass


tune_worker_threads()


def auto_pool_size(min_actors: int = 2) -> tuple[int, int]:
    """(min, max) autoscaling bounds for an actor-pool ``map_batches`` stage,
    derived from the cluster instead of a constant (ADVICE r03: a
    hard-coded ``concurrency=2`` caps an embarrassingly-parallel inference
    stage at 2 actors on a 256-node cluster).

    Ray's autoscaling pool starts at ``min_actors`` and grows toward the
    max only while the stage is the bottleneck, so a high ceiling costs
    nothing at toy scale but lets the stage own the cluster when it is the
    hot stage.  Falls back to ``os.cpu_count()`` when called before Ray is
    initialized (Dataset build time) — the bound is resolved per run, not
    baked into the pipeline definition.
    """
    cpus = 0
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if not cpus:
        import os

        cpus = os.cpu_count() or min_actors
    return (min_actors, max(min_actors, cpus))
