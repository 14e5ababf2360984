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
