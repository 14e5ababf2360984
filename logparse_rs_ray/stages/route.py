"""Router: fan rows out to per-sink Parquet directories + dead-letter sink.

Reference behavior: the NDJSON path skips malformed lines silently
(lib.rs:412-423) and the report path counts them as errors
(pan_dynamic_parser.py:1053-1057).  Here malformed rows are first-class
data: they get ``sink="_deadletter"`` and land in their own partition with
the error reason, so nothing is silently dropped and the error count is an
aggregate over the dead-letter sink.

Scale design (SURVEY.md §4.2, north rule):

* The sink key (log type) has few distinct values but heavy skew (TRAFFIC
  ~70%).  Routing is hive-partitioned ``write_parquet(partition_cols=
  ["sink"])`` — a SINGLE pass over the data, no shuffle at all: each task
  writes its own rows into every sink directory it sees.  Readers of one
  sink read only that directory (and can prune to the sink's columns).
* ``salt_partitions(ds, key, P)`` adds a ``salt`` column =
  ``hash64 % P`` for use as a secondary partition column when a single hot
  sink needs to be split across many files/key-ranges (hot-domain skew).
* Sink schemas: each sink directory additionally prunes the union layout to
  the sink's own columns when ``project_per_sink=True`` (per-sink passes —
  one filter+write per sink; use for few sinks / when downstream wants
  narrow files).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.schema import CompiledSchema

__all__ = ["add_sink_column", "add_salt_column", "route_write", "DEADLETTER"]

DEADLETTER = "_deadletter"


def add_sink_column(batch: pa.Table, *, key_col: str = "log_type",
                    hot_keys: list[str] | None = None,
                    num_salts: int = 16) -> pa.Table:
    """sink = routing key for clean rows, "_deadletter" for rows with _error.

    ``key_col`` selects the fan-out key (log type for the reference's sinks;
    ``domain`` for the webtext north star's per-domain writers).  When
    ``hot_keys`` is given, rows of those keys also get a ``salt`` column
    (= hash64 % num_salts, 0 elsewhere) so a Zipf-hot key's directory is
    split into num_salts sub-partitions — no single writer, reader or
    downstream task ever owns an entire hot key (north-rule skew handling).
    """
    err = batch["_error"]
    if isinstance(err, pa.ChunkedArray):
        err = err.combine_chunks()
    bad = pc.not_equal(err, "")
    lt = batch[key_col]
    if isinstance(lt, pa.ChunkedArray):
        lt = lt.combine_chunks()
    sink = pc.if_else(bad, pa.scalar(DEADLETTER, type=pa.string()), lt.cast(pa.string()))
    # unknown/absent keys are routed to the dead letter too; null-safe
    sink = pc.if_else(pc.is_valid(sink), sink, pa.scalar(DEADLETTER, type=pa.string()))
    if key_col != "log_type" and "log_type" in batch.column_names:
        # side rows (integrity pairs, log_type="_integrityNN") must keep
        # their bucketed side sink regardless of the data routing key
        side_lt = batch["log_type"]
        if isinstance(side_lt, pa.ChunkedArray):
            side_lt = side_lt.combine_chunks()
        is_side = pc.fill_null(pc.starts_with(side_lt, "_"), False)
        sink = pc.if_else(is_side, side_lt.cast(pa.string()), sink)
    batch = batch.append_column("sink", sink)
    if hot_keys:
        h = batch["hash64"]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        h = pc.fill_null(h, 0)  # side rows carry null hash64 -> salt 0
        salt_all = (np.asarray(h, dtype=np.uint64) % np.uint64(num_salts)).astype(np.int32)
        is_hot = np.asarray(pc.is_in(sink, value_set=pa.array(hot_keys, type=pa.string())))
        batch = batch.append_column("salt", pa.array(np.where(is_hot, salt_all, 0)))
    return batch


def add_salt_column(batch: pa.Table, *, num_salts: int = 16) -> pa.Table:
    """salt = hash64 % P — splits a hot sink across P sub-partitions so no
    single writer/consumer owns an entire hot key (north-rule skew handling)."""
    h = batch["hash64"]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    salt = pa.array(
        (np.asarray(h, dtype=np.uint64) % np.uint64(num_salts)).astype(np.int32)
    )
    return batch.append_column("salt", salt)


def route_write(
    ds,
    out_dir: str,
    schema: CompiledSchema | None = None,
    *,
    project_per_sink: bool = False,
    num_salts: int = 0,
):
    """Write routed parquet under ``out_dir``.

    Default: one streaming pass, hive-partitioned by ``sink`` (plus ``salt``
    when ``num_salts > 0``).  With ``project_per_sink`` each known sink gets
    its own filtered, column-pruned write (len(sinks)+1 passes) — narrow
    files at the cost of re-reading the routed dataset per sink.
    """
    routed = ds.map_batches(add_sink_column, batch_format="pyarrow", batch_size=None)
    if num_salts:
        routed = routed.map_batches(
            lambda b: add_salt_column(b, num_salts=num_salts),
            batch_format="pyarrow", batch_size=None,
        )
    if not project_per_sink:
        cols = ["sink", "salt"] if num_salts else ["sink"]
        routed.write_parquet(out_dir, partition_cols=cols)
        return

    assert schema is not None, "project_per_sink requires the compiled schema"
    base = [c for c in ("url", "warc_ts", "lang", "extracted_text", "log_type") if c in ds.schema().names]
    tail = ["hash64", "raw_excerpt"]
    for t, cols in schema.type_to_columns.items():
        sub = routed.filter(expr=f'sink == "{t}"') if hasattr(routed, "filter") else routed
        sub = sub.select_columns(base + list(cols) + tail)
        sub.write_parquet(f"{out_dir}/sink={t}")
    dead = routed.filter(expr=f'sink == "{DEADLETTER}"')
    dead.select_columns(base + ["_error"]).write_parquet(f"{out_dir}/sink={DEADLETTER}")
