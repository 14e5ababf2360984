"""Stateful enrichment stage: lookup enrichment + deterministic anonymization.

Reference behaviors re-expressed (SURVEY.md §2.3/ST2, §2.4/J2, §3.3):

* anonymization applies the reference's per-field rules to every parsed
  string column, vectorized (`core.anonymize.anonymize_column`) — no global
  lock, no shared memo; tokens are pure functions of (config, field, value).
* ``map``-mode lookup dicts and the lang→region table are the
  "broadcast small side": loaded ONCE per actor in ``__init__`` (or shipped
  in the task closure — they are tiny), never reshipped per batch.
* domain extraction (url → domain) is the north-star's second lookup
  enrichment; done with one RE2 ``extract_regex`` per batch.

Use as an actor pool: ``ds.map_batches(Enricher(cfg, ...), concurrency=N,
batch_format="pyarrow", batch_size=None)`` — Ray serializes the constructed instance once per
actor; per-batch work is pure Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.anonymize import AnonConfig, anonymize_column

__all__ = ["Enricher", "integrity_pairs_batch", "extract_domain"]

_DOMAIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<domain>[^/]+)"


def extract_domain(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """url -> hostname (the routing/skew key of the webtext north star)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    st = pc.extract_regex(url, _DOMAIN_RE)
    return pc.struct_field(st, "domain")


class Enricher:
    """Anonymize configured columns + add ``domain`` and ``region`` columns."""

    INTEGRITY_TYPE = "_integrity"

    def __init__(
        self,
        anon_cfg: AnonConfig | None,
        lang_region: dict[str, str] | None = None,
        *,
        anonymize_columns: list[str] | None = None,
        url_column: str = "url",
        lang_column: str = "lang",
        emit_integrity_rows: bool = False,
        integrity_buckets: int = 8,
    ):
        self.cfg = anon_cfg
        self.url_column = url_column
        self.lang_column = lang_column
        self.emit_integrity = emit_integrity_rows and anon_cfg is not None
        self.integrity_buckets = integrity_buckets
        if anon_cfg is None:
            self.anon_columns: list[str] = []
        elif anonymize_columns is not None:
            self.anon_columns = anonymize_columns
        elif anon_cfg.defaults_mode is not None:
            # defaults.mode applies to EVERY field in the reference
            # anonymizer (table.rs rule resolution), not just configured
            # ones — restricting to cfg.fields would silently
            # under-anonymize (ADVICE r01).  Column-set defaulting can't
            # know "all fields" up front (it's per-batch), so require an
            # explicit column list for such configs.
            raise ValueError(
                "anon config sets defaults.mode: pass anonymize_columns "
                "explicitly (defaults apply to all fields, and the column "
                "set must be stated, not inferred from cfg.fields)")
        else:
            # defaults.mode=None: only the explicitly configured fields
            # transform; every other field passes through by definition
            self.anon_columns = sorted(anon_cfg.fields)
        if lang_region:
            self._langs = pa.array(list(lang_region.keys()), type=pa.string())
            self._regions = pa.array(list(lang_region.values()) + [None], type=pa.string())
        else:
            self._langs = None
            self._regions = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        names = set(batch.column_names)
        pairs: pa.Table | None = None
        if self.emit_integrity:
            pairs = integrity_pairs_batch(self.cfg, self.anon_columns)(batch)
        if self.cfg is not None:
            for field_name in self.anon_columns:
                if field_name not in names:
                    continue
                col, _replaced = anonymize_column(self.cfg, field_name, batch[field_name])
                batch = batch.set_column(
                    batch.column_names.index(field_name), field_name, col
                )
        if self.url_column in names:
            batch = batch.append_column("domain", extract_domain(batch[self.url_column]))
        if self._langs is not None and self.lang_column in names:
            lang = batch[self.lang_column]
            if isinstance(lang, pa.ChunkedArray):
                lang = lang.combine_chunks()
            # index_in misses -> null -> take index len(langs) -> null region
            pos = pc.index_in(lang, value_set=self._langs)
            pos = pc.if_else(pc.is_valid(pos), pos, pa.scalar(len(self._langs), type=pa.int32()))
            batch = batch.append_column("region", pc.take(self._regions, pos))
        if self.emit_integrity:
            # ship integrity pair columns alongside (null on data rows); pair
            # rows carry log_type="_integrityNN" (NN = hash bucket of the
            # pair key) so the hive-partitioned routed write doubles as a
            # FILESYSTEM SHUFFLE: the later dedup is one independent task
            # per bucket directory, no object-store all-to-all.  Integrity
            # derivation costs ZERO extra passes over the input.
            batch = _append_null_cols(batch, ["_pair_field", "_pair_original", "_pair_replacement"])
            if pairs is not None and pairs.num_rows:
                batch = _concat_with_pairs(batch, pairs, self.INTEGRITY_TYPE,
                                           self.integrity_buckets)
        return batch


def _append_null_cols(batch: pa.Table, cols: list[str]) -> pa.Table:
    n = batch.num_rows
    for c in cols:
        batch = batch.append_column(c, pa.nulls(n, type=pa.string()))
    return batch


def _concat_with_pairs(batch: pa.Table, pairs: pa.Table, integrity_type: str,
                       n_buckets: int = 8) -> pa.Table:
    """Append integrity pair rows in the batch's union schema (null-filled).
    Each pair row's log_type is ``{integrity_type}{bucket:02d}`` with
    bucket = FNV(field ++ original) % n_buckets."""
    from ..core.fnv import fnv1a64_arrow

    n = pairs.num_rows
    field_col = pairs["field"].combine_chunks()
    orig_col = pairs["original"].combine_chunks()
    joined = pc.binary_join_element_wise(field_col, orig_col, "\x00")
    bucket = (fnv1a64_arrow(joined) % np.uint64(n_buckets)).astype(np.int64)
    names_pool = np.array([f"{integrity_type}{b:02d}" for b in range(n_buckets)],
                          dtype=object)
    lt = names_pool[bucket]
    cols: dict[str, pa.Array] = {}
    for name in batch.column_names:
        f = batch.schema.field(name)
        if name == "log_type":
            cols[name] = pa.array(lt, type=pa.string())
        elif name == "_error":
            cols[name] = pa.array([""] * n, type=pa.string())
        elif name == "_pair_field":
            cols[name] = pairs["field"].combine_chunks()
        elif name == "_pair_original":
            cols[name] = pairs["original"].combine_chunks()
        elif name == "_pair_replacement":
            cols[name] = pairs["replacement"].combine_chunks()
        else:
            cols[name] = pa.nulls(n, type=f.type)
    return pa.concat_tables([batch, pa.table(cols).cast(batch.schema)])


def integrity_pairs_batch(cfg: AnonConfig, columns: list[str]):
    """Batch fn emitting per-batch-distinct (field, original, replacement) rows.

    Run over the PARSED (pre-anonymization) dataset; the global integrity
    table is then ``groupby(field, original).first()`` — safe because tokens
    are deterministic (SURVEY.md §2.6/D2).  Per-batch ``pc.unique``
    pre-dedup keeps the shuffle input small.
    """

    def fn(batch: pa.Table) -> pa.Table:
        fields_out: list[str] = []
        orig_out: list[pa.Array] = []
        repl_out: list[pa.Array] = []
        counts: list[int] = []
        for field_name in columns:
            if field_name not in batch.column_names:
                continue
            col = batch[field_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            uniq = pc.unique(col.drop_null())
            if len(uniq) == 0:
                continue
            repl, replaced = anonymize_column(cfg, field_name, uniq)
            mask = np.asarray(replaced)
            if not mask.any():
                continue
            orig_out.append(uniq.filter(pa.array(mask)))
            repl_out.append(repl.filter(pa.array(mask)))
            fields_out.append(field_name)
            counts.append(int(mask.sum()))
        if not fields_out:
            return pa.table({
                "field": pa.array([], type=pa.string()),
                "original": pa.array([], type=pa.string()),
                "replacement": pa.array([], type=pa.string()),
            })
        field_col = pa.array(
            np.repeat(np.array(fields_out, dtype=object), counts), type=pa.string()
        )
        return pa.table({
            "field": field_col,
            "original": pa.concat_arrays([a.cast(pa.string()) for a in orig_out]),
            "replacement": pa.concat_arrays([a.cast(pa.string()) for a in repl_out]),
        })

    return fn
