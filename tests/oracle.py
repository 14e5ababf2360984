"""Pure-Python serial oracle implementing the reference's semantics exactly.

Used by pipeline tests to assert the north-rule gates: per-sink aggregate
counts, routed-row set equality, byte-identical extracted text per url, and
integrity-table equality (FIXTURES.md §4, SURVEY.md §5.2).
"""

from __future__ import annotations

from collections import Counter

from logparse_rs_ray.core.anonymize import AnonConfig, SerialAnonymizer
from logparse_rs_ray.core.schema import CompiledSchema, TYPE_INDEX
from logparse_rs_ray.core.tokenize import split_csv
from logparse_rs_ray.core.fnv import fnv1a64
from logparse_rs_ray.webtext import LANG_REGION


def extract_csv(line: str) -> str:
    """Reference example's syslog-prefix strip (pan_dynamic_parser.py:828-831)."""
    idx = line.find(" 1,")
    return line[idx + 1:].strip() if idx != -1 else line.strip()


def run_oracle(table, schema: CompiledSchema, anon_cfg: AnonConfig | None = None) -> dict:
    """table: pyarrow webtext table.  Returns the oracle's view of the run."""
    anon = SerialAnonymizer(anon_cfg) if anon_cfg else None
    rows_by_sink: dict[str, list[dict]] = {}
    extracted: dict[str, str] = {}
    counters: dict[str, Counter] = {
        "by_log_type": Counter(), "by_action": Counter(), "top_sources": Counter(),
        "top_applications": Counter(), "by_region": Counter(), "top_domains": Counter(),
        "by_severity": Counter(), "error_reasons": Counter(),
    }
    urls = table["url"].to_pylist()
    texts = table["text"].to_pylist()
    langs = table["lang"].to_pylist()
    for url, text, lang in zip(urls, texts, langs):
        payload = extract_csv(text)
        extracted[url] = payload
        fields = split_csv(payload)
        if len(fields) <= TYPE_INDEX:
            err = "empty_line" if payload == "" else "no_type_at_index_3"
            counters["error_reasons"][err if err != "empty_line" else "no_type_at_index_3"] += 1
            rows_by_sink.setdefault("_deadletter", []).append({"url": url})
            continue
        t = fields[TYPE_INDEX]
        if t not in schema.type_to_fields:
            counters["error_reasons"]["unknown_log_type"] += 1
            rows_by_sink.setdefault("_deadletter", []).append({"url": url})
            continue
        pos = dict(schema.value_positions(t))
        rec: dict[str, str | None] = {
            name: (fields[p] if p < len(fields) else None) for name, p in pos.items()
        }
        if anon is not None:
            for k in list(rec):
                v = rec[k]
                if v is None:
                    continue
                repl = anon.anonymize_one(k, v)
                if repl is not None:
                    rec[k] = repl
        domain = url.split("://", 1)[1].split("/", 1)[0]
        region = LANG_REGION.get(lang)
        rec.update({"url": url, "hash64": fnv1a64(payload), "raw_excerpt": payload[:256],
                    "domain": domain, "region": region, "log_type": t})
        rows_by_sink.setdefault(t, []).append(rec)
        counters["by_log_type"][t] += 1
        if rec.get("action"):
            counters["by_action"][rec["action"]] += 1
        if rec.get("src_ip"):
            counters["top_sources"][rec["src_ip"]] += 1
        if rec.get("application"):
            counters["top_applications"][rec["application"]] += 1
        if rec.get("severity"):
            counters["by_severity"][rec["severity"]] += 1
        if region:
            counters["by_region"][region] += 1
        counters["top_domains"][domain] += 1
    return {
        "rows_by_sink": rows_by_sink,
        "extracted": extracted,
        "counters": counters,
        "integrity": anon.table if anon else {},
    }
