"""Deterministic synthetic Common-Crawl-style webtext table (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Every value derives arithmetically from ``(seed, row_index)`` via a
splitmix64-style mixer, so generation is partition-independent: any block
``[start, end)`` produces identical rows no matter how the dataset is split
across workers — which is what makes the generator usable at bench scale via
``ray.data.range(n).map_batches(...)`` and still byte-reproducible.

Each row's ``text`` is filler prose plus an embedded Palo-Alto-style syslog
line (``... 1,<csv payload>``); the flagship pipeline extracts the payload
(byte-identical per url — the north-rule invariant), parses it against the
PAN-ish schema below, anonymizes, routes by log type and aggregates.

Row mix: 70% TRAFFIC, 20% THREAT, 9.5% SYSTEM, ~0.5% malformed (unknown type
or empty payload -> dead-letter).  ~2% of TRAFFIC rows carry a quoted field
to exercise the tokenizer's quote path.  Domains are Zipf-skewed: two hot
domains hold ~40% of rows (salted-key skew handling must absorb this).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core.schema import CompiledSchema

__all__ = [
    "PAN_SCHEMA_JSON",
    "pan_schema",
    "default_anon_config_json",
    "generate_webtext_batch",
    "generate_webtext_rows",
    "generate_webtext_table",
    "webtext_dataset",
    "LANGS",
    "LANG_REGION",
]

EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

LANGS = ["en", "de", "fr", "es", "zh", "ar"]
_LANG_CUM = np.array([0.40, 0.55, 0.67, 0.79, 0.92, 1.00])
LANG_REGION = {"en": "AMER", "de": "EMEA", "fr": "EMEA", "es": "AMER", "zh": "APAC", "ar": "EMEA"}

_HOT_DOMAINS = ["hot-cdn.example.com", "big-portal.example.net"]
_COLD_DOMAINS = [f"site{i:02d}.example.org" for i in range(48)]
ACTIONS = ["allow", "deny", "drop", "reset-both"]
APPS = ["web-browsing", "ssl", "dns", "smtp", "ftp", "ssh", "quic", "rdp"]
SEVERITIES = ["low", "medium", "high", "critical", "informational"]
THREATS = ["spyware", "vulnerability", "virus", "url-filtering", "wildfire"]
MODULES = ["general", "management", "auth", "ha", "routing"]
_WORDS = ("the quick brown fox stream data batch shuffle arrow block actor "
          "cluster parquet vector hash table spill lineage worker schedule").split()

# PAN-ish schema in the reference's JSON format (docs/schema.md).  CSV layout:
# idx0 = "1" (version-ish prefix kept by extract_csv), 1 receive time, 2 serial,
# 3 TYPE (dispatch index — reference parser.rs:11), 4 subtype, then payload.
PAN_SCHEMA_JSON = {
    "palo_alto_syslog_fields": {
        "log_types": {
            "traffic": {
                "type_value": "TRAFFIC",
                "description": "session traffic",
                "field_count": 14,
                "fields": [
                    "FUTURE_USE", {"name": "Receive Time"}, {"name": "Serial Number"},
                    {"name": "Type"}, {"name": "Subtype"}, {"name": "Src IP"},
                    {"name": "Dst IP"}, {"name": "Src Port"}, {"name": "Dst Port"},
                    {"name": "Application"}, {"name": "Action"}, {"name": "Bytes"},
                    {"name": "Packets"}, {"name": "User"},
                ],
            },
            "threat": {
                "type_value": "THREAT",
                "description": "threat detection",
                "field_count": 13,
                "fields": [
                    "FUTURE_USE", {"name": "Receive Time"}, {"name": "Serial Number"},
                    {"name": "Type"}, {"name": "Subtype"}, {"name": "Src IP"},
                    {"name": "Dst IP"}, {"name": "Application"}, {"name": "Severity"},
                    {"name": "Threat ID"}, {"name": "Action"}, {"name": "User"},
                    {"name": "Misc"},
                ],
            },
            "system": {
                "type_value": "SYSTEM",
                "description": "system events",
                "field_count": 9,
                "fields": [
                    "FUTURE_USE", {"name": "Receive Time"}, {"name": "Serial Number"},
                    {"name": "Type"}, {"name": "Subtype"}, {"name": "Module"},
                    {"name": "Severity"}, {"name": "Event Description"},
                    "FUTURE_USE",
                ],
            },
        }
    }
}


def pan_schema() -> CompiledSchema:
    import json

    from .core.schema import compile_schema

    return compile_schema(json.dumps(PAN_SCHEMA_JSON, sort_keys=True))


def default_anon_config_json() -> dict:
    """Flagship anonymizer config (reference format, version 1)."""
    return {
        "version": 1,
        "defaults": {"tokenize": {"prefix": "T_", "salt": "webtext-pepper"}},
        "fields": {
            "src_ip": {"mode": "tokenize", "tokenize": {"prefix": "IP_", "salt": "ip-salt"}},
            "user": {
                "mode": "map",
                "map": {"admin": "user_admin", "root": "user_root"},
                "fallback": "tokenize",
                "tokenize": {"prefix": "USR_"},
            },
            "serial_number": {"mode": "fixed", "fixed": "SN-REDACTED"},
        },
    }


_U = np.uint64


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — statistically uniform, pure arithmetic."""
    with np.errstate(over="ignore"):
        x = (x + _U(0x9E3779B97F4A7C15)) * _U(0xBF58476D1CE4E5B9)
        x ^= x >> _U(27)
        x *= _U(0x94D049BB133111EB)
        x ^= x >> _U(31)
    return x


def _derive(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        base = idx.astype(_U) ^ (_U(seed) * _U(0xA24BAED4963EE407)) ^ (_U(stream) * _U(0x9FB21C651E98DF25))
    return _mix(base)


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> _U(11)).astype(np.float64) / float(1 << 53)


def generate_webtext_batch(start: int, end: int, seed: int = 42) -> pa.Table:
    """Rows [start, end) of the deterministic webtext table."""
    return generate_webtext_rows(np.arange(start, end, dtype=np.int64), seed)


def generate_webtext_rows(idx: np.ndarray, seed: int = 42) -> pa.Table:
    """Rows for an ARBITRARY id array — each row derives from its id alone,
    so any batching/coalescing of ids yields identical rows (map_batches may
    coalesce non-adjacent blocks into one batch; never assume a batch is a
    contiguous range)."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)

    # domain: 25% hot0, 15% hot1, rest uniform over 48 cold domains
    u_dom = _u01(_derive(seed, idx, 1))
    cold_pick = (_derive(seed, idx, 2) % _U(len(_COLD_DOMAINS))).astype(np.int64)
    domains = np.where(
        u_dom < 0.25, _HOT_DOMAINS[0],
        np.where(u_dom < 0.40, _HOT_DOMAINS[1], np.array(_COLD_DOMAINS, dtype=object)[cold_pick]),
    ).astype(object)

    # lang from fixed categorical distribution
    u_lang = _u01(_derive(seed, idx, 3))
    lang_idx = np.searchsorted(_LANG_CUM, u_lang, side="right")
    langs = np.array(LANGS, dtype=object)[np.minimum(lang_idx, len(LANGS) - 1)]

    # row class: traffic / threat / system / malformed
    u_cls = _u01(_derive(seed, idx, 4))
    h5 = _derive(seed, idx, 5)
    h6 = _derive(seed, idx, 6)
    h7 = _derive(seed, idx, 7)
    h8 = _derive(seed, idx, 8)

    ip_a = (h5 % _U(223) + _U(1)).astype(np.int64)
    ip_b = ((h5 >> _U(8)) % _U(256)).astype(np.int64)
    ip_c = ((h5 >> _U(16)) % _U(256)).astype(np.int64)
    dst_a = (h6 % _U(223) + _U(1)).astype(np.int64)
    dst_b = ((h6 >> _U(8)) % _U(256)).astype(np.int64)
    sport = (h7 % _U(60000) + _U(1024)).astype(np.int64)
    dport = np.array([80, 443, 53, 22, 25, 3389], dtype=np.int64)[(h7 >> _U(20)).astype(np.int64) % 6]
    app_i = ((h8 >> _U(3)) % _U(len(APPS))).astype(np.int64)
    act_i = ((h8 >> _U(13)) % _U(len(ACTIONS))).astype(np.int64)
    sev_i = ((h8 >> _U(23)) % _U(len(SEVERITIES))).astype(np.int64)
    thr_i = ((h8 >> _U(33)) % _U(len(THREATS))).astype(np.int64)
    mod_i = ((h8 >> _U(43)) % _U(len(MODULES))).astype(np.int64)
    nbytes = (h6 % _U(10_000_000)).astype(np.int64)
    npkts = (h7 % _U(10_000)).astype(np.int64)
    user_i = (h5 % _U(200)).astype(np.int64)
    quoted = (_u01(_derive(seed, idx, 9)) < 0.02)
    ts_us = EPOCH_US + idx * 1_000_000

    urls: list[str] = []
    texts: list[str] = []
    htmls: list[bytes] = []
    bad_html = _u01(_derive(seed, idx, 10)) < 0.01
    w1 = (h5 % _U(len(_WORDS))).astype(np.int64)
    w2 = (h6 % _U(len(_WORDS))).astype(np.int64)
    w3 = (h7 % _U(len(_WORDS))).astype(np.int64)

    for k in range(n):
        i = int(idx[k])
        rts = f"2025/01/{(i % 28) + 1:02d} {(i // 3600) % 24:02d}:{(i // 60) % 60:02d}:{i % 60:02d}"
        serial = f"{(i % 97) + 1:012d}"
        u = u_cls[k]
        if u < 0.70:
            user = "admin" if user_i[k] == 0 else ("root" if user_i[k] == 1 else f"user{user_i[k]}")
            app = APPS[app_i[k]]
            if quoted[k]:
                app = f'"{app},v2"'
            payload = (
                f"1,{rts},{serial},TRAFFIC,start,"
                f"10.{ip_a[k]}.{ip_b[k]}.{ip_c[k]},203.{dst_a[k]}.{dst_b[k]}.7,"
                f"{sport[k]},{dport[k]},{app},{ACTIONS[act_i[k]]},{nbytes[k]},{npkts[k]},{user}"
            )
        elif u < 0.90:
            user = f"user{user_i[k]}"
            payload = (
                f"1,{rts},{serial},THREAT,{THREATS[thr_i[k]]},"
                f"10.{ip_a[k]}.{ip_b[k]}.{ip_c[k]},203.{dst_a[k]}.{dst_b[k]}.7,"
                f"{APPS[app_i[k]]},{SEVERITIES[sev_i[k]]},TID-{int(h8[k] % _U(5000))},"
                f"{ACTIONS[act_i[k]]},{user},misc-{int(h7[k] % _U(100))}"
            )
        elif u < 0.995:
            payload = (
                f"1,{rts},{serial},SYSTEM,general,{MODULES[mod_i[k]]},"
                f"{SEVERITIES[sev_i[k]]},event {_WORDS[w1[k]]} {_WORDS[w2[k]]},x"
            )
        else:
            # malformed: unknown type or truncated line -> dead-letter
            payload = f"1,{rts},{serial},BOGUS,oops" if (i % 2 == 0) else "1,short"
        prose = f"{_WORDS[w1[k]]} {_WORDS[w2[k]]} {_WORDS[w3[k]]} page {i}"
        text = f"{prose}\n{rts.split(' ')[0]} {domains[k]} 1,{payload[2:]}"
        url = f"https://{domains[k]}/{_WORDS[w2[k]]}/{i}"
        html = b"<html><body><p>" + text.encode("utf-8") + (b"\xff\xfe" if bad_html[k] else b"") + b"</p></body></html>"
        urls.append(url)
        texts.append(text)
        htmls.append(html)

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts_us, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs.tolist(), type=pa.string()),
    })


def generate_webtext_table(n_rows: int, seed: int = 42) -> pa.Table:
    return generate_webtext_batch(0, n_rows, seed=seed)


def webtext_dataset(n_rows: int, seed: int = 42, *, ray_remote_args: dict | None = None):
    """Distributed deterministic generation: ray.data.range -> map_batches.

    Partition-independent: any block layout yields the same rows.
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return generate_webtext_rows(ids, seed)

    return rd.range(n_rows).map_batches(gen, batch_format="pyarrow", batch_size=32768,
                                        **(ray_remote_args or {}))
