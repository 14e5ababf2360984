"""NDJSON envelope conformance + include_all + fail policy + parser edges."""

import glob
import json

import pyarrow as pa
import pytest

from logparse_rs_ray.core.schema import TYPE_INDEX
from logparse_rs_ray.core.tokenize import split_csv
from logparse_rs_ray.core.fnv import fnv1a64
from logparse_rs_ray.stages.parse import WebtextParser
from logparse_rs_ray.webtext import generate_webtext_table, pan_schema

from .oracle import extract_csv


@pytest.mark.usefixtures("ray_session")
class TestNdjson:
    def test_envelope_matches_reference_shape(self, tmp_path):
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import parse_webtext
        from logparse_rs_ray.pipelines.ndjson import write_ndjson_sinks

        table = generate_webtext_table(800, seed=42)
        schema = pan_schema()
        parsed = parse_webtext(rd.from_arrow(table), schema)
        out = str(tmp_path / "nd")
        write_ndjson_sinks(parsed, out, schema)

        # serial oracle over every clean line
        want: dict[int, dict] = {}
        for text in table["text"].to_pylist():
            payload = extract_csv(text)
            fields = split_csv(payload)
            if len(fields) <= TYPE_INDEX or fields[TYPE_INDEX] not in schema.type_to_fields:
                continue
            t = fields[TYPE_INDEX]
            pos = dict(schema.value_positions(t))
            parsed_map = {name: (fields[p] if p < len(fields) else None)
                          for name, p in pos.items()}
            want[fnv1a64(payload)] = {
                "parsed": parsed_map, "raw_excerpt": payload[:256], "type": t,
            }

        seen = 0
        for t in schema.type_to_fields:
            for f in glob.glob(f"{out}/{t}/*.json"):
                for line in open(f):
                    rec = json.loads(line)
                    assert set(rec) == {"parsed", "raw_excerpt", "hash64"}
                    w = want[rec["hash64"]]
                    assert rec["raw_excerpt"] == w["raw_excerpt"]
                    assert rec["parsed"] == w["parsed"], rec
                    seen += 1
        assert seen == len(want)


class TestParserFlags:
    def test_fail_policy_raises_on_malformed(self):
        parser = WebtextParser(pan_schema(), on_error="fail", strip_syslog_prefix=False)
        batch = pa.table({"text": ["1,t,s,TRAFFIC,sub,1.2.3.4", "1,t,s,BOGUS,x"]})
        with pytest.raises(ValueError, match="unknown_log_type"):
            parser(batch)

    def test_skip_policy_deadletters(self):
        parser = WebtextParser(pan_schema(), on_error="skip", strip_syslog_prefix=False)
        batch = pa.table({"text": ["1,t,s,TRAFFIC,sub,1.2.3.4", "1,t,s,BOGUS,x", ""]})
        out = parser(batch)
        assert out["_error"].to_pylist() == ["", "unknown_log_type", "no_type_at_index_3"]

    def test_include_all_positional_fields(self):
        parser = WebtextParser(pan_schema(), strip_syslog_prefix=False, include_all=True)
        lines = ['1,t,s,TRAFFIC,sub,"a,b",x', "1,t,s,THREAT,spy", ""]
        out = parser(pa.table({"text": lines}))
        got = out["all_fields"].to_pylist()
        assert got[0] == split_csv(lines[0])  # exact quoted split
        assert got[1] == split_csv(lines[1])
        assert got[2] == []  # empty line -> zero fields

    def test_invalid_policy_rejected(self):
        with pytest.raises(ValueError):
            WebtextParser(pan_schema(), on_error="explode")


@pytest.mark.usefixtures("ray_session")
class TestStreamingWindows:
    def test_incremental_actor_windows_match_batch_oracle(self):
        """Stateful keyed window actors over the ordered stream must produce
        exactly the batch (GROUP BY user, hour-bucket) result."""
        import duckdb

        from logparse_rs_ray.pipelines.streaming import streaming_tumbling_counts

        sf = "/root/testdata/sf0.001"
        got = streaming_tumbling_counts(sf).to_pandas()
        want = duckdb.sql(f"""
            SELECT user_id,
                   CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY user_id, window_start_us
        """).fetchdf()
        assert len(got) == len(want)
        for col in ("user_id", "window_start_us", "n_events", "sum_value_cents"):
            assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


@pytest.mark.usefixtures("ray_session")
class TestRuntimeNsEnvelope:
    def test_runtime_ns_emitted_when_timing_enabled(self, tmp_path):
        """Reference lib.rs:153-162 envelope parity: runtime_ns present (as
        the amortized per-row batch parse time) iff record_timing is on."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.ndjson import write_ndjson_sinks

        table = generate_webtext_table(300, seed=42)
        schema = pan_schema()
        parsed = rd.from_arrow(table).map_batches(
            WebtextParser(schema, record_timing=True),
            batch_format="pyarrow", batch_size=None)
        out = str(tmp_path / "nd_t")
        write_ndjson_sinks(parsed, out, schema)
        lines = []
        for f in glob.glob(f"{out}/*/*.json"):
            with open(f) as fh:
                lines += [json.loads(l) for l in fh if l.strip()]
        assert lines
        assert all("runtime_ns" in l and l["runtime_ns"] > 0 for l in lines)

        # and absent without the flag (back-compat shape)
        parsed2 = rd.from_arrow(table).map_batches(
            WebtextParser(schema), batch_format="pyarrow", batch_size=None)
        out2 = str(tmp_path / "nd_n")
        write_ndjson_sinks(parsed2, out2, schema)
        for f in glob.glob(f"{out2}/*/*.json"):
            with open(f) as fh:
                for l in fh:
                    if l.strip():
                        assert "runtime_ns" not in json.loads(l)


@pytest.mark.usefixtures("ray_session")
class TestNdjsonRoundtrip:
    def test_read_back_as_distributed_source(self, tmp_path):
        """parse -> NDJSON sink -> read_ndjson re-ingest: the re-read
        Dataset must hold exactly the written envelopes (count and
        hash64 set), making a prior run's output usable as a source."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import parse_webtext
        from logparse_rs_ray.pipelines.ndjson import write_ndjson_sinks
        from logparse_rs_ray.sources import read_ndjson

        table = generate_webtext_table(500, seed=7)
        schema = pan_schema()
        parsed = parse_webtext(rd.from_arrow(table), schema)
        out = str(tmp_path / "nd")
        write_ndjson_sinks(parsed, out, schema)

        written = []
        for f in glob.glob(f"{out}/**/*.json", recursive=True):
            for line in open(f):
                written.append(json.loads(line)["hash64"])
        # hash64 exceeds 2^53: without the pinned uint64 type, JSON
        # inference reads it as float64 and silently corrupts the hashes
        ds = read_ndjson(glob.glob(f"{out}/**/*.json", recursive=True),
                         column_types={"hash64": pa.uint64()})
        back = ds.to_pandas()
        assert len(back) == len(written) > 0
        assert set(back.hash64) == set(written)
        assert {"parsed", "raw_excerpt", "hash64"} <= set(back.columns)


@pytest.mark.usefixtures("ray_session")
class TestRawLogSource:
    def test_raw_files_equal_parquet_path(self, tmp_path):
        """read_log_lines over raw .log files parses to the SAME records as
        the parquet path — the reference's primary input mode (point the
        engine at log files on disk)."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import parse_webtext
        from logparse_rs_ray.sources import read_log_lines

        table = generate_webtext_table(600, seed=7)
        lines = table["text"].to_pylist()
        # shard the corpus across several raw files (parallel read path)
        logdir = tmp_path / "rawlogs"
        logdir.mkdir()
        for i in range(4):
            with open(logdir / f"part-{i}.log", "w", encoding="utf-8") as fh:
                fh.write("\n".join(lines[i::4]) + "\n")

        schema = pan_schema()
        via_files = parse_webtext(read_log_lines(str(logdir)), schema)
        via_table = parse_webtext(rd.from_arrow(table), schema)

        def hashes(ds):
            import pyarrow.compute as pc

            out = []
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                clean = b.filter(pc.equal(b["_error"], ""))
                out.extend(clean["hash64"].to_pylist())
            return sorted(out)

        a, b = hashes(via_files), hashes(via_table)
        assert len(a) > 0 and a == b

    def test_cli_ndjson_text_format(self, tmp_path):
        """`cli ndjson --format text` over a raw log file writes the same
        envelope set as the parquet input path."""
        from logparse_rs_ray.pipelines.flagship import parse_webtext
        from logparse_rs_ray.pipelines.ndjson import write_ndjson_sinks
        from logparse_rs_ray.sources import read_log_lines

        table = generate_webtext_table(200, seed=11)
        raw = tmp_path / "one.log"
        raw.write_text("\n".join(table["text"].to_pylist()) + "\n",
                       encoding="utf-8")
        schema = pan_schema()
        out = str(tmp_path / "nd_text")
        # same composition the CLI's --format text branch runs (the CLI
        # itself owns ray.init, so tests drive the library composition)
        write_ndjson_sinks(parse_webtext(read_log_lines(str(raw)), schema),
                           out, schema)
        got = set()
        for f in glob.glob(f"{out}/**/*.json", recursive=True):
            for line in open(f):
                got.add(json.loads(line)["hash64"])
        want = set()
        for text in table["text"].to_pylist():
            payload = extract_csv(text)
            fields = split_csv(payload)
            if len(fields) > TYPE_INDEX and fields[TYPE_INDEX] in schema.type_to_fields:
                want.add(fnv1a64(payload))
        assert got == want
