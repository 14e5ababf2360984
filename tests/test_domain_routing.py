"""Domain-keyed routed writes with salted hot keys (north-rule skew gate)."""

import glob
from collections import Counter

import pyarrow.dataset as pads
import pytest

from logparse_rs_ray.webtext import _HOT_DOMAINS, generate_webtext_table


@pytest.mark.usefixtures("ray_session")
class TestDomainRouting:
    def test_per_domain_sinks_with_salted_hot_keys(self, tmp_path):
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import enrich_webtext, parse_webtext
        from logparse_rs_ray.stages.route import add_sink_column

        table = generate_webtext_table(4000, seed=42)
        parsed = parse_webtext(rd.from_arrow(table))
        enriched = enrich_webtext(parsed)
        routed = enriched.map_batches(
            lambda b: add_sink_column(b, key_col="domain",
                                      hot_keys=list(_HOT_DOMAINS), num_salts=8),
            batch_format="pyarrow", batch_size=None,
        )
        out = str(tmp_path / "by_domain")
        routed.write_parquet(out, partition_cols=["sink", "salt"])

        # oracle: per-domain clean-row counts
        want = Counter()
        urls = table["url"].to_pylist()
        texts = table["text"].to_pylist()
        from .oracle import extract_csv
        from logparse_rs_ray.core.tokenize import split_csv
        from logparse_rs_ray.core.schema import TYPE_INDEX
        from logparse_rs_ray.webtext import pan_schema

        schema = pan_schema()
        for url, text in zip(urls, texts):
            fields = split_csv(extract_csv(text))
            if len(fields) > TYPE_INDEX and fields[TYPE_INDEX] in schema.type_to_fields:
                want[url.split("/")[2]] += 1

        got = Counter()
        salt_dirs_per_sink: dict[str, int] = {}
        for d in glob.glob(f"{out}/sink=*"):
            sink = d.rsplit("=", 1)[1]
            if sink == "_deadletter":
                continue
            salts = glob.glob(f"{d}/salt=*")
            salt_dirs_per_sink[sink] = len(salts)
            got[sink] = pads.dataset(d).count_rows()
        assert got == want

        # hot domains split across many salt sub-partitions; cold ones don't
        for hot in _HOT_DOMAINS:
            assert salt_dirs_per_sink[hot] == 8, hot
        cold = [s for s in salt_dirs_per_sink if s not in _HOT_DOMAINS]
        assert cold and all(salt_dirs_per_sink[c] == 1 for c in cold)

    def test_project_per_sink_narrow_files(self, tmp_path):
        """route_write(project_per_sink=True): each sink directory carries
        only that type's columns (narrow files for downstream readers)."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import enrich_webtext, parse_webtext
        from logparse_rs_ray.stages.route import route_write
        from logparse_rs_ray.webtext import pan_schema

        schema = pan_schema()
        table = generate_webtext_table(800, seed=42)
        enriched = enrich_webtext(parse_webtext(rd.from_arrow(table)))
        out = str(tmp_path / "pps")
        route_write(enriched, out, schema, project_per_sink=True)

        t = pads.dataset(f"{out}/sink=SYSTEM").to_table()
        cols = set(t.column_names)
        assert set(schema.type_to_columns["SYSTEM"]) <= cols
        # TRAFFIC-only columns must be absent from the SYSTEM sink
        assert "src_port" not in cols and "application" not in cols
        assert {"url", "hash64", "extracted_text"} <= cols


@pytest.mark.usefixtures("ray_session")
class TestRunFlagshipDomainRouted:
    def test_domain_variant_matches_type_variant_report(self, tmp_path):
        """run_flagship(route_key="domain", hot_keys=...) — the north-star
        fan-out shape (VERDICT r01 item 8): same report + integrity table as
        the log_type-routed run, plus salted hot-domain sub-partitions."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import run_flagship

        table = generate_webtext_table(3000, seed=7)
        r_type = run_flagship(rd.from_arrow(table), str(tmp_path / "bytype"),
                              generated_at="T0")
        r_dom = run_flagship(rd.from_arrow(table), str(tmp_path / "bydomain"),
                             generated_at="T0", route_key="domain",
                             hot_keys=list(_HOT_DOMAINS), num_salts=4)
        # report content is routing-invariant (partials ride the write)
        assert r_dom == r_type

        # integrity tables byte-identical (glob explicitly: the _integrityNN
        # file names start with "_", which pads.dataset directory discovery
        # skips by default)
        t1 = pads.dataset(glob.glob(str(tmp_path / "bytype" / "integrity" / "*.parquet"))).to_table()
        t2 = pads.dataset(glob.glob(str(tmp_path / "bydomain" / "integrity" / "*.parquet"))).to_table()
        key = [("field", "ascending"), ("original", "ascending")]
        assert t1.sort_by(key).equals(t2.sort_by(key))

        # hot domains fan out across salt sub-dirs; integrity side sinks
        # kept their buckets despite domain routing
        for hot in _HOT_DOMAINS:
            salts = glob.glob(str(tmp_path / "bydomain" / "sinks" / f"sink={hot}" / "salt=*"))
            assert len(salts) == 4, hot
        ibuckets = glob.glob(str(tmp_path / "bydomain" / "sinks" / "sink=_integrity[0-9][0-9]"))
        assert ibuckets
