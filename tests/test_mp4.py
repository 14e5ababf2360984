"""Real ISO-BMFF container walker (core/mp4.py) + the VideoProbe actor stage.

The video counterpart of the PNG/WAV codec tests: round-trip through both
mvhd header widths and multi-track sample tables, spec box variants the
encoder never emits (largesize, to-end, fixed-size stsz), ValueError on
every malformed-input class (the stub-fallback contract), and end-to-end
pipeline parity against the DuckDB oracle.
"""

from __future__ import annotations

import struct

import pytest


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


class TestMp4Walker:
    def test_roundtrip_v0_v1_multitrack(self):
        from logparse_rs_ray.core.mp4 import encode_mp4, probe_mp4

        for ver in (0, 1):
            m = probe_mp4(encode_mp4(timescale=600, duration=4321,
                                     sample_sizes=[[10, 20, 30], [5], []],
                                     brand=b"mp42", mvhd_version=ver))
            assert m == {"brand": "mp42", "timescale": 600,
                         "duration": 4321, "n_tracks": 3, "n_samples": 4,
                         "media_bytes": 65}

    def test_64bit_duration_v1(self):
        from logparse_rs_ray.core.mp4 import encode_mp4, probe_mp4

        m = probe_mp4(encode_mp4(timescale=90000, duration=2**33,
                                 sample_sizes=[[7]], mvhd_version=1))
        assert m["duration"] == 2**33

    def test_largesize_box(self):
        """size==1 + 64-bit largesize — valid per spec, encoder never
        emits it."""
        from logparse_rs_ray.core.mp4 import encode_mp4, probe_mp4

        base = encode_mp4(timescale=600, duration=10, sample_sizes=[[1, 2]])
        # rewrite the trailing plain mdat box as a largesize box
        assert base.endswith(_box(b"mdat", b""))
        large = (base[:-8] + struct.pack(">I", 1) + b"mdat"
                 + struct.pack(">Q", 16))
        assert probe_mp4(large)["n_samples"] == 2

    def test_to_end_box(self):
        """size==0 extends to the end of the enclosing scope."""
        from logparse_rs_ray.core.mp4 import encode_mp4, probe_mp4

        base = encode_mp4(timescale=600, duration=10, sample_sizes=[[9]])
        assert base.endswith(_box(b"mdat", b""))
        to_end = base[:-8] + struct.pack(">I", 0) + b"mdat" + b"payload!"
        assert probe_mp4(to_end)["media_bytes"] == 9

    def test_fixed_size_stsz(self):
        """stsz with a nonzero fixed sample_size carries no table."""
        from logparse_rs_ray.core.mp4 import probe_mp4

        mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 600, 99)
                    + b"\x00" * 80)
        stsz = _box(b"stsz", struct.pack(">B3xII", 0, 50, 4))  # 4 x 50 bytes
        trak = _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stsz))))
        data = (_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
                + _box(b"moov", mvhd + trak))
        m = probe_mp4(data)
        assert m["n_samples"] == 4 and m["media_bytes"] == 200

    def test_trak_without_sample_table_skipped(self):
        from logparse_rs_ray.core.mp4 import probe_mp4

        mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 600, 99)
                    + b"\x00" * 80)
        bare_trak = _box(b"trak", _box(b"tkhd", b"\x00" * 84))
        data = (_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
                + _box(b"moov", mvhd + bare_trak))
        m = probe_mp4(data)
        assert m["n_tracks"] == 1 and m["n_samples"] == 0

    @pytest.mark.parametrize("mutate", [
        lambda m: b"",                                     # empty
        lambda m: m[:6],                                   # mid-header
        lambda m: m[:4] + b"junk" + m[8:],                 # no ftyp magic
        lambda m: m[:-40],                                 # truncated moov
        lambda m: struct.pack(">I", 3) + m[4:],            # size < 8
        lambda m: struct.pack(">I", len(m) + 50) + m[4:],  # lying size
    ])
    def test_malformed_rejected_as_valueerror(self, mutate):
        from logparse_rs_ray.core.mp4 import encode_mp4, probe_mp4

        m = encode_mp4(timescale=600, duration=10, sample_sizes=[[1]])
        with pytest.raises(ValueError):
            probe_mp4(mutate(m))

    def test_truncated_stsz_table_rejected(self):
        from logparse_rs_ray.core.mp4 import probe_mp4

        mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 600, 99)
                    + b"\x00" * 80)
        # claims 9 samples, table holds 1
        stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, 9)
                    + struct.pack(">I", 5))
        trak = _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stsz))))
        data = (_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
                + _box(b"moov", mvhd + trak))
        with pytest.raises(ValueError, match="truncated stsz"):
            probe_mp4(data)

    def test_missing_moov_or_mvhd_rejected(self):
        from logparse_rs_ray.core.mp4 import probe_mp4

        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
        with pytest.raises(ValueError, match="missing moov"):
            probe_mp4(ftyp + _box(b"mdat", b""))
        with pytest.raises(ValueError, match="missing mvhd"):
            probe_mp4(ftyp + _box(b"moov", _box(b"trak", b"")))


class TestVideoProbeStage:
    def test_real_and_fallback_rows(self):
        import pyarrow as pa

        from logparse_rs_ray.core.mp4 import encode_mp4
        from logparse_rs_ray.pipelines.multimodal import VideoProbe

        good = encode_mp4(timescale=600, duration=77,
                          sample_sizes=[[10, 20]], brand=b"mp42")
        corrupt = good[:-10]  # truncated mdat -> probe raises
        batch = pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "payload": pa.array([good, b"plain text longer than 12b",
                                 corrupt], type=pa.binary()),
        })
        out = VideoProbe()(batch).to_pandas()
        assert out.loc[0, "brand"] == "mp42"
        assert list(out.loc[0, ["timescale", "duration", "n_tracks",
                                "n_samples", "media_bytes"]]) == \
            [600, 77, 1, 2, 30]
        # row 1: non-MP4 -> stub; row 2: magic matches but walk fails -> stub
        for i in (1, 2):
            assert out.loc[i, "brand"] == "unknown"
            assert out.loc[i, "media_bytes"] == 0

    def test_pipeline_matches_duckdb_oracle(self, ray_session, sf_tiny):
        import duckdb
        import pandas as pd

        from logparse_rs_ray.pipelines.multimodal import (
            MM_MP4_PROBE_SQL, mm_mp4_probe)

        got = (mm_mp4_probe(sf_tiny).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_tiny}/documents.parquet')")
        want = (con.execute(MM_MP4_PROBE_SQL).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert list(got.columns) == list(want.columns)
        assert got["brand"].tolist() == want["brand"].tolist()
        num = [c for c in got.columns if c != "brand"]
        pd.testing.assert_frame_equal(got[num].astype("int64"),
                                      want[num].astype("int64"))


class TestMixedMediaProbe:
    """One dispatch stage routing a mixed corpus through all three real
    parsers (the decode tier of a mixed crawl)."""

    def test_routes_and_fallback(self):
        import numpy as np
        import pyarrow as pa

        from logparse_rs_ray.core.mp4 import encode_mp4
        from logparse_rs_ray.core.png import encode_png
        from logparse_rs_ray.core.wav import encode_wav
        from logparse_rs_ray.pipelines.multimodal import MixedMediaProbe

        img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        pcm = (np.arange(8, dtype=np.int16) - 4) * 100
        mp4 = encode_mp4(timescale=600, duration=9, sample_sizes=[[3, 4]])
        corrupt_png = bytearray(encode_png(img))
        corrupt_png[30] ^= 0xFF
        batch = pa.table({
            "doc_id": pa.array(list(range(5)), type=pa.int64()),
            "payload": pa.array([encode_png(img), encode_wav(pcm, 8000),
                                 mp4, b"opaque text payload",
                                 bytes(corrupt_png)], type=pa.binary()),
        })
        out = MixedMediaProbe()(batch).to_pandas()
        assert out["modality"].tolist() == \
            ["image", "audio", "video", "unknown", "unknown"]
        assert out.loc[0, "n_units"] == img.size
        assert out.loc[0, "checksum"] == int(img.sum(dtype=np.int64))
        assert out.loc[1, "n_units"] == 8
        assert out.loc[1, "checksum"] == int(np.abs(pcm.astype(np.int64)).sum())
        assert out.loc[2, "n_units"] == 2 and out.loc[2, "checksum"] == 7
        assert out.loc[3, "checksum"] == 0 and out.loc[4, "checksum"] == 0

    def test_pipeline_matches_duckdb_oracle(self, ray_session, sf_tiny):
        import duckdb
        import pandas as pd

        from logparse_rs_ray.pipelines.multimodal import (
            MM_MIXED_DECODE_SQL, mm_mixed_decode)

        got = (mm_mixed_decode(sf_tiny).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_tiny}/documents.parquet')")
        want = (con.execute(MM_MIXED_DECODE_SQL).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert list(got.columns) == list(want.columns)
        assert got["modality"].tolist() == want["modality"].tolist()
        num = ["doc_id", "n_units", "checksum"]
        pd.testing.assert_frame_equal(got[num].astype("int64"),
                                      want[num].astype("int64"))
        assert set(got["modality"]) == {"image", "audio", "video"}
