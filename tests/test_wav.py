"""Real RIFF/WAVE PCM codec (core/wav.py) + the AudioDecode actor stage.

The audio counterpart of the PNG codec tests (tests/test_verdict_r05.py
TestPngCodec): round-trip through every supported shape, ValueError on every
malformed-input class (the stub-fallback contract), and end-to-end pipeline
parity against the DuckDB oracle that recomputes decoded-sample statistics
from the synthesis rule.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest


class TestWavCodec:
    def test_roundtrip_shapes_and_rates(self):
        from logparse_rs_ray.core.wav import decode_wav, encode_wav

        rng = np.random.default_rng(11)
        for n, ch in [(1, 1), (7, 1), (16, 2), (64, 2), (5, 3), (0, 1)]:
            for rate in (8000, 16000, 44100):
                s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
                dec, r = decode_wav(encode_wav(s, rate))
                assert r == rate
                assert dec.shape == (n, ch)
                assert np.array_equal(dec, s)

    def test_mono_1d_input(self):
        from logparse_rs_ray.core.wav import decode_wav, encode_wav

        s = np.arange(-5, 5, dtype=np.int16)
        dec, r = decode_wav(encode_wav(s, 8000))
        assert dec.shape == (10, 1) and np.array_equal(dec.ravel(), s)

    def test_unknown_chunks_skipped_word_aligned(self):
        """Spec: unknown chunks are skipped; odd-length bodies are padded."""
        from logparse_rs_ray.core.wav import decode_wav, encode_wav

        s = np.arange(6, dtype=np.int16)
        w = encode_wav(s, 8000)
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
        body = extra + w[12:]
        w2 = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
        dec, r = decode_wav(w2)
        assert r == 8000 and np.array_equal(dec.ravel(), s)

    @pytest.mark.parametrize("mutate", [
        lambda w: b"",                                    # empty
        lambda w: w[:4],                                  # just magic
        lambda w: b"RIFX" + w[4:],                        # bad magic
        lambda w: w[:8] + b"AVI " + w[12:],               # not WAVE
        lambda w: w[:-3],                                 # truncated data chunk
        lambda w: w[:20] + struct.pack("<H", 3) + w[22:],  # float format tag
        lambda w: w[:34] + struct.pack("<H", 8) + w[36:],  # 8-bit depth
        lambda w: w[:22] + struct.pack("<H", 0) + w[24:],  # zero channels
    ])
    def test_malformed_rejected_as_valueerror(self, mutate):
        """Every malformed-input class must raise ValueError (never a raw
        struct error) so actor stages fall back to the stub path."""
        from logparse_rs_ray.core.wav import decode_wav, encode_wav

        w = encode_wav(np.arange(8, dtype=np.int16), 8000)
        with pytest.raises(ValueError):
            decode_wav(mutate(w))

    def test_ragged_pcm_buffer_rejected(self):
        from logparse_rs_ray.core.wav import decode_wav, encode_wav

        w = bytearray(encode_wav(np.arange(5, dtype=np.int16), 8000))
        # stereo claim over a mono-sized buffer -> not a whole frame count
        w[22:24] = struct.pack("<H", 2)
        with pytest.raises(ValueError, match="whole number of frames"):
            decode_wav(bytes(w))


class TestAudioDecodeStage:
    def _mixed_batch(self):
        import pyarrow as pa

        from logparse_rs_ray.core.wav import encode_wav

        mono = (np.arange(10, dtype=np.int16) - 5) * 100
        stereo = np.stack([np.arange(6, dtype=np.int16) * 50,
                           -np.arange(6, dtype=np.int16) * 30], axis=1)
        corrupt = bytearray(encode_wav(mono, 16000))
        corrupt[20] = 3  # float format tag -> decode_wav raises
        payloads = [encode_wav(mono, 8000), b"plain text payload",
                    encode_wav(stereo, 44100), bytes(corrupt)]
        return pa.table({
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }), mono, stereo

    def test_real_and_fallback_rows(self):
        from logparse_rs_ray.pipelines.multimodal import AudioDecode

        batch, mono, stereo = self._mixed_batch()
        out = AudioDecode()(batch).to_pandas()
        # row 0: real mono decode
        assert list(out.loc[0, ["n_samples", "sample_rate", "channels"]]) == \
            [10, 8000, 1]
        assert out.loc[0, "abs_sum"] == int(np.abs(mono.astype(np.int64)).sum())
        assert out.loc[0, "peak"] == int(np.abs(mono.astype(np.int64)).max())
        # row 2: real stereo decode — frames, not flat samples
        assert list(out.loc[2, ["n_samples", "sample_rate", "channels"]]) == \
            [6, 44100, 2]
        assert out.loc[2, "abs_sum"] == int(np.abs(stereo.astype(np.int64)).sum())
        # rows 1 (text) and 3 (corrupt WAV): stub fallback — byte-derived
        # frame count, zero decoded stats
        for i in (1, 3):
            assert out.loc[i, "sample_rate"] == 0
            assert out.loc[i, "abs_sum"] == 0
            assert out.loc[i, "peak"] == 0

    def test_pipeline_matches_duckdb_oracle(self, ray_session, sf_tiny):
        """mm_wav_decode through Ray == the synthesis-rule oracle, column
        for column including the decoded-sample statistics."""
        import duckdb
        import pandas as pd

        from logparse_rs_ray.pipelines.multimodal import (
            MM_WAV_DECODE_SQL, mm_wav_decode)

        got = (mm_wav_decode(sf_tiny).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_tiny}/documents.parquet')")
        want = (con.execute(MM_WAV_DECODE_SQL).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert list(got.columns) == list(want.columns)
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))
