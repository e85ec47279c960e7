"""FLAC codec: lossless round-trips across subframe types, stereo
decorrelation modes, Rice coding, CRC/MD5 integrity, budgets, probe
mirroring, mutation fuzz (r9).

Pure-Python tests — no Spark session. FLAC is lossless, so
``decode(encode(x)).samples == x`` must hold EXACTLY for every
encoder configuration; the encoder arms STREAMINFO's MD5, so the
decoder's own bit-exactness check runs on every test too.
"""

from __future__ import annotations

import random
import struct
from array import array

import pytest

from sqlbackuphistoryetl_spark.extensions.flac_codec import (
    FLACError,
    UnsupportedFLAC,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
    is_flac,
    probe_flac,
)
from sqlbackuphistoryetl_spark.extensions.wav_codec import DecodedAudio


def _tone(n, ch=1, amp=1000, seed=None):
    if seed is not None:
        rng = random.Random(seed)
        return DecodedAudio(16000, ch, [rng.randrange(-amp, amp) for _ in range(n * ch)])
    # smooth ramp: friendly to the fixed predictor
    return DecodedAudio(
        16000, ch, [((i * 7) % (2 * amp)) - amp for i in range(n * ch)]
    )


class TestRoundTrip:
    @pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed1", "fixed2"])
    def test_subframe_types_exact(self, kind):
        a = (
            DecodedAudio(16000, 1, [123] * 600)
            if kind == "constant"
            else _tone(600)
        )
        blob = encode_flac(a, subframe=kind)
        assert is_flac(blob) and probe_flac(blob)
        out = decode_flac(blob)
        assert (out.sample_rate, out.channels) == (16000, 1)
        assert list(out.samples) == list(a.samples)

    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_modes_exact(self, mode):
        a = _tone(500, ch=2, seed=11)
        out = decode_flac(encode_flac(a, stereo_mode=mode))
        assert out.channels == 2
        assert list(out.samples) == list(a.samples)

    def test_8bit_scales_to_int16(self):
        a = DecodedAudio(8000, 1, [i - 64 for i in range(128)])
        out = decode_flac(encode_flac(a, bits_per_sample=8))
        assert list(out.samples) == [(i - 64) << 8 for i in range(128)]

    def test_multi_frame_and_ragged_tail(self):
        a = _tone(2500, seed=3)  # 1024-blocks: 1024+1024+452
        out = decode_flac(encode_flac(a, block_size=1024))
        assert list(out.samples) == list(a.samples)

    def test_property_random_streams(self):
        rng = random.Random(42)
        for trial in range(25):
            n = rng.randrange(4, 700)
            ch = rng.choice([1, 2])
            mode = (
                rng.choice(["independent", "left_side", "right_side", "mid_side"])
                if ch == 2
                else "independent"
            )
            kind = rng.choice([None, "verbatim", "fixed1", "fixed2"])
            a = _tone(n, ch=ch, amp=rng.choice([5, 300, 30000]), seed=trial)
            out = decode_flac(
                encode_flac(a, block_size=rng.choice([256, 1024]),
                            stereo_mode=mode, subframe=kind)
            )
            assert list(out.samples) == list(a.samples), (trial, mode, kind)

    def test_rice_handles_adversarial_residuals(self):
        # alternate extremes: the fixed-2 residuals blow up, stressing
        # high Rice quotients and the parameter search
        vals = [(-30000) if i % 2 else 30000 for i in range(300)]
        a = DecodedAudio(16000, 1, vals)
        out = decode_flac(encode_flac(a, subframe="fixed2"))
        assert list(out.samples) == vals


class TestIntegrity:
    def test_md5_mismatch_detected(self):
        blob = bytearray(encode_flac(_tone(300)))
        # corrupt one MD5 byte inside STREAMINFO (offset: 4 marker +
        # 4 header + 18 fixed fields)
        blob[4 + 4 + 18] ^= 0xFF
        with pytest.raises(FLACError, match="MD5"):
            decode_flac(bytes(blob))

    def test_frame_crc16_detects_payload_flip(self):
        base = encode_flac(_tone(300))
        # find the first frame sync and flip a byte well inside the frame
        sync_at = base.index(b"\xff\xf8", 8)
        blob = bytearray(base)
        blob[sync_at + 12] ^= 0x01
        with pytest.raises(FLACError):
            decode_flac(bytes(blob))

    def test_header_crc8_detects_header_flip(self):
        base = encode_flac(_tone(300))
        sync_at = base.index(b"\xff\xf8", 8)
        blob = bytearray(base)
        blob[sync_at + 2] ^= 0x04  # inside the frame header
        with pytest.raises(FLACError):
            decode_flac(bytes(blob))

    def test_crc_reference_values(self):
        # spot-pin the generators against hand-checked vectors so a
        # table-generation bug can't cancel out in round-trips
        assert _crc8(b"") == 0
        assert _crc8(b"\x00") == 0
        assert _crc8(b"\x01") == 0x07
        assert _crc16(b"\x01") == 0x8005


class TestGatesAndCorrupt:
    def test_budget_gate_and_probe_mirror(self):
        blob = bytearray(encode_flac(_tone(100)))
        # inflate the declared total-samples field (low 36 bits of the
        # packed STREAMINFO word at offset 8+10)
        packed = int.from_bytes(blob[18:26], "big")
        packed |= (1 << 36) - 1
        blob[18:26] = packed.to_bytes(8, "big")
        with pytest.raises(UnsupportedFLAC, match="budget"):
            decode_flac(bytes(blob))
        assert not probe_flac(bytes(blob))
        assert probe_flac(encode_flac(_tone(100)))

    @pytest.mark.parametrize(
        "mangle",
        [
            lambda b: b[:3],                                  # truncated marker
            lambda b: b"fLaX" + b[4:],                        # bad marker
            lambda b: b[:20],                                 # truncated streaminfo
            lambda b: b[:4] + b"\x81\x00\x00\x04" + b[8:],    # first block not streaminfo
        ],
    )
    def test_corrupt_structures(self, mangle):
        bad = mangle(encode_flac(_tone(50)))
        with pytest.raises(FLACError):
            decode_flac(bad)
        assert not probe_flac(bad)

    def test_zero_sample_rate_rejected(self):
        blob = bytearray(encode_flac(_tone(50)))
        packed = int.from_bytes(blob[18:26], "big")
        packed &= (1 << 44) - 1  # zero the 20-bit sample rate
        blob[18:26] = packed.to_bytes(8, "big")
        with pytest.raises(FLACError, match="sample rate"):
            decode_flac(bytes(blob))

    def test_truncated_frames_raise(self):
        base = encode_flac(_tone(400))
        for cut in range(46, len(base), 7):  # past the metadata chain
            with pytest.raises(FLACError):
                decode_flac(base[:cut])

    def test_non_flac_probe(self):
        assert not is_flac(None) and not probe_flac(None)
        assert not probe_flac(b"RIFF....WAVE")


class TestFuzz:
    def test_mutation_corpus_never_hangs_or_escapes(self):
        rng = random.Random(99)
        base = encode_flac(_tone(300, ch=2, seed=1), stereo_mode="mid_side")
        for trial in range(300):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            if rng.random() < 0.3:
                buf = buf[: rng.randrange(1, len(buf))]
            self._decode_with_deadline(bytes(buf), trial)

    @staticmethod
    def _decode_with_deadline(payload: bytes, tag) -> None:
        import signal

        def _alarm(_sig, _frm):
            raise AssertionError(f"flac decode hung on trial {tag!r}")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(5)
        try:
            decode_flac(payload)
        except (FLACError, UnsupportedFLAC):
            pass
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def test_encoder_rejects_bad_input(self):
        with pytest.raises(ValueError, match="bits"):
            encode_flac(_tone(10), bits_per_sample=12)
        with pytest.raises(ValueError, match="fit"):
            encode_flac(DecodedAudio(8000, 1, [300]), bits_per_sample=8)
        with pytest.raises(ValueError, match="2 channels"):
            encode_flac(_tone(10, ch=1), stereo_mode="mid_side")


class TestSparkRouting:
    def test_audio_fingerprint_and_metadata_route_flac(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            audio_fingerprint,
            decode_audio,
            extract_payload_metadata,
        )
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_wav,
            energy_fingerprint,
        )

        a = _tone(400, ch=2, seed=5)
        flac = encode_flac(a, stereo_mode="left_side")
        wav = encode_wav(a)
        corrupt = flac[:40]  # valid marker, truncated metadata
        rows = [
            (1, flac, "audio/flac"),
            (2, wav, "audio/wav"),
            (3, corrupt, "audio/flac"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
        fp = {r["doc_id"]: r for r in audio_fingerprint(df).collect()}
        assert fp[1]["decoder"] == "flac" and fp[2]["decoder"] == "wav-pcm"
        assert fp[1]["sample_rate"] == 16000 and fp[1]["channels"] == 2
        # lossless: the FLAC and WAV fingerprints of the same audio agree
        assert fp[1]["afp"] == fp[2]["afp"]
        want = energy_fingerprint(decode_audio(flac))
        if want >= 1 << 63:
            want -= 1 << 64
        assert fp[1]["afp"] == want
        assert fp[3]["afp"] is None and fp[3]["decoder"] is None

        meta = {r["doc_id"]: r["decode_status"]
                for r in extract_payload_metadata(df).collect()}
        assert meta == {1: "ok", 2: "ok", 3: "stubbed"}
