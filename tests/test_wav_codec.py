"""Stdlib WAV/PCM codec + audio fingerprint (round 7) — hand-built
RIFF fixtures (independent of the module's own encoder), depth/channel
handling, bomb guard, and the Arrow fingerprint + banded near-dup path."""

from __future__ import annotations

import math
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions.multimodal import (
    audio_fingerprint,
    audio_near_dup,
    decode_audio,
)
from sqlbackuphistoryetl_spark.extensions.wav_codec import (
    DecodedAudio,
    UnsupportedWAV,
    WAVError,
    block_features,
    decode_wav,
    encode_wav,
    energy_fingerprint,
    is_wav,
    probe_wav,
    to_mono,
)


def _wav(data: bytes, channels=1, rate=8000, bits=16, audio_format=1) -> bytes:
    """Hand-assembled RIFF/WAVE, independent of encode_wav."""
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _tone(freq, n, rate=8000, amp=10000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


class TestDecode:
    def test_pcm16_hand_fixture(self):
        samples = [0, 1000, -1000, 32767, -32768]
        a = decode_wav(_wav(struct.pack("<5h", *samples)))
        assert (a.sample_rate, a.channels) == (8000, 1)
        # decode returns a compact array('h'), value-equal to the list
        assert list(a.samples) == samples

    def test_pcm8_rescales_to_int16_range(self):
        a = decode_wav(_wav(bytes([128, 255, 0]), bits=8))
        assert list(a.samples) == [0, 127 * 256, -128 * 256]

    def test_stereo_and_to_mono(self):
        inter = [100, 200, -100, -200]  # L R L R
        a = decode_wav(_wav(struct.pack("<4h", *inter), channels=2))
        assert a.channels == 2
        m = to_mono(a)
        assert m.channels == 1 and list(m.samples) == [150, -150]

    def test_roundtrip_through_encoder(self):
        src = DecodedAudio(44_100, 2, _tone(440, 2000) + _tone(880, 2000))
        back = decode_wav(encode_wav(src))
        assert (back.sample_rate, back.channels) == (44_100, 2)
        assert list(back.samples) == list(src.samples)

    def test_malformed_and_unsupported(self):
        with pytest.raises(WAVError):
            decode_wav(b"not audio at all")
        with pytest.raises(UnsupportedWAV):  # float PCM (format 3)
            decode_wav(_wav(b"\x00" * 8, audio_format=3))
        with pytest.raises(UnsupportedWAV):  # 24-bit
            decode_wav(_wav(b"\x00" * 6, bits=24))
        assert not is_wav(None) and not is_wav(b"RIFFxxxx")

    def test_odd_length_16bit_data_chunk_raises(self):
        # r7 advice: a 16-bit data chunk with an odd byte length has no
        # valid final sample — strict doctrine raises, never truncates
        with pytest.raises(WAVError, match="odd-length"):
            decode_wav(_wav(struct.pack("<2h", 7, -7) + b"\x01"))

    def test_probe_wav_mirrors_decode(self):
        good = _wav(struct.pack("<4h", 1, 2, 3, 4))
        assert probe_wav(good) and decode_wav(good)
        for bad in (
            None,
            b"RIFFxxxx",
            _wav(b"\x00" * 8, audio_format=3),     # float PCM
            _wav(b"\x00" * 6, bits=24),            # unsupported depth
            _wav(struct.pack("<2h", 7, -7) + b"\x01"),  # odd 16-bit
            good[:-3],                              # truncated chunk
        ):
            assert not probe_wav(bad)
            if bad is not None and bad != b"RIFFxxxx":
                with pytest.raises((WAVError, UnsupportedWAV)):
                    decode_wav(bad)
        assert not probe_wav(good, max_samples=2)  # budget mirrored

    def test_declared_size_bomb_guard(self):
        import time

        big = _wav(struct.pack("<4h", 1, 2, 3, 4))
        t0 = time.perf_counter()
        with pytest.raises(UnsupportedWAV, match="budget"):
            decode_wav(big, max_samples=2)
        assert time.perf_counter() - t0 < 1.0


class TestFeaturesAndFingerprint:
    def test_block_features_hand_math(self):
        a = DecodedAudio(8000, 1, [100, -100, 100, -100, 0, 0, 0, 0])
        feats = block_features(a, n_blocks=2)
        # block 1: mean|x| = 100, 3 sign crossings (0 counts as >= 0)
        assert feats[0] == (100, 3)
        # crossings are counted WITHIN a block only; the -100 -> 0
        # transition sits on the block boundary and belongs to neither
        assert feats[1] == (0, 0)

    def test_fingerprint_locality(self):
        base = _tone(440, 8000) + _tone(880, 8000) + _tone(220, 8000)
        a = DecodedAudio(8000, 1, base)
        # same content, uniformly scaled volume -> identical fingerprint
        scaled = DecodedAudio(8000, 1, [x // 2 for x in base])
        assert energy_fingerprint(a) == energy_fingerprint(scaled)
        # different content -> many differing bits
        other = DecodedAudio(8000, 1, _tone(100, 24000))
        ham = bin(energy_fingerprint(a) ^ energy_fingerprint(other)).count("1")
        assert ham > 8

    def test_empty_audio_is_deterministic(self):
        a = DecodedAudio(8000, 1, [])
        assert energy_fingerprint(a) == 0
        assert block_features(a, 4) == [(0, 0)] * 4


class TestSparkAudioPath:
    def test_fingerprint_and_near_dup(self, spark):
        base = _tone(440, 4000) + _tone(880, 4000)
        wav_a = _wav(struct.pack(f"<{len(base)}h", *base))
        half = [x // 2 for x in base]
        wav_b = _wav(struct.pack(f"<{len(half)}h", *half))  # volume-scaled dup
        other = _tone(55, 8000)
        wav_c = _wav(struct.pack(f"<{len(other)}h", *other))
        df = spark.createDataFrame(
            [
                (1, bytearray(wav_a)),
                (2, bytearray(wav_b)),
                (3, bytearray(wav_c)),
                (4, bytearray(b"not audio")),
            ],
            "doc_id long, payload binary",
        )
        fps = audio_fingerprint(df)
        got = {r["doc_id"]: r for r in fps.collect()}
        assert got[1]["decoder"] == "wav-pcm" and got[1]["sample_rate"] == 8000
        assert got[1]["afp"] == got[2]["afp"]  # scale-invariant
        assert got[4]["afp"] is None
        pairs = sorted(
            (r["id_a"], r["id_b"])
            for r in audio_near_dup(fps, max_hamming=3, hash_col="afp").collect()
        )
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_metadata_status_ok_for_decodable_wav(self, spark):
        # r7 advice: decode_status's contract is "a real decoder
        # exists" — decodable PCM WAV must report 'ok', not 'stubbed'
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            extract_payload_metadata,
        )

        df = spark.createDataFrame(
            [
                (1, bytearray(_wav(struct.pack("<4h", 1, 2, 3, 4))), "audio/wav"),
                (2, bytearray(_wav(b"\x00" * 8, audio_format=3)), "audio/wav"),
                (3, bytearray(b"\xff\xfb mp3 frame"), "audio/mpeg"),
            ],
            "doc_id long, payload binary, content_type string",
        )
        got = {
            r["doc_id"]: r["decode_status"]
            for r in extract_payload_metadata(df).collect()
        }
        assert got == {1: "ok", 2: "stubbed", 3: "stubbed"}

    def test_decode_audio_gate(self):
        a = decode_audio(_wav(struct.pack("<2h", 5, -5)))
        assert list(a.samples) == [5, -5]
        with pytest.raises(NotImplementedError):
            decode_audio(b"\xff\xfb mp3 frame")


class TestG711:
    def test_tables_match_cpython_audioop(self):
        # independent oracle: CPython's C implementation of G.711
        # (audioop ships through 3.12; skip if the runtime dropped it)
        audioop = pytest.importorskip("audioop")
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            ALAW_TABLE,
            ULAW_TABLE,
        )

        u_ref = list(struct.unpack("<256h", audioop.ulaw2lin(bytes(range(256)), 2)))
        a_ref = list(struct.unpack("<256h", audioop.alaw2lin(bytes(range(256)), 2)))
        assert ULAW_TABLE == u_ref
        assert ALAW_TABLE == a_ref

    def test_decode_roundtrip_both_laws(self):
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            ALAW_TABLE,
            ULAW_TABLE,
            encode_g711_wav,
        )

        data = bytes(range(0, 256, 2))
        for law, table in (("ulaw", ULAW_TABLE), ("alaw", ALAW_TABLE)):
            blob = encode_g711_wav(data, 16000, 1, law=law)
            assert probe_wav(blob), law
            a = decode_wav(blob)
            assert (a.sample_rate, a.channels) == (16000, 1)
            assert list(a.samples) == [table[b] for b in data], law

    def test_g711_guards(self):
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_g711_wav,
        )

        with pytest.raises(ValueError):
            encode_g711_wav(b"\x00", law="gsm")
        blob = bytearray(encode_g711_wav(bytes(64)))
        # forge bits=16 into the fmt chunk: G.711 must be 8-bit
        i = blob.find(b"fmt ") + 8
        blob[i + 14 : i + 16] = struct.pack("<H", 16)
        with pytest.raises(WAVError, match="8-bit"):
            decode_wav(bytes(blob))
        assert not probe_wav(bytes(blob))
        # budget applies to companded bytes too
        with pytest.raises(UnsupportedWAV, match="budget"):
            decode_wav(encode_g711_wav(bytes(64)), max_samples=4)

    def test_mulaw_flows_through_multimodal(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            extract_payload_metadata,
        )
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_g711_wav,
        )

        blob = encode_g711_wav(bytes(range(128)))
        df = spark.createDataFrame(
            [(1, bytearray(blob), "audio/basic")],
            "doc_id long, payload binary, content_type string",
        )
        got = extract_payload_metadata(df).first()
        assert got["decode_status"] == "ok"  # real decoder exists
        a = decode_audio(blob)
        assert len(a.samples) == 128


class TestIMAADPCM:
    def test_decode_matches_cpython_audioop(self):
        # audioop implements the same Intel/DVI algorithm but packs
        # HIGH nibble first; WAV is low-first, so swap per byte
        audioop = pytest.importorskip("audioop")
        import random

        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_ima_adpcm_wav,
        )

        rng = random.Random(5)
        data = bytes(rng.randrange(256) for _ in range(64))
        a = decode_wav(encode_ima_adpcm_wav(data))
        assert len(a.samples) == 129 and a.samples[0] == 0
        swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in data)
        ref, _ = audioop.adpcm2lin(swapped, 2, (0, 0))
        assert list(a.samples)[1:] == list(
            struct.unpack(f"<{len(ref) // 2}h", ref)
        )

    def test_initial_state_rides_the_block_header(self):
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_ima_adpcm_wav,
            ima_adpcm_step,
        )

        data = bytes(range(32))
        a = decode_wav(encode_ima_adpcm_wav(data, predictor=-1234, step_index=40))
        assert a.samples[0] == -1234
        pred, idx = -1234, 40
        for b in data:
            for nib in (b & 15, b >> 4):
                pred, idx = ima_adpcm_step(pred, idx, nib)
        assert a.samples[-1] == pred

    def test_clamps_and_guards(self):
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_ima_adpcm_wav,
            ima_adpcm_step,
        )

        # predictor clamps at the int16 rails
        pred, idx = 32700, 88
        pred, _ = ima_adpcm_step(pred, idx, 0x7)  # big positive delta
        assert pred == 32767
        pred, _ = ima_adpcm_step(-32700, 88, 0xF)  # big negative
        assert pred == -32768
        with pytest.raises(ValueError):
            encode_ima_adpcm_wav(b"", step_index=89)
        # forged out-of-range step index in the block header
        blob = bytearray(encode_ima_adpcm_wav(bytes(8)))
        i = blob.find(b"data") + 8
        blob[i + 2] = 99
        with pytest.raises(WAVError, match="step index"):
            decode_wav(bytes(blob))
        assert not probe_wav(bytes(blob))
        # truncated block (header shorter than 4 bytes)
        short = bytearray(encode_ima_adpcm_wav(bytes(8)))
        j = short.find(b"data")
        short[j + 4 : j + 8] = struct.pack("<I", 3)
        with pytest.raises(WAVError, match="truncated"):
            decode_wav(bytes(short[: j + 8 + 3]))

    def test_probe_mirrors_decode(self):
        from sqlbackuphistoryetl_spark.extensions.wav_codec import (
            encode_ima_adpcm_wav,
        )

        good = encode_ima_adpcm_wav(bytes(range(16)))
        assert probe_wav(good) and decode_wav(good)
        assert not probe_wav(good, max_samples=8)  # budget mirrored


class TestPerceptualAudioDoctrine:
    """MP3/AAC/Opus stay permanently gated (PLANS.md r9 doctrine, the
    WebP call's audio twin): every magic-byte family must route to
    the stub path — probe False, decode_audio raising, metadata
    'stubbed', fingerprint NULL — never into the PCM decoder.
    (FLAC left this list mid-r9: it is LOSSLESS, not perceptual, and
    now decodes for real through extensions/flac_codec.py.)"""

    PAYLOADS = {
        "mp3-id3v2": b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 64,
        "mp3-framesync": b"\xff\xfb\x90\x64" + b"\x55" * 64,
        "aac-adts": b"\xff\xf1\x50\x80\x02\x1f\xfc" + b"\xaa" * 64,
        "m4a-ftyp": struct.pack(">I", 32) + b"ftypM4A " + b"\x00" * 56,
        "ogg-opus": b"OggS\x00\x02" + b"\x00" * 64,
    }

    def test_magic_bytes_probe_false(self):
        for name, payload in self.PAYLOADS.items():
            assert not is_wav(payload), name
            assert not probe_wav(payload), name

    def test_decode_audio_raises_stub_gate(self):
        for name, payload in self.PAYLOADS.items():
            with pytest.raises(NotImplementedError, match="stub"):
                decode_audio(payload)

    def test_metadata_and_fingerprint_flag_not_poison(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            extract_payload_metadata,
        )

        rows = [
            (i, bytearray(p), "audio/mpeg")
            for i, p in enumerate(self.PAYLOADS.values())
        ]
        rows.append((99, bytearray(_wav(struct.pack("<2h", 7, -7))),
                     "audio/wav"))
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, content_type string"
        )
        meta = {r["doc_id"]: r["decode_status"]
                for r in extract_payload_metadata(df).collect()}
        assert meta[99] == "ok"
        assert all(v == "stubbed" for k, v in meta.items() if k != 99)
        fps = {r["doc_id"]: r["afp"]
               for r in audio_fingerprint(df).collect()}
        assert fps[99] is not None
        assert all(v is None for k, v in fps.items() if k != 99)
