"""Round-12 tests: IEEE-float WAV (VERDICT r11 #2), the trailing-chunk
tolerance (ADVICE r11), and the baseline JPEG codec (VERDICT r11 #1)."""

import random
import struct

import numpy as np
import pytest

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.wav import (
    WavUnsupported,
    decode_wav,
    encode_wav,
)


# ------------------------------------------------------ float WAV
def test_wav_float32_and_float64_roundtrip_bit_exact():
    rng = np.random.default_rng(12)
    for bits, dt in ((32, np.float32), (64, np.float64)):
        for ch in (1, 2, 6):
            x = rng.standard_normal((257, ch)).astype(dt)
            b = encode_wav(48000, ch, bits, x)
            rate, c2, b2, y = decode_wav(b)
            assert (rate, c2, b2) == (48000, ch, bits)
            assert y.dtype == dt and y.shape == x.shape
            # bit-exact: float payloads are stored verbatim, no clamp
            assert y.tobytes() == x.tobytes()


def test_wav_float_nan_inf_and_out_of_range_roundtrip():
    # the codec stores float samples verbatim — values beyond the
    # nominal ±1.0 full-scale (and non-finite values) are legal on
    # disk and must survive the round-trip bit-for-bit
    x = np.array([[np.nan], [np.inf], [-np.inf], [37.5], [-2.0]], dtype=np.float32)
    _, _, _, y = decode_wav(encode_wav(8000, 1, 32, x))
    assert y.tobytes() == x.tobytes()


def test_wav_float_bits_validation():
    x = np.zeros((4, 1), dtype=np.float32)
    for bad in (8, 16, 24):
        with pytest.raises(WavUnsupported):
            encode_wav(8000, 1, bad, x)
    # a format-3 header claiming 16-bit is refused at decode too
    b = bytearray(encode_wav(8000, 1, 32, x))
    struct.pack_into("<H", b, 34, 16)   # bits
    struct.pack_into("<H", b, 32, 2)    # keep block_align consistent
    with pytest.raises(WavUnsupported):
        decode_wav(bytes(b))


def test_wav_extensible_float_guid_decodes():
    # rewrap a canonical format-3 payload as WAVE_FORMAT_EXTENSIBLE
    # with the IEEE-float SubFormat GUID
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.wav import (
        _FLOAT_GUID,
    )

    x = np.array([[0.25, -0.5], [1.0, 0.0]], dtype=np.float32)
    core = encode_wav(44100, 2, 32, x)
    base_fmt = core[20:36]  # the 16 packed fmt fields
    # EXTENSIBLE layout: base 16 (format word -> 0xFFFE) + cbSize(22)
    # + wValidBits + dwChannelMask + SubFormat GUID = 40 bytes
    ext = (
        struct.pack("<H", 0xFFFE) + base_fmt[2:]
        + struct.pack("<HHI", 22, 32, 0x3) + _FLOAT_GUID
    )
    assert len(ext) == 40
    data_chunk = core[36:]  # from the 'data' header on
    body = b"fmt " + struct.pack("<I", len(ext)) + ext + data_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, bits, y = decode_wav(payload)
    assert (rate, ch, bits) == (44100, 2, 32)
    assert y.tobytes() == x.tobytes()


def test_wav_trailing_malformed_chunk_tolerated_after_fmt_and_data():
    # ADVICE r11: a trailing chunk whose declared size overruns the
    # payload is a common corruption; once fmt+data are in hand the
    # walk must stop, not refuse the file
    good = encode_wav(8000, 1, 16, np.array([10, -10, 300], dtype=np.int32))
    corrupt = good + b"LIST" + struct.pack("<I", 10**6) + b"xx"
    rate, ch, bits, y = decode_wav(corrupt)
    assert y.ravel().tolist() == [10, -10, 300]
    # but the same overrun BEFORE data is still a refusal (the audio
    # itself is not provably intact)
    fmt_chunk = good[12:12 + 8 + 16]
    data_chunk = good[12 + 8 + 16:]
    body = fmt_chunk + b"LIST" + struct.pack("<I", 10**6) + b"xx" + data_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(WavUnsupported):
        decode_wav(payload)


def test_wav_float_fuzz_never_raises_foreign_exceptions():
    rnd = random.Random(12)
    good = bytearray(encode_wav(8000, 2, 32, np.zeros((16, 2), dtype=np.float32)))
    for _ in range(300):
        b = bytes(
            x if rnd.random() > 0.15 else rnd.randrange(256) for x in good
        )
        try:
            decode_wav(b)
        except WavUnsupported:
            pass  # the only allowed failure mode


def test_extract_audio_features_float_quantizes_to_codepoint_grid(spark):
    # the float fixture path: samples = cp/32767.0 must quantize back
    # to exactly the codepoints, so sum/sumsq equal the 8-bit twin's
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
        extract_audio_features,
        text_to_wav_payload,
    )

    df = spark.createDataFrame(
        [(4, "hello world"), (5, "hello world")], "doc_id long, text string"
    )
    feats = (
        extract_audio_features(text_to_wav_payload(df, "text", float_every=4))
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[4]["bits"] == 32 and by_id[5]["bits"] == 8
    for col in ("sample_sum", "sample_sumsq", "n_frames", "sample_rate"):
        assert by_id[4][col] == by_id[5][col], col
    cps = [ord(c) for c in "hello world".ljust(64)]
    assert by_id[4]["sample_sum"] == sum(cps)
    assert by_id[4]["sample_sumsq"] == sum(c * c for c in cps)


def test_resample_audio_float_wav_keeps_format(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
        resample_audio,
    )

    x = (np.arange(100, dtype=np.float32) / 100.0).reshape(-1, 1)
    payload = encode_wav(8000, 1, 32, x)
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"mime": "audio/wav", "n_bytes": len(payload)})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    row = resample_audio(df, 4000).collect()[0]
    rate, ch, bits, y = decode_wav(bytes(row["payload"]))
    assert (rate, ch, bits) == (4000, 1, 32)
    assert y.dtype == np.float32 and y.shape[0] == 50
    # nearest-frame policy: frame j comes from floor(j * 100 / 50)
    assert y.ravel().tolist() == x[::2].ravel().tolist()
