"""Audio frontend tests: mel numerics, WAV IO, split points.

Covers the reference's test_audio.py oracles (frame counts, silence
constant, value behavior) plus golden-value equivalence between the TPU
(conv-DFT) mel pipeline and the numpy oracle of the reference algorithm.
"""

import struct

import numpy as np
import pytest

from qwen3_asr_tpu.audio.io import (
    _decode_wav,
    find_split_points,
    frame_rms,
    load_audio,
    resample_linear,
)
from qwen3_asr_tpu.audio.mel import (
    HOP_LENGTH,
    N_MELS,
    MelFrontend,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    mel_filterbank,
)

SR = 16_000


def sine(duration_s=1.0, freq=440.0, sr=SR):
    t = np.arange(int(duration_s * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# -- filterbank -------------------------------------------------------------

def test_filterbank_shape_and_normalization():
    fb = mel_filterbank()
    assert fb.shape == (N_MELS, 201)
    assert np.all(fb >= 0)
    # Slaney area normalization: peak of each filter = 2 / width_hz, so all
    # row sums are small and comparable.
    assert fb.sum() > 0


def test_filterbank_cached():
    assert mel_filterbank() is mel_filterbank()


# -- numpy oracle shape/value oracles (reference test_audio.py) -------------

def test_one_second_is_100_frames():
    mel = log_mel_spectrogram_np(sine(1.0))
    assert mel.shape == (N_MELS, 100)


def test_arbitrary_length_frame_count():
    audio = sine(0.73)  # 11680 samples -> 73 frames
    mel = log_mel_spectrogram_np(audio)
    assert mel.shape[1] == len(audio) // HOP_LENGTH


def test_silence_normalizes_to_constant():
    mel = log_mel_spectrogram_np(np.zeros(SR, dtype=np.float32))
    # log10(1e-10) = -10 -> clamp max-8 -> (-10+4)/4 = -1.5
    assert np.allclose(mel, -1.5)


def test_value_range_sane():
    mel = log_mel_spectrogram_np(sine())
    assert mel.max() <= 1.5
    assert mel.min() >= mel.max() - 2.0  # 8 dynamic range / 4


# -- TPU pipeline vs numpy oracle ------------------------------------------

def test_device_mel_matches_oracle_exact_length():
    audio = sine(1.0)
    oracle = log_mel_spectrogram_np(audio)
    dev = np.asarray(log_mel_spectrogram(audio))
    assert dev.shape == oracle.shape
    np.testing.assert_allclose(dev, oracle, atol=2e-3, rtol=0)


def test_device_mel_matches_oracle_random_audio():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(SR * 2 + 777).astype(np.float32) * 0.1
    oracle = log_mel_spectrogram_np(audio)
    dev = np.asarray(log_mel_spectrogram(audio))
    np.testing.assert_allclose(dev, oracle, atol=2e-3, rtol=0)


def test_bucketed_frontend_valid_prefix_matches_unbucketed():
    """Padding to a bucket must not change the valid frames at all."""
    audio = sine(1.0, freq=523.0)
    frontend = MelFrontend()
    mel, n_valid = frontend(audio)
    assert n_valid == 100
    assert mel.shape == (N_MELS, 800)
    oracle = log_mel_spectrogram_np(audio)
    np.testing.assert_allclose(np.asarray(mel)[:, :100], oracle, atol=2e-3)
    # Invalid frames zeroed (reference zero-pads partial chunks).
    assert np.all(np.asarray(mel)[:, 100:] == 0.0)


def test_bucket_selection():
    frontend = MelFrontend()
    assert frontend.bucket_for(SR) == 800            # 1 s -> smallest bucket
    assert frontend.bucket_for(9 * SR) == 1600       # 9 s -> 16 s bucket


# -- WAV IO -----------------------------------------------------------------

def _wav_bytes(samples: np.ndarray, sr: int = SR, fmt: str = "pcm16", channels: int = 1):
    if fmt == "pcm16":
        payload = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        tag, bits = 1, 16
    elif fmt == "f32":
        payload = samples.astype("<f4").tobytes()
        tag, bits = 3, 32
    else:
        raise ValueError(fmt)
    block = channels * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", tag, channels, sr, sr * block, block, bits)
    data = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    data += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def test_decode_wav_pcm16_roundtrip():
    audio = sine(0.25)
    decoded, sr = _decode_wav(_wav_bytes(audio, fmt="pcm16"))
    assert sr == SR
    np.testing.assert_allclose(decoded, audio, atol=1e-4)


def test_decode_wav_float32_roundtrip():
    audio = sine(0.25)
    decoded, sr = _decode_wav(_wav_bytes(audio, fmt="f32"))
    np.testing.assert_allclose(decoded, audio, atol=0)


def test_decode_wav_stereo_downmix():
    mono = sine(0.1)
    stereo = np.repeat(mono[:, None], 2, axis=1).reshape(-1)
    decoded, _ = _decode_wav(_wav_bytes(stereo, fmt="f32", channels=2))
    np.testing.assert_allclose(decoded, mono, atol=1e-6)


def test_load_audio_resamples(tmp_path):
    audio = sine(0.5, sr=8000)
    p = tmp_path / "a.wav"
    p.write_bytes(_wav_bytes(audio, sr=8000, fmt="f32"))
    out = load_audio(p)
    assert abs(len(out) - SR // 2) <= 1


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_wav(b"not a wav file at all----")


def test_resample_identity():
    x = sine(0.1)
    assert resample_linear(x, SR, SR) is x or np.array_equal(resample_linear(x, SR, SR), x)


# -- split points (reference test_model.py:104-116 semantics) ---------------

def test_split_points_snap_to_silence():
    sr = SR
    # 30 s audio, boundary at 10 s; silence pocket at 8 s should win.
    audio = np.ones(30 * sr, dtype=np.float32) * 0.5
    silent_start = 8 * sr
    audio[silent_start : silent_start + 480 * 4] = 0.0
    pts = find_split_points(audio, chunk_samples=10 * sr, search_samples=5 * sr)
    assert len(pts) == 2
    assert abs(pts[0] - silent_start) <= 480 * 4


def test_split_points_none_for_short_audio():
    assert find_split_points(sine(1.0), chunk_samples=SR * 10, search_samples=SR) == []


def test_frame_rms_values():
    x = np.concatenate([np.zeros(480), np.ones(480)]).astype(np.float32)
    e = frame_rms(x, 480)
    np.testing.assert_allclose(e, [0.0, 1.0], atol=1e-6)


def test_decode_wav_extensible_format():
    """WAVE_FORMAT_EXTENSIBLE wraps the real tag in a GUID sub-chunk."""
    audio = sine(0.1)
    payload = audio.astype("<f4").tobytes()
    # fmt chunk: tag 0xFFFE, cbSize=22 extension = validBits(2) +
    # channelMask(4) + SubFormat GUID whose first 2 bytes are the real
    # format (3 = IEEE float) — i.e. the tag sits at byte 24 of the chunk.
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, SR, SR * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4) + struct.pack("<H", 3) + b"\x00" * 14
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data
    decoded, sr = _decode_wav(blob)
    assert sr == SR
    np.testing.assert_allclose(decoded, audio, atol=0)


def test_decode_wav_odd_sized_chunk_alignment():
    """Chunks are word-aligned; an odd-sized extra chunk must be skipped."""
    audio = sine(0.05)
    payload = audio.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, SR, SR * 4, 4, 32)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    data = junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data
    decoded, _ = _decode_wav(blob)
    np.testing.assert_allclose(decoded, audio, atol=0)


def test_resample_downsamples():
    x = sine(1.0, sr=SR)
    y = resample_linear(x, SR, 8000)
    assert abs(len(y) - 8000) <= 1


def test_mel_very_short_clip():
    """Sub-second clips shorter than the FFT window must not crash."""
    audio = sine(0.02)  # 320 samples, 2 frames
    mel = log_mel_spectrogram_np(audio)
    assert mel.shape == (N_MELS, 2)
    dev = np.asarray(log_mel_spectrogram(audio))
    np.testing.assert_allclose(dev, mel, atol=2e-3)


def test_host_pad_piecewise_matches_np_pad():
    """The in-place piecewise reflect fill must equal np.pad(..., 'reflect')
    for every regime: tiny (multi-wrap), short, exact, and bucket-padded."""
    from qwen3_asr_tpu.audio.mel import _host_pad, host_pad_batch

    rng = np.random.default_rng(7)
    for n in (2, 5, 199, 200, 201, 400, 4000, 16000, 16123):
        audio = rng.standard_normal(n).astype(np.float32)
        n_frames = max(1, n // 160)
        buf_len = (n_frames - 1) * 160 + 400
        ref = np.zeros(buf_len, np.float32)
        reflected = np.pad(audio, 200, mode="reflect")
        take = min(len(reflected), buf_len)
        ref[:take] = reflected[:take]
        got = _host_pad(audio, n_frames, 400, 160)
        np.testing.assert_array_equal(got, ref, err_msg=f"n={n}")

        # Bucket-padded buffer (buf_len >> clip): the full right
        # reflection fits.  n = 201 is the regression case — tail_len
        # == n - 1 made the old negative-step slice empty (ValueError).
        buf_len_b = (100 - 1) * 160 + 400
        ref_b = np.zeros(buf_len_b, np.float32)
        take_b = min(len(reflected), buf_len_b)
        ref_b[:take_b] = reflected[:take_b]
        got_b = _host_pad(audio, 100, 400, 160)
        np.testing.assert_array_equal(got_b, ref_b, err_msg=f"n={n} bucketed")

    # batched path, int16 dtype preserved
    clips = [
        (rng.standard_normal(16000) * 4000).astype(np.int16),
        (rng.standard_normal(8000) * 4000).astype(np.int16),
    ]
    out = host_pad_batch(clips, 100, 400, 160)
    assert out.dtype == np.int16
    for row, c in zip(out, clips):
        np.testing.assert_array_equal(row, _host_pad(c, 100, 400, 160))
