"""Native (C++) audio library vs numpy-oracle equivalence tests."""

import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_tpu.audio import io as audio_io
from qwen3_asr_tpu.audio import native

CSRC = Path(audio_io.__file__).parent / "csrc"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not (CSRC / "libqwen3audio.so").exists():
        subprocess.run(["make", "-C", str(CSRC)], check=True, capture_output=True)
    # Force a fresh load attempt after build.
    native._load_attempted = False
    native._lib = None
    if not native.available():
        pytest.skip("native library unavailable")


def _write_wav(path, samples, sr=16000, fmt="pcm16", channels=1):
    if fmt == "pcm16":
        payload = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        tag, bits = 1, 16
    else:
        payload = samples.astype("<f4").tobytes()
        tag, bits = 3, 32
    block = channels * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", tag, channels, sr, sr * block, block, bits)
    data = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    data += b"data" + struct.pack("<I", len(payload)) + payload
    path.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data)


def test_native_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    p = tmp_path / "x.wav"
    _write_wav(p, audio, fmt="f32")
    nat, sr_n = native.decode_wav_file(p)
    ref, sr_r = audio_io._decode_wav(p.read_bytes())
    assert sr_n == sr_r == 16000
    np.testing.assert_allclose(nat, ref, atol=0)


def test_native_decode_pcm16_stereo(tmp_path):
    mono = np.sin(np.linspace(0, 20, 4000)).astype(np.float32) * 0.5
    stereo = np.repeat(mono[:, None], 2, axis=1).reshape(-1)
    p = tmp_path / "s.wav"
    _write_wav(p, stereo, fmt="pcm16", channels=2)
    nat, _ = native.decode_wav_file(p)
    ref, _ = audio_io._decode_wav(p.read_bytes())
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_resample_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8000).astype(np.float32)
    nat = native.resample_linear(x, 8000, 16000)
    ref = audio_io.resample_linear(x, 8000, 16000)
    assert len(nat) == len(ref)
    np.testing.assert_allclose(nat, ref, atol=1e-5)


def test_native_frame_rms_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(480 * 10 + 100).astype(np.float32)
    nat = native.frame_rms(x, 480)
    ref = audio_io.frame_rms(x, 480)
    np.testing.assert_allclose(nat, ref, atol=1e-6)
