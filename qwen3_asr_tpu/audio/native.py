"""ctypes bindings to the native C++ audio runtime (libqwen3audio).

The library lives in ``qwen3_asr_tpu/audio/csrc`` and is built with
``make -C qwen3_asr_tpu/audio/csrc`` (or the setuptools hook).  Everything
degrades gracefully to the numpy implementations in ``io.py`` when the
shared object has not been built.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_NAME = "libqwen3audio.so"
_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    so = Path(__file__).parent / "csrc" / _LIB_NAME
    if not so.is_file():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.qa_decode_wav.restype = ctypes.c_int64
    lib.qa_decode_wav.argtypes = [
        ctypes.c_char_p,                  # path
        ctypes.POINTER(ctypes.c_float),   # out buffer (or NULL to query size)
        ctypes.c_int64,                   # out buffer capacity (samples)
        ctypes.POINTER(ctypes.c_int32),   # out sample rate
    ]
    lib.qa_resample_linear.restype = ctypes.c_int64
    lib.qa_resample_linear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # in
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # out
    ]
    lib.qa_frame_rms.restype = ctypes.c_int64
    lib.qa_frame_rms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # samples
        ctypes.c_int64,                                   # frame size
        ctypes.POINTER(ctypes.c_float),                   # out energies
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_wav_file(path) -> tuple[np.ndarray, int]:
    """Decode a WAV file via the native library -> (mono f32 samples, rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not built")
    cpath = str(path).encode()
    rate = ctypes.c_int32(0)
    n = lib.qa_decode_wav(cpath, None, 0, ctypes.byref(rate))
    if n < 0:
        raise ValueError(f"native WAV decode failed (code {n}) for {path}")
    out = np.empty(n, dtype=np.float32)
    got = lib.qa_decode_wav(
        cpath,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.byref(rate),
    )
    if got != n:
        raise ValueError(f"native WAV decode short read ({got} != {n})")
    return out, int(rate.value)


def resample_linear(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    target_len = int(len(x) * target_sr / sr)
    out = np.empty(target_len, dtype=np.float32)
    lib.qa_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), target_len,
    )
    return out


def frame_rms(x: np.ndarray, frame_samples: int = 480) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_frames = len(x) // frame_samples
    out = np.empty(n_frames, dtype=np.float32)
    lib.qa_frame_rms(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        frame_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
