"""Log-mel spectrogram frontend (Qwen3-ASR spec), TPU-native.

Numerics contract (parity with /root/reference/src/qwen3_asr_mlx/audio.py:211-278):
  1. STFT: n_fft=400, hop=160, symmetric Hann (``np.hanning``), reflect pad
     n_fft//2 (librosa center=True), final STFT frame dropped.
  2. Power spectrum -> Slaney-area-normalized 128-bin mel filterbank built
     from the HTK mel formula, fmin=0, fmax=8000.
  3. log10(max(mel, 1e-10)); clamp to (global max - 8); (x + 4) / 4.
  1 second of 16 kHz audio -> exactly 100 mel frames.

TPU design (no counterpart in the reference, which runs a Python loop of
``np.fft.rfft`` per 10 ms frame):
  * The entire STFT is ONE strided convolution: 402 filters of length 400
    (Hann-windowed cos/sin DFT basis), stride 160.  XLA lowers this onto the
    MXU; there is no FFT, no gather, no dynamic shape.
  * Shapes are bucketed: audio is padded on the host into a buffer laid out
    as ``[reflect(200) | signal | reflect | zeros]`` so that every *valid*
    frame sees byte-identical samples to the reference's reflect-padded
    signal, while the compiled program has a static frame count.
  * The dynamic-range clamp uses a masked max over valid frames only, so
    padding never perturbs the normalization.
  * Padded (invalid) frames are zeroed on output, matching the zero padding
    the reference applies to partial encoder chunks (encoder.py:260-263).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 128
F_MIN = 0.0
F_MAX = 8_000.0

_LOG_FLOOR = 1e-10


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = F_MIN,
    f_max: float = F_MAX,
) -> np.ndarray:
    """Slaney-area-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Triangles are placed at n_mels+2 points equally spaced on the HTK mel
    scale between f_min and f_max; each filter is divided by its width in Hz.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    hz_pts = _mel_to_hz(np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2))

    left = hz_pts[:-2, None]       # (n_mels, 1)
    center = hz_pts[1:-1, None]
    right = hz_pts[2:, None]
    rising = (fft_freqs[None, :] - left) / (center - left)
    falling = (right - fft_freqs[None, :]) / (right - center)
    fb = np.maximum(0.0, np.minimum(rising, falling))

    width = (right - left).squeeze(-1)
    fb[width > 0] /= width[width > 0, None]
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def _dft_conv_kernel(n_fft: int = N_FFT) -> np.ndarray:
    """Hann-windowed real-DFT basis as conv filters, (2*(n_fft//2+1), 1, n_fft).

    Row k of the first half is ``hann * cos(2 pi k n / n_fft)`` (real part);
    the second half is ``-hann * sin(...)`` (imag part of e^{-i...}).
    """
    n_freqs = n_fft // 2 + 1
    window = np.hanning(n_fft).astype(np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n[None, :] / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0) * window[None, :]
    return basis.astype(np.float32)[:, None, :]   # (O=2*n_freqs, I=1, W=n_fft)


def _stft_power(frames_signal: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Strided-conv STFT -> power spectrum (n_freqs, n_frames)."""
    kernel = jnp.asarray(_dft_conv_kernel(n_fft))
    x = frames_signal[None, None, :]   # (N=1, C=1, L)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[0]                               # (2*n_freqs, n_frames)
    n_freqs = n_fft // 2 + 1
    real, imag = y[:n_freqs], y[n_freqs:]
    return real * real + imag * imag


def _mel_raw(padded: jnp.ndarray, n_fft: int, hop: int, n_mels: int) -> jnp.ndarray:
    """UNCLAMPED log10 mel over one pre-padded signal buffer.

    The raw stage shared by the offline pipeline (:func:`_mel_core`
    applies the clip-global clamp immediately) and the incremental
    streaming sessions (incremental.py caches raw windows and applies
    the clamp lazily once the clip max is known).

    ``padded`` may be int16 PCM: it is converted on device with the exact
    reference scaling (x / 32768, audio.py:147) — int16 transport halves
    the host->device payload with bit-identical results for PCM sources.
    """
    if padded.dtype == jnp.int16:
        padded = padded.astype(jnp.float32) * (1.0 / 32768.0)
    power = _stft_power(padded, n_fft, hop)                 # (n_freqs, n_frames)
    fb = jnp.asarray(mel_filterbank(n_fft, n_mels))
    mel = jnp.dot(fb, power, precision=jax.lax.Precision.HIGHEST)
    return jnp.log10(jnp.maximum(mel, _LOG_FLOOR))


def _mel_finalize(
    raw: jnp.ndarray, n_valid: jnp.ndarray, global_max: jnp.ndarray
) -> jnp.ndarray:
    """Dynamic-range clamp + (x+4)/4 normalization + invalid-frame zeroing
    (the clip-global half of the reference pipeline, audio.py:274-276)."""
    n_frames = raw.shape[1]
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_frames), 1)
    valid = frame_idx < n_valid
    out = (jnp.maximum(raw, global_max - 8.0) + 4.0) / 4.0
    return jnp.where(valid, out, 0.0)


def _mel_core(
    padded: jnp.ndarray,
    n_valid: jnp.ndarray,
    n_frames: int,
    n_fft: int,
    hop: int,
    n_mels: int,
) -> jnp.ndarray:
    """Mel pipeline over one pre-reflected, zero-extended signal buffer.

    ``padded`` has static length ``(n_frames - 1) * hop + n_fft``;
    ``n_valid`` is the (traced) count of frames carrying real audio.
    Returns (n_mels, n_frames) float32 with invalid frames zeroed.  The
    dynamic-range clamp maxes over valid frames only, per clip.
    """
    log_spec = _mel_raw(padded, n_fft, hop, n_mels)
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_frames), 1)
    valid = frame_idx < n_valid                              # (1, n_frames)
    global_max = jnp.max(jnp.where(valid, log_spec, -jnp.inf))
    return _mel_finalize(log_spec, n_valid, global_max)


@partial(jax.jit, static_argnames=("n_frames", "n_fft", "hop", "n_mels"))
def _mel_from_padded(
    padded: jnp.ndarray,
    n_valid: jnp.ndarray,
    n_frames: int,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    n_mels: int = N_MELS,
) -> jnp.ndarray:
    return _mel_core(padded, n_valid, n_frames, n_fft, hop, n_mels)


@partial(jax.jit, static_argnames=("n_frames", "n_fft", "hop", "n_mels"))
def _mel_batch_from_padded(
    padded: jnp.ndarray,       # (B, L)
    n_valid: jnp.ndarray,      # (B,)
    n_frames: int,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    n_mels: int = N_MELS,
) -> jnp.ndarray:
    return jax.vmap(
        lambda p, v: _mel_core(p, v, n_frames, n_fft, hop, n_mels)
    )(padded, n_valid)


def _as_samples(audio: np.ndarray) -> np.ndarray:
    """float32 samples, or int16 PCM passed through (device scales /32768)."""
    arr = np.asarray(audio)
    return arr if arr.dtype == np.int16 else arr.astype(np.float32)


def _host_pad_into(buf: np.ndarray, audio: np.ndarray, n_fft: int) -> None:
    """Fill ``buf`` with ``[reflect(pad) | audio | reflect | zeros]`` in place."""
    pad = n_fft // 2
    buf_len = len(buf)
    n = len(audio)
    if n == 0:
        return
    if n == 1:
        buf[pad] = audio[0]
        return
    if n <= pad:
        # Tiny clip: np.pad wraps the reflection multiple times; defer to it.
        reflected = np.pad(audio, pad, mode="reflect")
        take = min(len(reflected), buf_len)
        buf[:take] = reflected[:take]
        return
    # Head: reflect(audio[1..pad]) reversed; body: the signal; tail: the
    # trailing reflection — written piecewise, no intermediate copy of the
    # whole padded signal (np.pad costs ~10 ms/clip at 30 s x batch 32).
    head = min(pad, n - 1)
    buf[pad - head : pad] = audio[1 : head + 1][::-1]
    body_take = min(n, buf_len - pad)
    buf[pad : pad + body_take] = audio[:body_take]
    tail_start = pad + n
    tail_len = min(buf_len - tail_start, n - 1, pad)
    if tail_len > 0:
        # audio[n-2], audio[n-3], ..., audio[n-1-tail_len].  Written as a
        # forward slice + reverse: the negative-step form
        # audio[n-2 : n-2-tail_len : -1] is EMPTY when tail_len == n - 1
        # (stop lands on -1, which numpy reads as "end"), i.e. for clips
        # of exactly pad + 1 = 201 samples.
        buf[tail_start : tail_start + tail_len] = audio[n - 1 - tail_len : n - 1][::-1]


def _host_pad(audio: np.ndarray, n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Lay out ``[reflect(pad) | audio | reflect | zeros]`` with static length.

    Every frame index < len(audio)//hop reads samples identical to
    ``np.pad(audio, n_fft//2, mode='reflect')`` — the librosa center=True
    contract — regardless of how much zero tail the bucket adds.  (The last
    valid frame ends at sample len(audio) + n_fft - hop, always inside the
    reflected region.)
    """
    buf_len = (n_frames - 1) * hop + n_fft
    dtype = audio.dtype if audio.dtype in (np.int16, np.float32) else np.float32
    buf = np.zeros(buf_len, dtype=dtype)
    _host_pad_into(buf, audio, n_fft)
    return buf


def host_pad_batch(
    audios: list[np.ndarray], n_frames: int, n_fft: int, hop: int
) -> np.ndarray:
    """(B, L) padded batch written directly into one buffer (no np.stack).

    All clips must share a dtype (the caller normalizes mixed batches).
    """
    buf_len = (n_frames - 1) * hop + n_fft
    dtype = audios[0].dtype if audios[0].dtype in (np.int16, np.float32) else np.float32
    out = np.zeros((len(audios), buf_len), dtype=dtype)
    for row, a in zip(out, audios):
        _host_pad_into(row, a, n_fft)
    return out


class MelFrontend:
    """Bucketed, jit-compiled log-mel frontend.

    ``__call__`` pads the waveform to a frame bucket, runs the compiled
    pipeline for that bucket, and returns ``(mel, n_valid_frames)`` where
    ``mel`` is (n_mels, bucket_frames) with invalid frames zeroed.
    """

    def __init__(self, frame_buckets: tuple[int, ...] | None = None) -> None:
        from ..config import DEFAULT_FRAME_BUCKETS

        self.frame_buckets = tuple(frame_buckets or DEFAULT_FRAME_BUCKETS)

    def bucket_for(self, n_samples: int) -> int:
        n_frames = n_samples // HOP_LENGTH
        for b in self.frame_buckets:
            if n_frames <= b:
                return b
        return self.frame_buckets[-1]

    def __call__(self, audio: np.ndarray) -> tuple[jax.Array, int]:
        audio = _as_samples(audio)
        n_valid = len(audio) // HOP_LENGTH
        bucket = self.bucket_for(len(audio))
        padded = _host_pad(audio, bucket, N_FFT, HOP_LENGTH)
        mel = _mel_from_padded(jnp.asarray(padded), jnp.int32(n_valid), bucket)
        return mel, n_valid

    def batch(self, audios: list[np.ndarray]) -> tuple[jax.Array, np.ndarray]:
        """Shared-bucket batched mel: (B, n_mels, bucket), valid counts (B,).

        All clips are padded to the largest bucket among them so the batch
        runs as ONE device program (the serving path's shared frontend).
        """
        audios = [_as_samples(a) for a in audios]
        bucket = max(self.bucket_for(len(a)) for a in audios)
        n_valid = np.array([len(a) // HOP_LENGTH for a in audios], np.int32)
        padded = np.stack(
            [_host_pad(a, bucket, N_FFT, HOP_LENGTH) for a in audios]
        )
        mel = _mel_batch_from_padded(jnp.asarray(padded), jnp.asarray(n_valid), bucket)
        return mel, n_valid


def log_mel_spectrogram(audio: np.ndarray) -> jax.Array:
    """Unbucketed device mel, shape (n_mels, len(audio)//hop).

    API-parity convenience (reference exports ``log_mel_spectrogram``);
    production paths use :class:`MelFrontend` for static shapes.
    """
    audio = _as_samples(audio)
    n_frames = max(1, len(audio) // HOP_LENGTH)
    padded = _host_pad(audio, n_frames, N_FFT, HOP_LENGTH)
    return _mel_from_padded(jnp.asarray(padded), jnp.int32(n_frames), n_frames)


def log_mel_spectrogram_np(audio: np.ndarray) -> np.ndarray:
    """Pure-numpy oracle of the reference pipeline (vectorized rFFT).

    Used by golden tests to pin the device kernel to reference numerics.
    """
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    audio = audio.astype(np.float32)
    window = np.hanning(N_FFT).astype(np.float32)
    pad = N_FFT // 2
    x = np.pad(audio, pad, mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = x[idx] * window[None, :]
    spec = np.fft.rfft(frames.astype(np.float32), n=N_FFT, axis=1).T  # (freq, T)
    power = (np.abs(spec[:, :-1]) ** 2).astype(np.float32)
    mel = mel_filterbank() @ power
    log_spec = np.log10(np.maximum(mel, _LOG_FLOOR))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
