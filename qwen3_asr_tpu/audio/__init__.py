from .io import load_audio, find_split_points, SAMPLE_RATE
from .mel import (
    N_FFT,
    HOP_LENGTH,
    N_MELS,
    F_MIN,
    F_MAX,
    mel_filterbank,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    MelFrontend,
)

__all__ = [
    "load_audio",
    "find_split_points",
    "SAMPLE_RATE",
    "N_FFT",
    "HOP_LENGTH",
    "N_MELS",
    "F_MIN",
    "F_MAX",
    "mel_filterbank",
    "log_mel_spectrogram",
    "log_mel_spectrogram_np",
    "MelFrontend",
]
