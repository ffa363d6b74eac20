from .norms import rms_norm, layer_norm
from .rope import rope_rotate, rope_frequencies
from .attention import sdpa, windowed_self_attention
from .sampling import sample_logits, apply_repetition_penalty, top_k_mask, top_p_mask

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_rotate",
    "rope_frequencies",
    "sdpa",
    "windowed_self_attention",
    "sample_logits",
    "apply_repetition_penalty",
    "top_k_mask",
    "top_p_mask",
]
