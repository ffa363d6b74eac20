from .flash_attention import flash_attention_causal

__all__ = ["flash_attention_causal"]
