from .decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_decoder_params,
    init_kv_cache,
)
from .encoder import encoder_forward, init_encoder_params, valid_token_count
from .params import load_checkpoint

__all__ = [
    "decoder_forward",
    "decoder_logits",
    "embed_tokens",
    "init_decoder_params",
    "init_kv_cache",
    "encoder_forward",
    "init_encoder_params",
    "valid_token_count",
    "load_checkpoint",
]
