"""Sharding rules: map parameter pytrees to NamedShardings on a mesh.

Megatron-style tensor parallelism expressed declaratively — GSPMD inserts
the collectives:

  * column-parallel (shard the OUTPUT feature dim over ``tp``): wq/wk/wv,
    SwiGLU gate/up, encoder fc1 — the following elementwise ops stay local;
  * row-parallel (shard the INPUT feature dim over ``tp``): wo, SwiGLU
    down, encoder fc2 — XLA all-reduces the partial sums over ICI;
  * the embedding table is sharded over the vocab axis: the tied lm head
    (h @ emb.T) then computes vocab-sharded logits with no gather, and the
    argmax/sampling reduction is a tiny cross-chip reduce;
  * KV caches shard over the KV-head axis, so decode attention is fully
    local per chip;
  * norms / biases / conv stem are replicated (tiny).

Per-layer stacked tensors keep their leading (num_layers,) axis replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Decoder param tree -> PartitionSpec.  Leading axis of "layers/*" leaves is
# the stacked layer index (always None).
_DECODER_RULES: dict[str, P] = {
    "embedding": P("tp", None),
    "final_norm": P(None),
    "layers/ln1": P(None, None),
    "layers/ln2": P(None, None),
    "layers/q_norm": P(None, None),
    "layers/k_norm": P(None, None),
    "layers/wq": P(None, None, "tp"),
    "layers/wk": P(None, None, "tp"),
    "layers/wv": P(None, None, "tp"),
    "layers/wo": P(None, "tp", None),
    "layers/wg": P(None, None, "tp"),
    "layers/wu": P(None, None, "tp"),
    "layers/wd": P(None, "tp", None),
}

_ENCODER_RULES: dict[str, P] = {
    "conv_out": P(None, "tp"),
    "proj1_w": P(None, "tp"),
    "proj1_b": P("tp"),
    "proj2_w": P("tp", None),
    "proj2_b": P(None),
    "layers/wq": P(None, None, "tp"),
    "layers/bq": P(None, "tp"),
    "layers/wk": P(None, None, "tp"),
    "layers/bk": P(None, "tp"),
    "layers/wv": P(None, None, "tp"),
    "layers/bv": P(None, "tp"),
    "layers/wo": P(None, "tp", None),
    "layers/bo": P(None, None),
    "layers/fc1_w": P(None, None, "tp"),
    "layers/fc1_b": P(None, "tp"),
    "layers/fc2_w": P(None, "tp", None),
    "layers/fc2_b": P(None, None),
}


def _quant_specs(path: str, spec: P) -> dict[str, P]:
    """Specs for an int8 ``{"q", "s"}`` leaf pair (ops/quant.py layout).

    ``spec`` is the rule for the ORIGINAL bf16 weight.  Layer weights keep
    their (L, in, out) layout, so ``q`` reuses the spec and the
    per-out-channel scales ``s`` (L, out) take (spec[0], spec[2]).  The
    embedding is stored TRANSPOSED when quantized ((H, V) instead of
    (V, H), quant.py:169-173), so its vocab sharding moves to the last
    axis and ``s`` (V,) shards over vocab.
    """
    if path == "embedding":
        return {"q": P(spec[1], spec[0]), "s": P(spec[0])}
    if len(spec) == 2:
        # Top-level (in, out) linear (encoder conv_out / proj head):
        # per-out-channel scales follow the output axis.
        return {"q": spec, "s": P(spec[1])}
    return {"q": spec, "s": P(spec[0], spec[2])}


def _tree_shardings(params: Any, rules: dict[str, P], mesh: Mesh):
    def walk(tree, path=""):
        if isinstance(tree, dict):
            if set(tree) == {"q", "s"} and not isinstance(tree["q"], dict):
                spec = rules.get(path)
                if spec is None:
                    return {
                        k: NamedSharding(mesh, P(*([None] * v.ndim)))
                        for k, v in tree.items()
                    }
                qs = _quant_specs(path, spec)
                return {
                    k: NamedSharding(mesh, qs[k]) for k in ("q", "s")
                }
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in tree.items()}
        spec = rules.get(path)
        if spec is None:
            spec = P(*([None] * tree.ndim))  # replicate
        return NamedSharding(mesh, spec)

    return walk(params)


def decoder_param_sharding(params: Any, mesh: Mesh):
    return _tree_shardings(params, _DECODER_RULES, mesh)


def encoder_param_sharding(params: Any, mesh: Mesh):
    return _tree_shardings(params, _ENCODER_RULES, mesh)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """(L, B, kv_heads, S, D): batch over dp, heads over tp."""
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, shardings: Any):
    """Place a parameter pytree according to a matching sharding pytree."""
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
