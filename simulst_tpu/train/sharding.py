"""Parameter sharding rules over the (data, model) mesh.

Data parallelism replicates parameters (the reference's DDP equivalent,
SURVEY.md §2.6); the `model` axis additionally tensor-shards the widest
matmuls — FFN hidden dim, the fused Emformer KV projection, and the vocab
embedding/projection — so multi-chip runs exercise real TP collectives
(all-gather / reduce-scatter inserted by GSPMD from these specs).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2:
        if joined.endswith("fc1/weight"):
            return P(None, "model")          # (d, ffn)
        if joined.endswith("fc2/weight"):
            return P("model", None)          # (ffn, d)
        if joined.endswith("emb_to_key_value/weight"):
            return P(None, "model")          # (d, 2d)
        if joined.endswith("embed_tokens/weight") or joined.endswith("ctc_layer/weight") \
                or joined.endswith("output_projection/weight"):
            return P(None, None)             # keep vocab replicated (tied emb)
    return P()


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params)
