"""Tensor-parallel parameter sharding over the mesh's 'model' axis.

The reference scales with data-parallel DDP only (SURVEY.md §2.5 —
detectron2 `launch` + torch DDP, reference train_net.py:325-335). On TPU
the natural scaling story is richer: a 2-D `jax.sharding.Mesh`
('data' x 'model') where the batch is sharded over 'data' and the wide
transformer parameters are sharded over 'model', with XLA's GSPMD
partitioner inserting the all-gathers / reduce-scatters over ICI. This
module supplies the parameter->PartitionSpec rules that turn the
replicated-DP trainer into a DP x TP hybrid without touching model code:
shardings are attached to the jitted step's in/out specs and GSPMD
propagates them through every matmul.

Rules follow the Megatron/scaling-book recipe for a transformer block:

  - column-sharded (output features split over 'model'): the FFN up
    projection (`linear1`, Swin `mlp_fc1`), fused qkv projections
    (`in_proj_weight`, Swin `qkv`), and the deformable-attention value
    projection (`value_proj` — its output dim is heads*head_dim). Their
    biases shard the same way.
  - row-sharded (input features split): the matching down projections —
    FFN `linear2` / `mlp_fc2`, attention `out_proj` / Swin `proj`,
    deformable `output_proj`, Swin PatchMerging `reduction`. Their biases
    are replicated (added after the contraction).
  - everything else (convs, norms, embeddings, small heads) is replicated.

Because optax's Adam moments mirror the parameter tree, the SAME
path-suffix rules applied via `tree_map_with_path` shard `mu`/`nu`
identically — sharded optimizer state is what makes this a memory win
(ZeRO-style: a Swin-L AdamW state at f32 is ~2.4 GB replicated; TP=4
stores ~0.6 GB per chip of the sharded tensors).

A rule only fires when the sharded dimension is divisible by the 'model'
axis size (GSPMD would pad otherwise — legal but wasteful); anything that
does not divide cleanly stays replicated. Correctness never depends on the
rules: GSPMD guarantees identical math for any sharding, which is what
`tests/test_tp.py` asserts (DPxTP losses == DP losses on the virtual mesh).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module (second-to-last path component) -> kernel sharded on OUTPUT dim
_COL_MODULES = frozenset({"linear1", "mlp_fc1", "qkv", "value_proj"})
# module -> kernel sharded on INPUT dim (bias replicated)
_ROW_MODULES = frozenset({
    "linear2", "mlp_fc2", "out_proj", "proj", "output_proj", "reduction",
})


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def partition_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one leaf of the train state (params, Adam moments,
    or anything mirroring the param tree). Replicated unless a TP rule
    matches AND the sharded dim divides by model_size."""
    shape = getattr(leaf, "shape", ())
    if model_size <= 1 or len(shape) == 0:
        return P()
    names = _path_names(path)
    name = names[-1]
    mod = names[-2] if len(names) >= 2 else ""

    # nn.scan-stacked layers (encoder_layers, decoder rounds, Swin stage
    # blocks) carry a LEADING layer axis: the same rules apply one dim to
    # the right, with the layer axis replicated.
    stacked = 1 if len(shape) == 3 and name in ("kernel", "in_proj_weight") \
        else 0

    # torch-layout packed attention: in_proj_weight (C, 3C) / in_proj_bias (3C,)
    if name == "in_proj_weight" and len(shape) == 2 + stacked:
        return (
            P(*([None] * (1 + stacked)), "model")
            if shape[1 + stacked] % model_size == 0 else P()
        )
    if name == "in_proj_bias":
        if len(shape) == 1 and shape[0] % model_size == 0:
            return P("model")
        if len(shape) == 2 and shape[1] % model_size == 0:  # stacked
            return P(None, "model")
        return P()

    if mod in _COL_MODULES:
        if (name == "kernel" and len(shape) == 2 + stacked
                and shape[1 + stacked] % model_size == 0):
            return P(*([None] * (1 + stacked)), "model")
        if name == "bias" and len(shape) == 1 and shape[0] % model_size == 0:
            return P("model")
        if name == "bias" and len(shape) == 2 and shape[1] % model_size == 0:
            return P(None, "model")  # stacked bias
        return P()
    if mod in _ROW_MODULES:
        if (name == "kernel" and len(shape) == 2 + stacked
                and shape[stacked] % model_size == 0):
            return P(*([None] * stacked), "model", None)
        return P()
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a TrainState (or any state pytree): TP rules
    where they match, replicated elsewhere. With a trivial 'model' axis this
    degenerates to the all-replicated tree the pure-DP trainer uses."""
    model_size = int(mesh.shape.get("model", 1))

    def one(path, leaf):
        return NamedSharding(mesh, partition_spec(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(one, state)


def count_sharded(state: Any, mesh: Mesh) -> tuple:
    """(n_sharded_leaves, sharded_param_bytes, total_param_bytes) — for
    logging what TP actually bought."""
    model_size = int(mesh.shape.get("model", 1))
    n, sb, tb = 0, 0, 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        if not hasattr(leaf, "nbytes"):
            continue
        tb += leaf.nbytes
        if partition_spec(path, leaf, model_size) != P():
            n += 1
            sb += leaf.nbytes
    return n, sb, tb
