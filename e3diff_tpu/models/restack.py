"""Per-layer <-> stacked parameter-tree converters for scan_layers.

With TransformerConfig.scan_layers=True, TransformerStack compiles one
nn.scan'ed layer body and its params live under "layers"/"layer" with a
leading num_layers axis, instead of unrolled "layer_0".."layer_{n-1}"
subtrees. These converters translate whole model trees between the two
layouts so torch-ported checkpoints (always per-layer, the reference's
naming contract) load into scan models and scan-trained params export back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_per_layer_stack(node: dict) -> bool:
    return (bool(node)
            and all(k.startswith("layer_") and k[6:].isdigit() for k in node))


def _is_scanned_stack(node: dict) -> bool:
    return set(node) == {"layers"} and set(node["layers"]) == {"layer"}


def params_to_scan(params):
    """Per-layer tree -> scan layout: every {"layer_0".."layer_{n-1}"}
    subtree becomes {"layers": {"layer": <leaves stacked on axis 0>}}."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if _is_per_layer_stack(node):
            n = len(node)
            per = [walk(node[f"layer_{i}"]) for i in range(n)]
            return {"layers": {"layer": jax.tree.map(
                lambda *xs: jnp.stack(xs, axis=0), *per)}}
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def params_from_scan(params):
    """Scan layout -> per-layer tree (exact inverse of params_to_scan)."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if _is_scanned_stack(node):
            stacked = node["layers"]["layer"]
            n = jax.tree.leaves(stacked)[0].shape[0]
            return {f"layer_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
                    for i in range(n)}
        return {k: walk(v) for k, v in node.items()}

    return walk(params)
