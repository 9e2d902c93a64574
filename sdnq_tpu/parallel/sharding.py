"""Sharding rules for quantized parameter pytrees.

The TPU-native answer to the reference's FSDP2 hooks
(/root/reference/src/sdnq/training/tensor.py:141-160): instead of shipping
{weight, scale, zero_point, svd} component lists through c10d all-gathers,
each QTensor leaf gets its own NamedSharding, chosen **jointly** so the
group-wise scales shard consistently with their weight axis (SURVEY §7 hard
part 3) and GSPMD moves the *quantized* bytes over ICI.

Sharding modes per parameter:
  * "col"   — shard output channels (megatron column-parallel): qdata rows,
              scales rows, svd_up rows shard; svd_down replicates.
  * "row"   — shard input channels (row-parallel): only for unpacked
              storage whose groups divide evenly across shards (the packed
              bit-plane layout spans the whole row, so packed weights
              column- or fsdp-shard instead).
  * "fsdp"  — shard output channels over the fsdp axis (ZeRO-3 analogue;
              gathered on use, in quantized form).
  * None    — replicate.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tensor import QTensor
from ..policy import check_param_name_in
from ..apply import _flatten_with_paths

__all__ = ["qtensor_shardings", "shard_params", "logical_axis_rules"]


def _spec(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def _spec_for(mesh: Mesh, shape, *axes) -> NamedSharding:
    """Like _spec but drops any axis whose mesh extent doesn't divide the
    corresponding array dimension (falls back to replication on that dim)."""
    fixed = []
    for i, ax in enumerate(axes):
        if ax is None:
            fixed.append(None)
            continue
        n = mesh.shape[ax]
        if i < len(shape) and shape[i] % n == 0 and shape[i] >= n:
            fixed.append(ax)
        else:
            fixed.append(None)
    return NamedSharding(mesh, P(*fixed))


def qtensor_shardings(qt: QTensor, mesh: Mesh, mode: str | None,
                      axis: str = "tensor") -> QTensor:
    """Build a QTensor of NamedShardings matching `qt`'s leaves."""
    meta = qt.meta
    repl = _spec(mesh)
    if mode in ("col", "fsdp"):
        ax = "fsdp" if mode == "fsdp" else axis
        qd = _spec_for(mesh, qt.qdata.shape, ax,
                       *([None] * (qt.qdata.ndim - 1)))
        sc = _spec_for(mesh, qt.scale.shape, ax,
                       *([None] * (qt.scale.ndim - 1)))
        zp = None if qt.zero_point is None else sc
        up = (None if qt.svd_up is None
              else _spec_for(mesh, qt.svd_up.shape, ax, None))
        down = None if qt.svd_down is None else repl
    elif mode == "row":
        if meta.is_packed:
            # packed rows can't split along C — replicate instead
            return qtensor_shardings(qt, mesh, None, axis)
        # unpacked (O, C) / grouped (O, G, g): shard C (or G) axis
        qd = _spec_for(mesh, qt.qdata.shape, None, axis,
                       *([None] * (qt.qdata.ndim - 2)))
        sc = _spec_for(mesh, qt.scale.shape, None, axis,
                       *([None] * (qt.scale.ndim - 2)))
        zp = None if qt.zero_point is None else sc
        up = None if qt.svd_up is None else repl
        down = (None if qt.svd_down is None
                else _spec_for(mesh, qt.svd_down.shape, None, axis))
    else:
        qd = sc = repl
        zp = None if qt.zero_point is None else repl
        up = None if qt.svd_up is None else repl
        down = None if qt.svd_down is None else repl
    return QTensor(qdata=qd, scale=sc, zero_point=zp, svd_up=up,
                   svd_down=down, meta=meta)


def _array_sharding(path: str, leaf, mesh: Mesh, mode: str | None,
                    axis: str) -> NamedSharding:
    if mode in ("col", "fsdp") and getattr(leaf, "ndim", 0) >= 1:
        ax = "fsdp" if mode == "fsdp" else axis
        return _spec_for(mesh, leaf.shape, ax, *([None] * (leaf.ndim - 1)))
    if mode == "row" and getattr(leaf, "ndim", 0) >= 2:
        return _spec_for(mesh, leaf.shape, None, axis,
                         *([None] * (leaf.ndim - 2)))
    return _spec(mesh)


def _shift_spec(sh: NamedSharding, mesh: Mesh) -> NamedSharding:
    """Prepend a replicated leading (layer-stack) dimension to a spec."""
    return NamedSharding(mesh, P(None, *sh.spec))


def shard_params(params, mesh: Mesh, rules: dict[str, str | None],
                 default: str | None = None, axis: str = "tensor",
                 stacked_prefixes: tuple = ("transformer_blocks.rest",
                                            "single_transformer_blocks.rest",
                                            "transformer_blocks",
                                            "single_transformer_blocks")):
    """Apply NamedShardings to a param pytree via jax.device_put.

    `rules` maps name patterns (policy.check_param_name_in semantics) to a
    mode in {"col", "row", "fsdp", None}.  Bias vectors follow their
    layer's mode for "col"/"fsdp" (they are per-output-channel).

    Scan-stacked block params (models.stack_dit_blocks) carry a leading
    layer axis: leaves whose path starts with a `stacked_prefixes` entry
    NOT followed by a numeric index get their spec shifted right by one
    (layer axis replicated)."""
    flat, treedef = _flatten_with_paths(params)
    out = []
    for path, leaf in flat:
        match = check_param_name_in(path, list(rules))
        mode = rules[match] if match is not None else default
        def _is_stacked(path):
            for pfx in stacked_prefixes:
                if not path.startswith(pfx + "."):
                    continue
                head = path[len(pfx) + 1:].split(".")[0]
                # numeric -> plain list entry; "first" -> unstacked hetero
                # head block (stack_dit_blocks)
                if not head.isdigit() and head != "first":
                    return True
            return False
        stacked = _is_stacked(path)
        if isinstance(leaf, QTensor):
            if stacked:
                # validate axes against the per-layer (unstacked) shapes,
                # then shift the specs right past the layer axis
                def strip(a):
                    return None if a is None else jax.ShapeDtypeStruct(
                        a.shape[1:], a.dtype)
                virt = QTensor(qdata=strip(leaf.qdata),
                               scale=strip(leaf.scale),
                               zero_point=strip(leaf.zero_point),
                               svd_up=strip(leaf.svd_up),
                               svd_down=strip(leaf.svd_down),
                               meta=leaf.meta)
                sh = qtensor_shardings(virt, mesh, mode, axis)
                sh = QTensor(
                    qdata=_shift_spec(sh.qdata, mesh),
                    scale=_shift_spec(sh.scale, mesh),
                    zero_point=None if sh.zero_point is None
                    else _shift_spec(sh.zero_point, mesh),
                    svd_up=None if sh.svd_up is None
                    else _shift_spec(sh.svd_up, mesh),
                    svd_down=None if sh.svd_down is None
                    else _shift_spec(sh.svd_down, mesh),
                    meta=sh.meta)
            else:
                sh = qtensor_shardings(leaf, mesh, mode, axis)
            out.append(jax.device_put(leaf, sh))
        elif hasattr(leaf, "ndim"):
            if path.endswith("bias") and mode == "row":
                mode_eff = None  # row-parallel bias is replicated
            else:
                mode_eff = mode
            if stacked:
                # size the spec against the per-layer shape, then shift
                virt = jax.ShapeDtypeStruct(leaf.shape[1:], leaf.dtype)
                sh = _shift_spec(
                    _array_sharding(path, virt, mesh, mode_eff, axis), mesh)
            else:
                sh = _array_sharding(path, leaf, mesh, mode_eff, axis)
            out.append(jax.device_put(leaf, sh))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


# Default tensor-parallel rules for the Flux-style DiT (column-shard the
# fan-out projections, row-shard the fan-in projections).
DIT_TP_RULES = {
    "qkv": "col",
    "fc1": "col",
    "linear1": "col",
    "proj": "row",
    "fc2": "row",
    "linear2": "row",
    "img_mod": "col",
    "txt_mod": "col",
}


def logical_axis_rules(tp_rules: dict[str, str] | None = None):
    return dict(DIT_TP_RULES if tp_rules is None else tp_rules)
