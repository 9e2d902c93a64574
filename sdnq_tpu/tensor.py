"""QTensor: the quantized-parameter pytree node.

The TPU-native redesign of the reference's ``SDNQTensor`` subclass +
``SDNQDequantizer`` metadata object (/root/reference/src/sdnq/training/tensor.py:10-160,
dequantizer.py:219-356): instead of a torch.Tensor wrapper with a
__torch_dispatch__ table, a QTensor is a **registered dataclass pytree**
holding the packed storage, group-wise scales, zero-points and SVD factors
as leaves, with all shape/format/flag metadata static (hashable) so every
dispatch decision the reference makes at runtime is made at trace time and
baked into one XLA program.

QTensors therefore flow through jit / pjit / shard_map / grad unchanged, and
shard by giving each leaf its own NamedSharding (see parallel/sharding.py).

Storage layout (TPU-first, deliberately different from the reference):
  * qdata is always kept in the layer's natural orientation — linear (O, C),
    conv (O, C, *k), conv-transpose (C, O, *k), embedding (V, D) — flattened
    to 2D (lead, -1) before bit-plane packing.  No transposed/contiguous
    layout dance: XLA/Mosaic pick MXU-friendly layouts for either
    contraction orientation.
  * scale / zero_point are stored broadcast-ready against the *grouped*
    view of the weight recorded in meta.quantized_shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from .formats import Format, get_format, default_matmul_format
from .packing import pack as _pack, unpack as _unpack
from .quant.core import quantize_weight
from .quant.hadamard import apply_hadamard, rotate_hadamard
from .quant.svd import apply_svdquant

__all__ = ["QuantMeta", "QTensor", "quantize_tensor", "dequantize"]

LINEAR, CONV, CONV_TRANSPOSE, EMBEDDING = "linear", "conv", "conv_transpose", "embedding"


@dataclasses.dataclass(frozen=True)
class QuantMeta:
    """Static (trace-time) metadata for one quantized parameter."""

    fmt: str                      # storage format name (resolved)
    matmul_fmt: str               # quantized-matmul operand format
    layer_kind: str               # linear | conv | conv_transpose | embedding
    original_shape: tuple[int, ...]
    quantized_shape: tuple[int, ...]   # grouped view, e.g. (O, G, g) / (O, G, g, kh, kw)
    group_axis: int               # axis of `g` within quantized_shape
    group_size: int               # -1 = channel-wise (no sub-groups)
    use_hadamard: bool
    hadamard_group_size: int
    svd_rank: int                 # 0 = no SVD correction
    use_quantized_matmul: bool
    re_quantize_for_matmul: bool  # storage cannot feed the MXU directly
    dequant_dtype: str = "bfloat16"
    # "bitplane" (any width) or "halfsplit" (widths 1..7): the halfsplit
    # matmul layout decodes at ~1 VPU op per value per plane, which is what
    # makes the small-batch weight-only kernel HBM-bound instead of
    # VPU-bound on TPU (minifloats add the ~8-op bitcast decode)
    pack_layout: str = "bitplane"

    @property
    def format(self) -> Format:
        return get_format(self.fmt)

    @property
    def matmul_format(self) -> Format:
        return get_format(self.matmul_fmt)

    @property
    def is_packed(self) -> bool:
        return self.format.is_packed


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qdata", "scale", "zero_point", "svd_up", "svd_down",
                 "layer"],
    meta_fields=["meta"],
)
@dataclasses.dataclass
class QTensor:
    qdata: jax.Array
    scale: jax.Array
    zero_point: jax.Array | None
    svd_up: jax.Array | None
    svd_down: jax.Array | None
    meta: QuantMeta
    # Stacked-layer view (models.dit scan path): when set, qdata/scale/
    # zero_point/svd_* carry a LEADING layer axis (meta still describes one
    # layer) and ``layer`` is the traced index to read.  The int8 matmul
    # kernel consumes the stacked buffer directly via scalar-prefetch
    # BlockSpec indexing — no per-iteration dynamic-slice copy of the
    # weight bytes (XLA cannot alias a sliced operand into a custom call).
    # Paths without stacked kernel support slice explicitly
    # (layers._slice_stacked_layer), matching the old scan behavior.
    layer: jax.Array | None = None

    @property
    def shape(self) -> tuple[int, ...]:
        return self.meta.original_shape

    @property
    def ndim(self) -> int:
        return len(self.meta.original_shape)

    @property
    def dtype(self):
        return jnp.dtype(self.meta.dequant_dtype)

    def dequantize(self, dtype=None, *, with_svd: bool = True,
                   with_hadamard: bool = True) -> jax.Array:
        return dequantize(self, dtype=dtype, with_svd=with_svd,
                          with_hadamard=with_hadamard)

    def nbytes(self) -> int:
        total = self.qdata.size * self.qdata.dtype.itemsize
        for a in (self.scale, self.zero_point, self.svd_up, self.svd_down):
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total


# ---------------------------------------------------------------------------
# Group-size policy (reference: quantizer.py:171-214).
# ---------------------------------------------------------------------------

def auto_group_size(fmt: Format, layer_kind: str, has_svd: bool,
                    use_quantized_matmul: bool,
                    re_quantize_for_matmul: bool) -> int:
    if use_quantized_matmul and not re_quantize_for_matmul and fmt.num_bits >= 6:
        return -1
    if layer_kind == LINEAR:
        return 2 ** ((3 if has_svd else 2) + fmt.num_bits)
    return 2 ** ((2 if has_svd else 1) + fmt.num_bits)


def negotiate_group_count(channel: int, group_size: int) -> tuple[int, int]:
    """Largest divisor-friendly (group_size, num_groups) ≤ requested
    (reference divisor search: quantizer.py:179-193)."""
    if group_size >= channel:
        return channel, 1
    num = channel // group_size
    while num * group_size != channel:
        num -= 1
        if num <= 1:
            return channel, 1
        group_size = channel // num
    return group_size, num


# ---------------------------------------------------------------------------
# Quantize one parameter -> QTensor.
# ---------------------------------------------------------------------------

def _grouped_view(w: jax.Array, layer_kind: str, group_size: int):
    """Reshape `w` so the quantization reduction runs over a trailing-`g`
    axis; returns (grouped, group_axis, reduction_axes)."""
    if layer_kind == CONV and w.ndim > 2:
        o, c = w.shape[:2]
        g, num = negotiate_group_count(c, group_size) if group_size > 0 else (c, 1)
        if num > 1:
            grouped = w.reshape(o, num, g, *w.shape[2:])
            # reduce over g and spatial dims
            red = (2,) + tuple(range(3, grouped.ndim))
            return grouped, 2, red, g, num
        return w, 1, (1,) + tuple(range(2, w.ndim)), g, 1
    if layer_kind == CONV_TRANSPOSE and w.ndim > 2:
        c, o = w.shape[:2]
        g, num = negotiate_group_count(c, group_size) if group_size > 0 else (c, 1)
        if num > 1:
            grouped = w.reshape(num, g, o, *w.shape[2:])
            red = (1,) + tuple(range(3, grouped.ndim))
            return grouped, 1, red, g, num
        return w, 0, (0,) + tuple(range(2, w.ndim)), g, 1
    # linear / embedding / generic 2D: group the last axis
    c = w.shape[-1]
    g, num = negotiate_group_count(c, group_size) if group_size > 0 else (c, 1)
    if num > 1:
        grouped = w.reshape(*w.shape[:-1], num, g)
        return grouped, grouped.ndim - 1, (grouped.ndim - 1,), g, num
    return w, w.ndim - 1, (w.ndim - 1,), g, 1


def quantize_tensor(
    w: jax.Array,
    fmt: str | Format = "int8",
    layer_kind: str = LINEAR,
    *,
    matmul_fmt: str | None = None,
    group_size: int = 0,
    hadamard_group_size: int = 256,
    svd_rank: int = 32,
    svd_steps: int = 8,
    use_svd: bool = False,
    use_hadamard: bool = False,
    use_quantized_matmul: bool = False,
    use_stochastic_rounding: bool = False,
    dequant_dtype: str = "bfloat16",
    rng: jax.Array | None = None,
    svd_precomputed: bool = False,
) -> QTensor:
    """Quantize a weight into a QTensor (the reference's
    ``sdnq_quantize_layer_weight`` pipeline, quantizer.py:67-261, as a pure
    function)."""
    fmt = get_format(fmt) if isinstance(fmt, str) else fmt
    matmul_fmt_name = matmul_fmt or default_matmul_format(fmt.name)
    mfmt = get_format(matmul_fmt_name)
    original_shape = tuple(w.shape)
    w = w.astype(jnp.float32)

    # Can the stored representation feed the MXU directly?
    # (reference: quantizer.py:103-116)
    re_quantize = bool(
        fmt.num_bits > mfmt.num_bits
        or fmt.is_integer != mfmt.is_integer
        or (fmt.is_unsigned and not mfmt.is_integer)
        or (fmt.is_packed and not fmt.is_integer and not mfmt.is_integer
            and (fmt.num_bits >= mfmt.num_bits or fmt.max > mfmt.max))
    )
    if layer_kind == CONV_TRANSPOSE:
        use_quantized_matmul = False

    is_conv = layer_kind in (CONV, CONV_TRANSPOSE) and w.ndim > 2
    if use_hadamard:
        w, use_hadamard, hadamard_group_size = apply_hadamard(
            w, hadamard_group_size, is_conv=(layer_kind == CONV and is_conv))

    svd_up = svd_down = None
    if use_svd and w.ndim >= 2 and layer_kind != CONV_TRANSPOSE:
        w, svd_up, svd_down = apply_svdquant(
            w, rank=svd_rank, niter=svd_steps,
            key=rng if rng is not None else jax.random.key(0))
        svd_up = svd_up.astype(jnp.dtype(dequant_dtype))
        svd_down = svd_down.astype(jnp.dtype(dequant_dtype))

    if group_size == 0:
        # `svd_precomputed` marks callers (the dynamic ladder) that apply the
        # SVD residual outside this function; the group-size rule must still
        # see has_svd=True (reference: quantizer.py:171-214 computes SVD
        # before the group-size search, so SVD layers get 2^(3+bits)).
        group_size = auto_group_size(
            fmt, layer_kind, svd_up is not None or svd_precomputed,
            use_quantized_matmul, re_quantize)

    grouped, group_axis, red_axes, g, num = _grouped_view(w, layer_kind, group_size)
    re_quantize = re_quantize or num > 1

    q, scale, zero_point = quantize_weight(
        grouped, fmt, axis=red_axes, rng=rng if use_stochastic_rounding else None)

    quantized_shape = tuple(q.shape)
    if (fmt.name == "float16" and use_quantized_matmul and not re_quantize
            and not fmt.is_packed):
        # TPU has no fp16 ALU: the MXU multiplies these weights in bf16,
        # and a per-call f16->bf16 conversion of the stored tensor runs at
        # ~1/3 the GEMM rate on v5e (f16 is not a native VPU type).  Store
        # what the MXU executes.  Numerics are unchanged on the matmul
        # path (the cast happened anyway); only the <32-row dequantize
        # bailout sees bf16- instead of f16-rounded values.
        q = q.astype(jnp.bfloat16)
    pack_layout = "bitplane"
    if fmt.is_packed:
        lead = q.shape[0]
        flat_c = q.size // lead
        sr_bits = None
        if use_stochastic_rounding and rng is not None and not fmt.is_integer:
            sr_bits = jax.random.bits(rng, q.shape, jnp.uint32).reshape(lead, -1)
        # sub-byte weights use the half-split matmul layout (decode is one
        # shift+mask per value per field plane — the VPU-bound small-batch
        # regime's requirement; see packing.pack_codes_halfsplit).
        # Minifloats ride the same layout: their codes decode via the
        # bitcast fast path in the group-dot kernel (packing.decode_float)
        from .packing import halfsplit_planes
        if fmt.code_bits < 8:
            pmax = max(8 // w for w, _ in halfsplit_planes(fmt.code_bits))
            if flat_c % pmax == 0:
                pack_layout = "halfsplit"
        qdata = _pack(q.reshape(lead, -1), fmt, sr_bits=sr_bits,
                      layout=pack_layout)
    else:
        qdata = q

    meta = QuantMeta(
        fmt=fmt.name,
        matmul_fmt=mfmt.name,
        layer_kind=layer_kind,
        original_shape=original_shape,
        quantized_shape=quantized_shape,
        group_axis=group_axis,
        group_size=g if num > 1 else -1,
        use_hadamard=bool(use_hadamard),
        hadamard_group_size=hadamard_group_size,
        svd_rank=svd_rank if svd_up is not None else 0,
        use_quantized_matmul=bool(use_quantized_matmul),
        re_quantize_for_matmul=bool(re_quantize),
        dequant_dtype=dequant_dtype,
        pack_layout=pack_layout,
    )
    scale = scale.astype(jnp.float32)
    if zero_point is not None:
        zero_point = zero_point.astype(jnp.float32)
    return QTensor(qdata=qdata, scale=scale, zero_point=zero_point,
                   svd_up=svd_up, svd_down=svd_down, meta=meta)


def slice_stacked_layer(qt: QTensor) -> QTensor:
    """Materialize one layer of a stacked-view QTensor (``qt.layer``) as a
    plain QTensor — the explicit dynamic-slice fallback for paths without
    stacked-kernel support.  Equivalent in cost to what ``lax.scan``'s xs
    slicing did before the stacked view existed (one weight copy)."""
    if qt.layer is None:
        return qt
    i = qt.layer

    def sel(a):
        return None if a is None else a[i]

    return dataclasses.replace(
        qt, qdata=qt.qdata[i], scale=qt.scale[i],
        zero_point=sel(qt.zero_point), svd_up=sel(qt.svd_up),
        svd_down=sel(qt.svd_down), layer=None)


# ---------------------------------------------------------------------------
# Dequantize QTensor -> full-precision weight (reference: dequantizer.py:89-111).
# ---------------------------------------------------------------------------

def _unpacked_values(qt: QTensor) -> jax.Array:
    meta = qt.meta
    if meta.is_packed:
        lead = meta.quantized_shape[0]
        flat_c = 1
        for d in meta.quantized_shape[1:]:
            flat_c *= d
        vals = _unpack(qt.qdata, meta.format, flat_c, dtype=jnp.float32,
                       layout=meta.pack_layout)
        return vals.reshape(meta.quantized_shape)
    return qt.qdata


def dequantize(qt: QTensor, dtype=None, *, with_svd: bool = True,
               with_hadamard: bool = True) -> jax.Array:
    qt = slice_stacked_layer(qt)
    meta = qt.meta
    if dtype is None:
        dtype = jnp.dtype(meta.dequant_dtype)
    vals = _unpacked_values(qt).astype(qt.scale.dtype)
    w = vals * qt.scale
    if qt.zero_point is not None:
        w = w + qt.zero_point
    w = w.reshape(meta.original_shape)
    if with_svd and qt.svd_up is not None:
        # factors were computed on the (O, -1)-flattened weight
        corr = (qt.svd_up.astype(jnp.float32)
                @ qt.svd_down.astype(jnp.float32)).reshape(meta.original_shape)
        w = w + corr.astype(w.dtype)
    if with_hadamard and meta.use_hadamard:
        if meta.layer_kind == CONV and w.ndim > 2:
            shape = w.shape
            w = rotate_hadamard(w.reshape(shape[0], -1),
                                meta.hadamard_group_size).reshape(shape)
        else:
            w = rotate_hadamard(w, meta.hadamard_group_size)
    return w.astype(dtype)
