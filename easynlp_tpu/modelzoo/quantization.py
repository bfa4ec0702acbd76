"""Weight-only int8 post-training quantization for inference/serving.

TPU-native design: weights are stored in HBM as int8 with per-output-channel
float32 scales and dequantized INSIDE the jitted forward — XLA fuses the
`convert + multiply` into the consumer matmul's operand read, so HBM weight
traffic drops ~4x (vs f32) while the MXU still runs its native bf16/f32
path. For small-batch online serving the weight stream is the dominant HBM
load, so this directly cuts latency; accuracy cost is bounded by symmetric
per-channel rounding (~0.2-0.4% relative weight error).

This is a capability the reference does not have (its serving path is
torch eager fp32/fp16); it completes the production-serving story next to
`--mode=serve`. No model-module changes: quantized leaves are marker
subtrees {"__int8_weight__", "scale"} in an otherwise ordinary params dict,
and `dequantize_params` is the identity on unquantized trees.
"""

import jax
import jax.numpy as jnp
import numpy as np

QKEY = "__int8_weight__"

# substrings of param paths NEVER quantized: tiny and/or precision-critical
DEFAULT_SKIP = ("layernorm", "layer_norm", "ln_", "_ln", "norm", "bias",
                "embed", "temb", "scale", "shift")


def _is_qleaf(x):
    return isinstance(x, dict) and QKEY in x


def _quantize_leaf(w):
    """Symmetric per-output-channel int8: q in [-127, 127], w ≈ q * scale
    with scale = max|w| over the input-feature axis (ndim-2) / 127.

    Reducing ONLY the input axis (not all leading axes) keeps scales
    independent per leading dim: nn.scan-stacked kernels [L, in, out] get
    per-(layer, out-channel) scales instead of one vector shared across all
    L layers (where a single outlier layer would inflate everyone's rounding
    error), and conv kernels [h, w, in, out] get per-(tap, out) scales —
    finer than per-out at negligible scale-memory cost."""
    w32 = np.asarray(w, np.float32)
    reduce_axes = (w32.ndim - 2,)
    absmax = np.max(np.abs(w32), axis=reduce_axes, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.round(w32 / safe), -127, 127).astype(np.int8)
    return {QKEY: jnp.asarray(q), "scale": jnp.asarray(scale)}


def quantize_params(params, skip=DEFAULT_SKIP, min_size=4096):
    """Returns a params tree where every float kernel with ndim >= 2,
    size >= min_size, and no `skip` substring in its path is replaced by an
    int8 marker subtree. Everything else passes through untouched."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + "/" + k.lower())
                    for k, v in node.items()}
        arr = node
        if (hasattr(arr, "ndim") and arr.ndim >= 2
                and arr.size >= min_size
                and jnp.issubdtype(jnp.asarray(arr).dtype, jnp.floating)
                and not any(s in path for s in skip)):
            return _quantize_leaf(arr)
        return arr

    return walk(params, "")


def dequantize_params(params, dtype=jnp.float32):
    """Inverse of quantize_params; identity on unquantized trees. Call this
    INSIDE the jitted forward so the int8 tensors stay resident in HBM and
    XLA fuses the dequant into each consumer."""

    def walk(node):
        if _is_qleaf(node):
            return (node[QKEY].astype(dtype) *
                    node["scale"].astype(dtype))
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


CAST_SKIP = ("layernorm", "layer_norm", "ln_", "_ln", "norm", "bias",
             "scale", "shift")


def cast_params(params, dtype=jnp.bfloat16, skip=CAST_SKIP):
    """Serving-side weight cast: float leaves -> `dtype`, except paths
    containing a `skip` substring (LayerNorm scale/shift, biases — tiny
    and precision-sensitive) which stay as loaded.

    Checkpoints store f32 params and the compute dtype is usually bf16, so
    every serving matmul already rounds its operands to bf16 — but the HBM
    WEIGHT STREAM, which bounds small-batch decode throughput, stays f32.
    Casting the kernels (incl. embeddings: GPT-2's tied lm head streams
    the [V, E] table every step) halves those bytes with no change to what
    the MXU computes. Unlike int8 this needs no dequant in-trace, so there
    is nothing for XLA to materialise. Composes with quantize_params
    (int8 marker subtrees pass through untouched; quantize first, then
    cast the remainder)."""

    def walk(node, path):
        if _is_qleaf(node):
            return node
        if isinstance(node, dict):
            return {k: walk(v, path + "/" + k.lower())
                    for k, v in node.items()}
        arr = node
        if (hasattr(arr, "dtype")
                and jnp.issubdtype(jnp.asarray(arr).dtype, jnp.floating)
                and not any(s in path for s in skip)):
            return jnp.asarray(arr, dtype)
        return arr

    return walk(params, "")


def dequantize_for(module, params):
    """dequantize_params at the MODULE'S compute dtype.

    The consumer matmuls read their operands at `module.dtype` regardless,
    so dequantizing a bf16 module's kernels straight to bf16 is bit-
    identical at the MXU — while any dequant XLA hoists out of a decode
    while_loop (loop-invariant code motion materializes the dequantized
    tree) then streams HALF the HBM bytes of the f32 default. Measured on
    v5e GPT-2-base decode (B=8): f32 dequant ran 0.84x the fp baseline;
    this is the fix. Falls back to float32 for modules without a dtype
    (and for f32 modules it is exactly the old behavior)."""
    return dequantize_params(
        params, dtype=getattr(module, "dtype", None) or jnp.float32)


def is_quantized(params):
    found = [False]

    def walk(node):
        if _is_qleaf(node):
            found[0] = True
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)

    walk(params)
    return found[0]


def quantization_report(params):
    """(quantized_bytes, original_equiv_bytes, n_quantized_leaves) — for
    logging the HBM saving."""
    qbytes, obytes, n = [0], [0], [0]

    def walk(node):
        if _is_qleaf(node):
            q, s = node[QKEY], node["scale"]
            qbytes[0] += q.size * 1 + s.size * 4
            obytes[0] += q.size * 4
            n[0] += 1
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif hasattr(node, "size"):
            b = node.size * np.dtype(node.dtype).itemsize
            qbytes[0] += b
            obytes[0] += b

    walk(params)
    return qbytes[0], obytes[0], n[0]
