"""Post-training int8 quantization for TPU serving.

Reference parity: the reference exports int8-quantized TFLite models
calibrated on a representative dataset (reference: export_tflite.py:29-41).
Here the quantized path is TPU-native: symmetric int8 (per-tensor activation
scale, per-output-channel weight scale), convolutions executed as s8 x s8 ->
s32 on the MXU (`preferred_element_type=int32`), dequantize + bias fused by
XLA into the conv epilogue. No graph rewriting: a flax method interceptor
(`nn.intercept_methods`) swaps every `nn.Conv.__call__` for the int8 kernel,
so all model families in the zoo quantize without per-model code.

Why int8 on TPU: the artifact is ~4x smaller than the float checkpoint and
the weight HBM traffic halves. Measured on this chip (bench_int8.py), XLA
does not currently lower these s8 convs onto the MXU's int8 fast path, so
throughput is ~0.75x bf16 — int8 here is a deployment-size/memory feature
(like the reference's int8 TFLite export), not the default serving mode;
bf16 remains the fast path.

Usage::

    scales = calibrate(model, variables, rep_batches, train=False)
    q_apply = quantized_apply(model, scales)       # same signature as apply
    out = jax.jit(q_apply)(variables, x, train=False)
"""
from __future__ import annotations

import json
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _as_pair(v) -> tuple[int, int]:
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


def _conv_path(module: nn.Module) -> str:
    return "/".join(module.path)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

def _make_observer(stats: dict[str, float]):
    """Interceptor recording the abs-max of every nn.Conv input into stats."""

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, nn.Conv) and context.method_name == "__call__":
            path = _conv_path(m)
            amax = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            stats[path] = max(stats.get(path, 0.0), amax)
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate(
    model: nn.Module,
    variables,
    batches: Iterable[Any],
    **apply_kwargs,
) -> dict[str, float]:
    """Run representative batches, recording the abs-max of every nn.Conv
    input. Returns {module_path: absmax} — the activation scale table.

    Runs eagerly (outside jit) so the maxima can be read back; calibration is
    a one-time cost, typically a handful of batches.
    """
    stats: dict[str, float] = {}
    with nn.intercept_methods(_make_observer(stats)):
        for batch in batches:
            model.apply(variables, batch, **apply_kwargs)
    return stats


def calibrate_engine(engine, batches_u8: Iterable[Any]) -> dict[str, float]:
    """Calibrate through a PoseEngine's own forward path (handles per-family
    normalization — plain /255 for OpenPose, ImageNet mean/std inside PifPaf —
    and fused-decode engines uniformly). batches_u8: uint8 [B,H,W,3] arrays.

    Returns the scale table to pass as PoseEngine(..., quant_scales=...)."""
    stats: dict[str, float] = {}
    model = engine.model
    with nn.intercept_methods(_make_observer(stats)):
        for b in batches_u8:
            b = jnp.asarray(b)
            if engine.fused_decode is not None:
                engine.fused_decode(engine.variables, b)
            else:
                x = b.astype(model.dtype) / 255.0
                model.apply(engine.variables, x, train=False)
    return stats


def quantize_engine(engine, batches_u8: Iterable[Any], skip=None):
    """Calibrate on representative uint8 batches and return an int8 clone of
    the engine (same model/weights/decoder; convs run s8 x s8 -> s32 on the
    MXU). The original engine is untouched."""
    from .runtime.engine import PoseEngine

    scales = calibrate_engine(engine, batches_u8)
    if skip is not None:
        scales = {k: v for k, v in scales.items() if not skip(k)}
    return PoseEngine(
        engine.model, engine.variables, input_hw=engine.input_hw,
        max_batch_size=engine.max_batch_size, decoder=engine.decoder,
        topology=engine.topology, keep_ratio=engine.keep_ratio,
        fused_decode=engine.fused_decode, quant_scales=scales,
        input_format=engine.input_format,
    )


# ---------------------------------------------------------------------------
# Quantized apply
# ---------------------------------------------------------------------------

def _quantized_conv(m: nn.Conv, x: jax.Array, s_in: float) -> jax.Array:
    """Symmetric-int8 replacement for a bound nn.Conv's forward."""
    params = m.variables["params"]
    kernel = params["kernel"].astype(jnp.float32)  # [kh, kw, cin/g, cout]
    out_dtype = x.dtype

    # Per-output-channel weight scale.
    s_w = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8
    ) / 127.0  # [cout]
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)

    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / s_in)), -127, 127
    ).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=_as_pair(m.strides),
        padding=m.padding if isinstance(m.padding, str) else m.padding,
        rhs_dilation=_as_pair(m.kernel_dilation),
        dimension_numbers=dn,
        feature_group_count=m.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_w * jnp.float32(s_in))
    if m.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def make_interceptor(
    scales: dict[str, float],
    skip: Callable[[str], bool] | None = None,
):
    """Flax method interceptor that swaps calibrated nn.Convs for the int8
    kernel. Use inside `nn.intercept_methods(...)` around any code that calls
    `model.apply` (the engine wraps its fused forward+decode step this way)."""

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if not (isinstance(m, nn.Conv) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        path = _conv_path(m)
        s_abs = scales.get(path)
        if not s_abs or (skip is not None and skip(path)):
            return next_fun(*args, **kwargs)
        return _quantized_conv(m, args[0], s_abs / 127.0)

    return interceptor


def quantized_apply(
    model: nn.Module,
    scales: dict[str, float],
    skip: Callable[[str], bool] | None = None,
) -> Callable:
    """Returns a drop-in replacement for `model.apply` in which every nn.Conv
    whose path has a calibration scale runs in int8. Jit-safe (scales are
    Python floats baked into the trace).

    `skip(path) -> True` keeps a given conv in the float path (e.g. the final
    head conv when its accuracy is critical).
    """
    interceptor = make_interceptor(scales, skip)

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, *args, **kwargs)

    return apply_fn


# ---------------------------------------------------------------------------
# Export (int8 weight file + scale table — the .tflite-int8 analog)
# ---------------------------------------------------------------------------

def export_quantized(
    model: nn.Module, variables, scales: dict[str, float], path: str
) -> str:
    """Save an int8 serving artifact: every calibrated conv kernel stored as
    int8 with its per-channel scales, everything else float32. ~4x smaller
    than the float checkpoint, and exact: dequantize(int8) re-quantizes to
    the identical int8 under `quantized_apply` (w = q*s  =>  round(w/s) = q).

    The conv paths in `scales` index straight into variables['params']:
    path 'a/b/conv' <-> params['a']['b']['conv']['kernel'].
    """
    del model  # kept for API symmetry with quantized_apply
    params = variables["params"] if "params" in variables else variables
    flat: dict[str, np.ndarray] = {}
    for p, amax in scales.items():
        if not amax:
            continue
        node = params
        for seg in p.split("/"):
            node = node[seg]
        kernel = np.asarray(node["kernel"], np.float32)
        s_w = np.maximum(np.max(np.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        flat[f"q::{p}::w_q"] = np.clip(
            np.round(kernel / s_w), -127, 127
        ).astype(np.int8)
        flat[f"q::{p}::s_w"] = s_w.astype(np.float32)
    leaves, _ = jax.tree_util.tree_flatten_with_path(variables)
    for kp, leaf in leaves:
        flat["f::" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    flat["__scales__"] = np.frombuffer(
        json.dumps(scales).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **flat)
    return path


def load_quantized(path: str) -> tuple[dict[str, float], dict[str, np.ndarray]]:
    """Load the int8 artifact: (activation scale table, flat tensor dict).
    The flat dict keys are as written by export_quantized; callers wanting a
    float variables tree can dequantize q::*::w_q with q::*::s_w."""
    with np.load(path) as z:
        scales = json.loads(bytes(z["__scales__"]).decode())
        tensors = {k: z[k] for k in z.files if k != "__scales__"}
    return scales, tensors


def dequantized_params(variables, tensors: dict[str, np.ndarray]):
    """Rebuild a float variables tree from a loaded int8 artifact, replacing
    each quantized conv kernel with s_w * w_q (exact under re-quantization)."""
    import copy

    out = jax.tree_util.tree_map(lambda a: a, variables)  # shallow-ish copy
    out = jax.device_get(out)
    out = copy.deepcopy(out)
    params = out["params"] if "params" in out else out
    paths = {k.split("::")[1] for k in tensors if k.startswith("q::")}
    for p in paths:
        node = params
        for seg in p.split("/"):
            node = node[seg]
        node["kernel"] = (
            tensors[f"q::{p}::w_q"].astype(np.float32)
            * tensors[f"q::{p}::s_w"]
        )
    return out
