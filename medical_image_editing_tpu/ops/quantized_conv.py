"""int8 post-training quantization of flax convolutions, for the serving path.

VERDICT r2 next-round item 6: the interactive edit decode is MXU-bound at
bf16 (44.8 ms @512², PERF.md) and v5e's int8 MXU rate is ~2× bf16 — an
int8-quantized decoder is the untried TPU-native serving lever. This module
provides it WITHOUT touching the model code or parameter tree:

`quantize_convs("int8")` is a context manager that installs a flax method
interceptor (`nn.intercept_methods`) replacing every `nn.Conv.__call__`
executed inside it with an int8 implementation that REUSES the module's
existing f32 kernel/bias parameters:

  * activations: dynamic per-INPUT-CHANNEL symmetric quantization
    (scale_x[c] = amax|x[..., c]| / 127). Per-channel activation scales are
    exact to fold because a conv is linear in each input channel:
    conv(x, K) = conv(x/scale_x, K·scale_x) — so the scales are folded into
    the kernel before the kernel's own quantization. This matters in a U-Net,
    where skip-concats mix channels with wildly different ranges and a
    per-tensor scale would crush the small ones (measured: per-tensor gave
    5.7% mean output error on a random-init decoder; per-channel 10×
    tighter);
  * weights: per-output-channel symmetric quantization of the folded kernel
    (scale_w[o] = amax|(K·scale_x)[..., o]| / 127) — recomputed on-device
    per call (elementwise over the kernel, a few µs against a multi-ms
    conv);
  * accumulation: `lax.conv_general_dilated` on int8 operands with
    `preferred_element_type=int32` — the MXU's native s8×s8→s32 path;
  * dequantization: y = acc · scale_w + bias, in float32 (scale_x already
    lives inside scale_w).

Because interception happens at call time and changes no parameter names,
the same checkpoint serves f32, bf16, and int8 decodes; selection is a
serving flag (`--dtype int8` on edit-batch / serve-edit). Accuracy against
the f32 decode is pinned in tests/test_quantized_conv.py; the measured
latency/throughput is in PERF.md ("int8 serving decode") — **a measured
rejection for the flagship decoder**: at 512² the convs are HBM-bound and
the three extra memory passes dynamic quantization adds (activation amax,
s8 convert, s32 dequant) cost more than the s8 MXU rate saves (82.4 vs
77.2 ms single-slice, 39.4 vs 53.8 slices/s batched, 2026-08-20). The seam
stays for static-calibrated quantization at MXU-bound widths.

The reference has no quantization story at all (torch fp32 end to end,
`src/run_recon.py`); this is new TPU-first serving design, not a port.
"""

import contextlib
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _quantize_sym(x, axes, dtype=jnp.int8):
    """Symmetric linear quantization of `x` over `axes` → (q, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(dtype)
    return q, scale


def int8_conv_call(mod: nn.Conv, x: jax.Array) -> jax.Array:
    """int8 re-implementation of `nn.Conv.__call__` for the configurations the
    models in this package use (2-D NHWC, feature_group_count=1, no masks,
    no input_dilation). Parameters are fetched through `mod.param`, i.e. the
    SAME variables nn.Conv created — interception changes nothing about the
    checkpoint format."""
    assert mod.feature_group_count == 1 and mod.mask is None
    kernel_size = tuple(mod.kernel_size)
    ndim = len(kernel_size)
    in_features = x.shape[-1]
    kernel_shape = kernel_size + (in_features, mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kernel_shape, mod.param_dtype)
    bias = (
        mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        if mod.use_bias
        else None
    )

    # per-input-channel activation scales, folded into the kernel (exact:
    # conv is linear per input channel), then per-output-channel weight
    # scales on the folded kernel.
    xq, x_scale = _quantize_sym(x, axes=tuple(range(x.ndim - 1)))
    k_fold = kernel.astype(jnp.float32) * x_scale.reshape((1,) * ndim + (-1, 1))
    kq, k_scale = _quantize_sym(k_fold, axes=tuple(range(ndim + 1)))

    def _per_dim(v):
        return tuple(np.broadcast_to(np.asarray(v if v is not None else 1), (ndim,)).tolist())

    strides = _per_dim(mod.strides)
    dilation = _per_dim(mod.kernel_dilation)
    padding = mod.padding
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [tuple(p) for p in padding]

    dn = lax.conv_dimension_numbers(
        x.shape, kernel_shape,
        ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NDHWC", "DHWIO", "NDHWC"),
    )
    acc = lax.conv_general_dilated(
        xq, kq, window_strides=strides, padding=pad,
        rhs_dilation=dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    # k_scale has shape (1,)*ndim+(1, features) → squeeze to (features,);
    # the activation scales are already inside it via the fold.
    out = acc.astype(jnp.float32) * k_scale.reshape(-1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(mod.dtype or jnp.float32)


def _make_interceptor(mode: str):
    def interceptor(next_fun, args, kwargs, context):
        if (
            mode == "int8"
            and isinstance(context.module, nn.Conv)
            and context.method_name == "__call__"
        ):
            return int8_conv_call(context.module, *args, **kwargs)
        return next_fun(*args, **kwargs)

    return interceptor


@contextlib.contextmanager
def quantize_convs(mode: Optional[str]):
    """Context manager: while active, every flax `nn.Conv.__call__` runs the
    int8 path. `mode=None` is a no-op (so call sites can pass the config value
    straight through). Use around `decoder.apply(...)` inside a traced fn —
    interception is trace-time, so the quantized graph is what XLA compiles."""
    if mode is None:
        yield
        return
    if mode != "int8":
        raise ValueError(f"unknown quantization mode {mode!r}")
    with nn.intercept_methods(_make_interceptor(mode)):
        yield
