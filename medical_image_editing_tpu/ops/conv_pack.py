"""Lane-packed implicit-GEMM 3×3 convolution (Pallas, round-4 experiment).

Why: the flagship nets run 3×3 convs at reference-parity widths (C = 32 in
/ 32 out). XLA's TPU conv emitter contracts onto the 128×128 MXU with the
output-channel dimension in the N position, so Cout = 32 occupies 25% of
the array — the round-2 standalone measurement (~50 TFLOP/s bf16 = 25% of
peak) sits exactly at that bound, and the round-4 profiler trace shows the
conv fusions as the largest irreducible bucket once the InstanceNorm stats
are lane-packed (PERF.md).

The trick: pack FOUR horizontally-adjacent output pixels' channels into one
128-wide N dimension. Output cols are grouped in fours; each group's
4·Cout = 128 outputs are one GEMM row set against a patch vector of the
3 rows × 6 cols × Cin = 576 inputs its four 3×3 windows span. The GEMM is
then (M, 576) @ (576, 128):

  * N = 128 → full MXU width (vs 32/128 = 25%);
  * K = 576 → 4.5 full K-tiles;
  * FLOP overhead = (6·Cin·4·Cout) / (4·9·Cin·Cout) = 2/3·... = 2.0×
    (each group's GEMM touches all 18 patch columns for all 4 outputs,
    where the true conv needs 9) — so the theoretical net win over an
    emitter pinned at 25% N-occupancy is 2×.

Layout engineering (everything stays 128-lane-aligned):
  * the input is padded (+1 row top/bottom, +4 cols each side, zeros —
    SAME semantics) and reshaped to (B, H+2, G+2, 4·Cin = 128 lanes),
    G = W/4 col groups;
  * the packed weight Wbig (576, 128) is built once per call from the
    (3,3,Cin,Cout) kernel: Wbig[(i·6+s)·Cin+ci, q·Cout+co] =
    w[i, s−q, ci, co] for 0 ≤ s−q ≤ 2 (s = halo col 0..5, q = in-group
    output col 0..3), zero elsewhere;
  * each kernel instance DMAs a (TR+2)-row band of the padded image
    HBM→VMEM (row tiles overlap by 2 — BlockSpec can't express that, a
    manual async copy can), assembles the (TR·G, 576) patch matrix with
    18 static strided-free lane-slice copies, and runs one MXU GEMM.

The reference has no custom kernels at all (torch/cuDNN end to end); this
is TPU-first design in the same spirit as ops/vq_pallas.py. Measured
win-or-rejection lives in PERF.md ("Pallas lane-packed conv");
tools/bench_pallas_conv.py reproduces it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# s = q + v for output in-group col q (0..3) and kernel tap v (0..2);
# halo col s maps to (group offset, in-group position) of the padded input
_S_TO_GROUP_POS = ((0, 3), (1, 0), (1, 1), (1, 2), (1, 3), (2, 0))


def pack_weights(w):
    """(3,3,Cin,Cout) HWIO → (3·6·Cin, 4·Cout) GEMM operand (f32/bf16 kept)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "packed path is specialized to 3x3"
    wb = jnp.zeros((3, 6, cin, 4, cout), w.dtype)
    for q in range(4):
        for v in range(3):
            wb = wb.at[:, q + v, :, q, :].set(w[:, v, :, :])
    return wb.reshape(3 * 6 * cin, 4 * cout)


def _kernel(x_hbm, wbig, out_ref, xtile, sem, *, tr, g, cin):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tr, tr + 2)], xtile, sem
    )
    dma.start()
    dma.wait()
    # Patch assembly happens on the VALUE (vector) level, not via ref
    # slices: Mosaic's memref_slice requires sublane-tiling-aligned offsets
    # (the group dim is sublane-tiled in the rank-3 VMEM tile), while value
    # slices at offsets 1/2 and 32-lane sub-extractions lower to supported
    # sublane-shift / lane-rotate relayouts.
    xv = xtile[:]  # (tr+2, gp, 4·cin)
    m = tr * g
    pieces = []
    for i in range(3):
        for o, pos in _S_TO_GROUP_POS:
            pieces.append(
                jax.lax.slice(
                    xv, (i, o, pos * cin), (i + tr, o + g, (pos + 1) * cin)
                ).reshape(m, cin)
            )
    patches = jnp.concatenate(pieces, axis=1)  # (m, 18·cin)
    acc = jnp.dot(patches, wbig[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(tr, g, wbig.shape[1]).astype(out_ref.dtype)


@jax.custom_vjp
def conv3x3_packed_trainable(x, w):
    """conv3x3_packed with an analytic backward:

      dx = conv3x3_packed(dy, rot180(w)ᵀ)   — the input-gradient of a SAME
           stride-1 3×3 conv is itself a SAME 3×3 conv with the kernel
           spatially flipped and channel-transposed, so it rides the same
           lane-packed MXU path (the decoder backward is ~69% of the
           flagship step, PERF.md trace);
      dw = XLA's transposed conv (conv is linear in w; `jax.vjp` of the
           reference conv wrt w only — no dx double-compute). The weight-
           gradient GEMM has K = B·H·W and tiny M/N, a different shape
           class the packed trick does not help.
    """
    return conv3x3_packed(x, w)


def _c3p_fwd(x, w):
    return conv3x3_packed(x, w), (x, w)


def _c3p_bwd(res, dy):
    x, w = res
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3_packed(dy, w_t.astype(dy.dtype))

    def ref_conv(wv):
        return jax.lax.conv_general_dilated(
            x, wv, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(ref_conv, w)
    (dw,) = vjp(dy.astype(x.dtype))
    return dx.astype(x.dtype), dw


conv3x3_packed_trainable.defvjp(_c3p_fwd, _c3p_bwd)


def packed_eligible(x_shape, kernel_size, strides, padding, dilation,
                    groups: int, row_tile: int = 64) -> bool:
    """Static eligibility for the packed path: SAME stride-1 undilated 3×3,
    no feature groups, W % 4 == 0, H % row_tile == 0, 4·Cin lane-aligned."""
    if tuple(kernel_size) != (3, 3) or groups != 1:
        return False
    if strides not in (None, 1, (1, 1)) or dilation not in (None, 1, (1, 1)):
        return False
    if not (padding == "SAME" or padding == [(1, 1), (1, 1)]
            or padding == ((1, 1), (1, 1))):
        return False
    if len(x_shape) != 4:
        return False
    import math

    _, h, wdt, cin = x_shape
    # gcd(H, 64) < 8 would force inefficiently thin row tiles on TPU.
    # Cin is pinned to exactly 32 (one lane tile): it is the only measured
    # win shape (PERF.md — C=64 is a slight loss), and wider channels blow
    # the VMEM budget (the (tr·g, 18·cin) patch value scales linearly with
    # cin: 4.7 MB at 32, 23.6 MB at 160 → scoped-vmem OOM).
    return wdt % 4 == 0 and math.gcd(h, row_tile) >= 8 and cin == 32


def conv3x3_packed(x, w, *, row_tile: int = 64, interpret: bool = False):
    """SAME 3×3 conv, NHWC, via the lane-packed GEMM kernel.

    x: (B, H, W, Cin) — W % 4 == 0, H % row_tile == 0, 4·Cin and 4·Cout
    must be 128-lane friendly (the flagship case is Cin = Cout = 32).
    Returns (B, H, W, Cout) in x.dtype.
    """
    import math

    b, h, wdt, cin = x.shape
    _, _, _, cout = w.shape
    assert wdt % 4 == 0, (h, wdt)
    # largest power-of-two-ish tile that divides H (gcd with the request)
    row_tile = math.gcd(h, row_tile)
    # Mosaic lane slices must be 128-aligned: the 4-pixel packing needs
    # 4·Cin a multiple of one lane tile (Cin = 16 would need an 8-pixel
    # packing); unaligned channel counts run the interpreter everywhere
    # (packed_eligible gates production dispatch to aligned shapes only)
    interpret = interpret or (4 * cin) % 128 != 0
    g = wdt // 4
    tr = row_tile
    # group dim of the packed view is sublane-tiled on TPU: pad G+2 up to a
    # multiple of 8 so the halo-band DMA shape is tiling-aligned
    gp = -(-(g + 2) // 8) * 8

    xp = jnp.pad(x, ((0, 0), (1, 1), (4, 4 + 4 * (gp - g - 2)), (0, 0)))
    xv = xp.reshape(b, h + 2, gp, 4 * cin)
    wbig = pack_weights(w.astype(x.dtype))

    kern = functools.partial(_kernel, tr=tr, g=g, cin=cin)

    def call(xv, wbig, *, interp):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (b, h // tr, tr, g, 4 * cout), x.dtype
            ),
            grid=(b, h // tr),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tr, g, 4 * cout), lambda i, t: (i, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tr + 2, gp, 4 * cin), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interp,
        )(xv, wbig)

    if interpret:
        out = call(xv, wbig, interp=True)
    else:
        # Decide per LOWERING platform, not per process: host-CPU staging
        # (`jax.default_device(cpu)` init, the CPU twins, virtual meshes)
        # must run the interpreter even when the default backend is a TPU.
        out = jax.lax.platform_dependent(
            xv, wbig,
            cpu=functools.partial(call, interp=True),
            default=functools.partial(call, interp=False),
        )
    return out.reshape(b, h, g, 4, cout).reshape(b, h, wdt, cout)
