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


def _kernel(x_hbm, wbig, out_ref, xtile, patches, sem, *, tr, g, cin):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tr, tr + 2)], xtile, sem
    )
    dma.start()
    dma.wait()
    m = tr * g
    for i in range(3):
        for s, (o, pos) in enumerate(_S_TO_GROUP_POS):
            k = i * 6 + s
            patches[:, k * cin:(k + 1) * cin] = (
                xtile[i:i + tr, o:o + g, pos * cin:(pos + 1) * cin]
                .reshape(m, cin)
            )
    acc = jnp.dot(patches[:], wbig[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(tr, g, wbig.shape[1]).astype(out_ref.dtype)


def conv3x3_packed(x, w, *, row_tile: int = 64, interpret: bool = False):
    """SAME 3×3 conv, NHWC, via the lane-packed GEMM kernel.

    x: (B, H, W, Cin) — W % 4 == 0, H % row_tile == 0, 4·Cin and 4·Cout
    must be 128-lane friendly (the flagship case is Cin = Cout = 32).
    Returns (B, H, W, Cout) in x.dtype.
    """
    b, h, wdt, cin = x.shape
    _, _, _, cout = w.shape
    assert wdt % 4 == 0 and h % row_tile == 0, (h, wdt, row_tile)
    g = wdt // 4
    tr = row_tile

    xp = jnp.pad(x, ((0, 0), (1, 1), (4, 4), (0, 0)))
    xv = xp.reshape(b, h + 2, g + 2, 4 * cin)
    wbig = pack_weights(w.astype(x.dtype))

    kern = functools.partial(_kernel, tr=tr, g=g, cin=cin)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h // tr, tr, g, 4 * cout), x.dtype),
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
            pltpu.VMEM((tr + 2, g + 2, 4 * cin), x.dtype),
            pltpu.VMEM((tr * g, 18 * cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xv, wbig)
    return out.reshape(b, h, g, 4, cout).reshape(b, h, wdt, cout)
