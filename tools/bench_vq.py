"""Benchmark the VQ backends (XLA reference vs fused Pallas) across K.

Decides the open TODO item "double-buffered HBM streaming Pallas variant for
large K": if the existing VMEM-resident kernel already beats/stays level with
the XLA path at the largest supported operating points (VQGAN: K=64, C=512;
stress: K=512), streaming is unnecessary — all codebooks fit VMEM comfortably
(K=512 × C=512 × 4B = 1 MB of ~128 MB VMEM; the features stream tile-by-tile
through Pallas' pipelined BlockSpecs, which is already double-buffered HBM
streaming on the feature side).

Operating points:
  flagship  — N=8·256², C=16,  K=10  (first-stage VQ-WNet, BASELINE config #2)
  vqgan     — N=8·32²,  C=512, K=64  (VQGAN @512² latent, vqgan.py:385-400)
  stress    — N=8·64²,  C=64,  K=512 (large-K regime the TODO worried about)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.ops.vq import VQState, vq_apply
from medical_image_editing_tpu.ops.vq_pallas import vq_apply_fused
from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

POINTS = [
    ("flagship", 8, 256, 16, 10),
    ("vqgan", 8, 32, 512, 64),
    ("stress", 8, 64, 64, 512),
]


def bench(fn, state, x, iters=30):
    out = fn(state, x)
    jnp.asarray(out[1]).block_until_ready()
    float(out[1])  # force full chain (block_until_ready unreliable on tunnel)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(state, x)
        float(out[1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, b, hw, c, k in POINTS:
        x = jnp.asarray(rng.normal(size=(b, hw, hw, c)).astype(np.float32))
        embed = jnp.asarray(rng.normal(size=(k, c)).astype(np.float32))
        state = VQState(embed=embed, cluster_size=jnp.zeros((k,)), embed_avg=embed)

        xla = jax.jit(lambda s, y: vq_apply(s, y, momentum=0.999, train=True))
        pal = jax.jit(lambda s, y: vq_apply_fused(s, y, momentum=0.999, train=True))

        t_xla = bench(xla, state, x)
        ids_x = xla(state, x)[2]
        t_pal = bench(pal, state, x)
        ids_p = pal(state, x)[2]
        match = bool(jnp.all(ids_x == ids_p))
        n = b * hw * hw
        print(
            f"{name:9s} N={n:>7d} C={c:>3d} K={k:>3d}  "
            f"xla {t_xla:6.2f} ms  pallas {t_pal:6.2f} ms  "
            f"speedup {t_xla / t_pal:4.2f}x  ids_match={match}"
        )


if __name__ == "__main__":
    main()
