"""Prior sampling throughput: KV-cache scan decode, tokens/sec on-device.

Measures the `make_prior_sampler` whole-grid generation (one compiled
`lax.scan` over the single-token decode) at a taming-scale prior
(n_layer 8, n_head 8, n_embd 256, vocab 11) for 64² grids (4096 tokens)
— the operating point of `train-prior` on 64² slices.

Usage: python tools/bench_prior.py [--batch 8] [--iters 3]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from medical_image_editing_tpu.models.mingpt import GPT, GPTConfig
from medical_image_editing_tpu.train.prior import make_prior_sampler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--n-layer", type=int, default=8)
    parser.add_argument("--n-embd", type=int, default=256)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--cache-dtype", choices=["float32", "bfloat16"],
                        default="bfloat16")
    args = parser.parse_args()

    dict_size = 10
    n_tokens = args.grid * args.grid
    cfg = GPTConfig(
        vocab_size=dict_size + 1, block_size=n_tokens,
        n_layer=args.n_layer, n_head=8, n_embed=args.n_embd,
        emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0,
    )
    gpt = GPT(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = gpt.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, cfg.block_size), jnp.int32), False,
        )
    variables = jax.device_put(variables, jax.devices()[0])

    sampler = jax.jit(
        make_prior_sampler(
            gpt, sos_token=dict_size, grid_hw=(args.grid, args.grid),
            cache_dtype=getattr(jnp, args.cache_dtype),
        ),
        static_argnums=(2,),
    )
    ids = sampler(variables, jax.random.key(1), args.batch)
    ids.block_until_ready()
    import numpy as np

    assert np.asarray(ids).shape == (args.batch, args.grid, args.grid)

    best = 0.0
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = sampler(variables, jax.random.key(2), args.batch)
        np.asarray(out)  # force
        dt = time.perf_counter() - t0
        best = max(best, args.batch * n_tokens / dt)
    print(f"prior sampling: {best:,.0f} tokens/s "
          f"(batch {args.batch}, {n_tokens} tokens/grid, "
          f"{args.n_layer}L/{args.n_embd}d, {args.cache_dtype} cache, "
          f"{jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
