"""U-Net encoder producing a full-resolution feature map, + VQ head wrapper.

Behavioral spec: reference `src/networks/unet_encoder.py` — 4 ResBlock downs,
bottleneck DoubleConv, 4 ups back to full resolution (`feature_extraction`,
`:93-103`), then vector quantization of the 1×-resolution features (`:105-118`).
Returns `(quantized_embed, commit_loss, ids+1)`: ids are offset by +1 so that 0
can mean "background / out of bounds" in edited label maps (`:117`).

Layout note: the reference also transposes ids H↔W (`:115`) — that transpose
merely undoes an NCHW flattening quirk inside its `VQModule._quantize`
(`vq_module.py:172,178`) and cancels against the transpose in
`get_embed_from_ids` (`:120-123`); in NHWC the maps are correctly oriented
without any transposition, so none is performed here.

Codebook initialization: the reference runs distributed k-means on the first
batch inside forward (`initialize_embed`, `:66-91`). Data-dependent init can't
live inside a compiled step, so it is an explicit init phase —
`init_codebook_from_batch` below — run once before the train loop (SURVEY.md §7
"hard parts").
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.kmeans import kmeans
from ..ops.vq import VQState, vq_apply, vq_lookup
from .blocks import DoubleConv, ResBlock, StyledResUpBlock, UpBlock


class UNetEncoder(nn.Module):
    """Feature extractor: x (B,H,W,in) → features (B,H,W,filters[0]).

    Spec: `unet_encoder.py:36-57,93-103`. The styled-up-block variant mirrors
    `:42-47`; NB the reference's styled encoder constructs `up_conv1_1` with a
    wrong in_channels (`:46` — filters[0] where the tensor has filters[1]);
    flax infers input channels so the same wiring simply works here.
    """

    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    use_styled_up_block: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[object] = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.filters
        x = x.astype(self.dtype or x.dtype)
        skips = []
        for i in range(4):
            x, skip = ResBlock(f[i], dtype=self.dtype)(x)
            skips.append(skip)
        x = DoubleConv(f[4], dtype=self.dtype)(x)
        for i in reversed(range(4)):
            if self.use_styled_up_block:
                x = StyledResUpBlock(f[i], axis_name=self.axis_name, dtype=self.dtype)(
                    x, skips[i], train
                )
            else:
                x = UpBlock(f[i], dtype=self.dtype)(x, skips[i])
        return x


def encode_quantize(
    encoder: UNetEncoder,
    variables,
    vq_state: VQState,
    x,
    *,
    momentum: float = 0.99,
    eps: float = 1e-5,
    train: bool = True,
    axis_name: Optional[str] = None,
    backend: str = "xla",
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState, dict]:
    """Full encoder forward: features → VQ → (quantized, commit, ids+1, vq', vars').

    Spec: `unet_encoder.py:105-118`. Returns updated batch_stats when the
    styled encoder is used (empty otherwise).
    """
    mutable = ["batch_stats"] if (train and "batch_stats" in variables) else []
    if mutable:
        feats, updated = encoder.apply(variables, x, train=train, mutable=mutable)
    else:
        feats = encoder.apply(variables, x, train=train)
        updated = {}
    quantized, commit, ids, new_vq = vq_apply(
        vq_state, feats, momentum=momentum, eps=eps, train=train,
        axis_name=axis_name, backend=backend,
    )
    return quantized, commit, ids + 1, new_vq, updated


def get_embed_from_ids(vq_state: VQState, ids) -> jax.Array:
    """Editing-path lookup: external (offset) id map → embedding (B,H,W,C).

    Spec: `unet_encoder.py:120-123` + the caller's `ids −= 1` handling
    (`run_recon.py:182-186`) — callers pass 0-based ids here (background
    already masked out by the caller).
    """
    return vq_lookup(vq_state, ids.astype(jnp.int32))


def init_codebook_from_batch(
    key,
    feats,
    vq_state: VQState,
    *,
    axis_name: Optional[str] = None,
    num_iters: int = 50,
) -> VQState:
    """k-means codebook init from first-batch encoder features.

    Spec: `unet_encoder.py:66-91` — the reference all_gathers embeddings across
    GPUs, runs k-means on rank 0 and broadcasts. Here: optional
    `lax.all_gather` over the mesh axis, then a jitted Lloyd loop computed
    identically on every replica (replicated-by-construction, no broadcast).
    `embed_avg`/`cluster_size` are reseeded consistently with the new centers
    (the reference leaves them at their random-init values — a quirk that makes
    the first EMA updates fight the k-means init; we document-and-diverge by
    seeding `embed_avg = centers`, `cluster_size = 0` so the EMA continues from
    the initialized codebook).
    """
    c = feats.shape[-1]
    flat = feats.reshape(-1, c)
    if axis_name is not None:
        flat = jax.lax.all_gather(flat, axis_name).reshape(-1, c)
    k = vq_state.embed.shape[0]
    _, centers = kmeans(key, flat, k, num_iters=num_iters)
    return VQState(
        embed=centers,
        cluster_size=jnp.zeros_like(vq_state.cluster_size),
        embed_avg=centers,
    )


class EncoderWithVQ:
    """Convenience bundle of encoder module + VQ hyperparameters.

    Mirrors the reference `UNetEncoder`'s constructor surface
    (`unet_encoder.py:19-63`) while keeping all state functional.
    """

    def __init__(
        self,
        in_channels: int = 1,
        filters: Sequence[int] = (64, 128, 256, 512, 1024),
        dict_size: int = 512,
        momentum: float = 0.99,
        eps: float = 1e-5,
        use_styled_up_block: bool = False,
        axis_name: Optional[str] = None,
        knn_backend: str = "xla",
        dtype=None,
    ):
        del in_channels  # flax infers input channels
        self.module = UNetEncoder(
            filters=tuple(filters),
            use_styled_up_block=bool(use_styled_up_block),
            axis_name=axis_name,
            dtype=dtype,
        )
        self.dict_size = dict_size
        self.emb_dim = filters[0]
        self.momentum = momentum
        self.eps = eps
        self.axis_name = axis_name
        self.knn_backend = knn_backend

    def init(self, key, sample_x):
        k1, k2 = jax.random.split(key)
        variables = self.module.init(k1, sample_x, train=False)
        from ..ops.vq import vq_init

        vq_state = vq_init(k2, self.dict_size, self.emb_dim)
        return variables, vq_state

    def __call__(self, variables, vq_state, x, train: bool = True):
        return encode_quantize(
            self.module,
            variables,
            vq_state,
            x,
            momentum=self.momentum,
            eps=self.eps,
            train=train,
            axis_name=self.axis_name,
            backend=self.knn_backend,
        )
