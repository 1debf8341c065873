"""Golden-value parity for the BigGAN Generator stack vs the reference in
torch — spec `src/networks/unet_discriminator.py:92-330` (Generator/G_arch),
`:632-729` (G_D), `src/networks/biggan/layers.py:280-414` (ccbn/GBlock),
`:125-138` (SNEmbedding). This stack is dead code in the reference (no
trainer/CLI instantiates it); it's carried here for full model-surface parity,
so every flavor is pinned by weight transplant, not just smoke.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import parity_helpers as ph
from test_gan_parity import _build_torch_unet_dis, ref_unet_dis  # noqa: F401

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(ph.REF_SRC), reason="reference checkout not available"
)


@pytest.fixture(scope="module", autouse=True)
def _f32_matmuls():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def _torch_generator(ref_unet_dis, **kw):
    defaults = dict(
        G_ch=8, dim_z=16, bottom_width=4, resolution=128, G_attn="64",
        n_classes=5, G_shared=True, shared_dim=0, hier=False,
        unconditional=False,
    )
    defaults.update(kw)
    return ref_unet_dis.Generator(**defaults)


def _our_generator(**kw):
    from medical_image_editing_tpu.models.biggan_generator import BigGANGenerator

    defaults = dict(
        G_ch=8, dim_z=16, resolution=128, G_attn="64", n_classes=5,
        G_shared=True, shared_dim=0, hier=False, unconditional=False,
    )
    defaults.update(kw)
    return BigGANGenerator(**defaults)


def _assert_generator_parity(ref_unet_dis, rng, torch_kw, our_kw, dim_z):
    from medical_image_editing_tpu.models.biggan_generator import BigGANGenerator

    tg = _torch_generator(ref_unet_dis, **torch_kw).train()
    variables = ph.biggan_generator_params(tg)  # before torch mutates u

    z = rng.normal(size=(2, dim_z)).astype(np.float32)
    y = np.array([1, 3], dtype=np.int64)
    with torch.no_grad():
        out_t = tg(torch.from_numpy(z), tg.shared(torch.from_numpy(y))).numpy()

    jg = _our_generator(**our_kw)
    out_j, _ = jg.apply(
        variables, jnp.asarray(z), jnp.asarray(y), train=True,
        mutable=["batch_stats"], method=BigGANGenerator.generate,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    return variables


@pytest.mark.slow
def test_generator_parity_conditional_shared(ref_unet_dis, rng):
    """Standard BigGAN config: shared class embedding, non-hier z, SNLinear
    ccbn heads, attention at 64."""
    _assert_generator_parity(ref_unet_dis, rng, {}, {}, dim_z=16)


@pytest.mark.slow
def test_generator_parity_conditional_hier(ref_unet_dis, rng):
    """Hierarchical z: z split into (n_blocks+1) chunks, ys = cat(y, z_i)
    (`unet_discriminator.py:303-311`). dim_z=24 → 6 slots × chunk 4."""
    _assert_generator_parity(
        ref_unet_dis, rng, {"dim_z": 24, "hier": True}, {"dim_z": 24, "hier": True},
        dim_z=24,
    )


@pytest.mark.slow
def test_generator_parity_conditional_unshared(ref_unet_dis, rng):
    """Unshared conditioning: ccbn heads are plain Embeddings on int labels
    (`unet_discriminator.py:198-202`)."""
    from medical_image_editing_tpu.models.biggan_generator import BigGANGenerator

    tg = _torch_generator(ref_unet_dis, G_shared=False).train()
    variables = ph.biggan_generator_params(tg)

    rng_l = np.random.default_rng(7)
    z = rng_l.normal(size=(2, 16)).astype(np.float32)
    y = np.array([0, 4], dtype=np.int64)
    with torch.no_grad():
        # G_shared=False → shared is identity; ccbn embeds the raw labels
        out_t = tg(torch.from_numpy(z), torch.from_numpy(y)).numpy()

    jg = _our_generator(G_shared=False)
    out_j, _ = jg.apply(
        variables, jnp.asarray(z), jnp.asarray(y), train=True,
        mutable=["batch_stats"], method=BigGANGenerator.generate,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_generator_parity_unconditional(ref_unet_dis, rng):
    """Self-modulated unconditional generator (hier z feeds every ccbn MLP,
    `unet_discriminator.py:194-196,305-306`). Requires G_shared=False — the
    reference's G_shared=True unconditional combo crashes on head sizing."""
    _assert_generator_parity(
        ref_unet_dis, rng,
        {"dim_z": 24, "hier": True, "unconditional": True, "G_shared": False},
        {"dim_z": 24, "hier": True, "unconditional": True, "G_shared": False},
        dim_z=24,
    )


def test_generator_rejects_reference_crash_combos():
    from medical_image_editing_tpu.models.biggan_generator import BigGANGenerator

    z = jnp.zeros((1, 16))
    with pytest.raises(ValueError, match="hier"):
        BigGANGenerator(unconditional=True, hier=False, G_shared=False).init(
            jax.random.PRNGKey(0), z, None, train=False
        )
    with pytest.raises(ValueError, match="G_shared"):
        BigGANGenerator(unconditional=True, hier=True, G_shared=True).init(
            jax.random.PRNGKey(0), z, None, train=False
        )
    with pytest.raises(ValueError, match="G_shared"):
        # conditional hier + unshared: reference torch.cat dtype crash (`:311`)
        BigGANGenerator(n_classes=5, hier=True, G_shared=False).init(
            jax.random.PRNGKey(0), z, jnp.array([0]), train=False
        )


def test_ccbn_instance_norm_matches_torch(rng):
    """The 'in' norm path (train: per-instance stats + running update with
    torch's unbiased stored variance; eval: running stats) vs
    F.instance_norm, the oracle the reference calls (`biggan/layers.py:325`)."""
    import torch.nn.functional as F
    from medical_image_editing_tpu.models.biggan_layers import CCBN

    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    rm = rng.normal(size=(4,)).astype(np.float32)
    rv = (np.abs(rng.normal(size=(4,))) + 0.5).astype(np.float32)

    y = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    mod = CCBN(4, norm_style="in")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), y, True)
    # zero SN heads → gain(y)=0, bias(y)=0 → out = IN(x)·(1+0)+0, isolating
    # the norm (well-defined: the SN of a zero matrix stays zero here)
    params = jax.tree.map(jnp.zeros_like, variables["params"])
    bs = dict(variables["batch_stats"])
    bs["in_mean"], bs["in_var"] = jnp.asarray(rm), jnp.asarray(rv)
    out_j, upd = mod.apply(
        {"params": params, "batch_stats": bs},
        jnp.asarray(x), y, True, mutable=["batch_stats"],
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    rm_t, rv_t = torch.from_numpy(rm.copy()), torch.from_numpy(rv.copy())
    out_t = F.instance_norm(xt, rm_t, rv_t, None, None, True, 0.1, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    # running buffers advance identically (torch updates them in place)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["in_mean"]), rm_t.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["in_var"]), rv_t.numpy(), rtol=1e-5, atol=1e-6
    )
    # eval mode normalizes with the running stats, no update
    bs_eval = dict(variables["batch_stats"])
    bs_eval["in_mean"], bs_eval["in_var"] = jnp.asarray(rm), jnp.asarray(rv)
    out_j_eval = mod.apply(
        {"params": params, "batch_stats": bs_eval}, jnp.asarray(x), y, False
    )
    rm_e, rv_e = torch.from_numpy(rm.copy()), torch.from_numpy(rv.copy())
    out_t_eval = F.instance_norm(xt, rm_e, rv_e, None, None, False, 0.1, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out_j_eval), out_t_eval.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_unet_discriminator_projection_parity(ref_unet_dis, rng):
    """Class-conditional projection D: bottleneck + pixel-map projections onto
    the SN class embeddings (`unet_discriminator.py:605-623`)."""
    from medical_image_editing_tpu.models import UNetDiscriminator

    tdis = _build_torch_unet_dis(ref_unet_dis, n_classes=5).train()
    variables = ph.unet_discriminator_params(tdis)

    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    y = np.array([2, 0], dtype=np.int64)
    with torch.no_grad():
        map_t, bottle_t, _ = tdis(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(y)
        )

    jdis = UNetDiscriminator(D_ch=8, resolution=128, n_classes=5)
    (map_j, bottle_j, _), _ = jdis.apply(
        variables, jnp.asarray(x), True, y=jnp.asarray(y), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(bottle_j), bottle_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(map_j)[..., 0], map_t.numpy()[:, 0], rtol=1e-3, atol=2e-4
    )


def test_sn_embed_matches_torch_sn_semantics(ref_unet_dis, rng):
    """SNEmbed's hand-rolled power iteration reproduces the reference SN base
    class on the (num_embeddings, dim) weight (`biggan/layers.py:25-94`)."""
    from medical_image_editing_tpu.models.biggan_layers import SNEmbed

    layers = ph.import_ref_module("biggan.layers")
    temb = layers.SNEmbedding(7, 12).train()
    p, bs = ph.sn_embedding_params(temb)

    y = np.array([0, 3, 6], dtype=np.int64)
    with torch.no_grad():
        out_t = temb(torch.from_numpy(y)).numpy()

    jemb = SNEmbed(7, 12)
    out_j, upd = jemb.apply(
        {"params": p, "batch_stats": bs}, jnp.asarray(y), True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-6)
    # u buffer advanced identically (torch updated in-place during forward)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["u"]), temb.u0.numpy(), rtol=1e-5, atol=1e-6
    )


def test_sn_embed_power_iteration_converges(rng):
    """Iterating SNEmbed in train mode drives sigma to the true top singular
    value of the weight, so the returned rows approach W/σ_max — the property
    spectral norm exists to guarantee."""
    from medical_image_editing_tpu.models.biggan_layers import SNEmbed

    w = rng.normal(size=(9, 6)).astype(np.float32)
    emb = SNEmbed(9, 6)
    variables = emb.init(jax.random.PRNGKey(0), jnp.arange(9), True)
    variables = {
        "params": {"embedding": jnp.asarray(w)},
        "batch_stats": variables["batch_stats"],
    }
    for _ in range(50):
        out, upd = emb.apply(
            variables, jnp.arange(9), True, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}
    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    np.testing.assert_allclose(
        float(variables["batch_stats"]["sigma"]), sigma_true, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out), w / sigma_true, rtol=1e-3, atol=1e-5)


def test_ccbn_gn_and_nonorm_styles(rng):
    """The reference's 'gn' branch crashes on a typo (`biggan/layers.py:328`);
    ours must work: group-normed, then modulated. 'nonorm' = pure modulation."""
    from medical_image_editing_tpu.models.biggan_layers import CCBN

    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    for style in ("gn_grp_2", "nonorm"):
        mod = CCBN(8, norm_style=style)
        variables = mod.init(jax.random.PRNGKey(1), x, y, True)
        out, _ = mod.apply(variables, x, y, True, mutable=["batch_stats"])
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    # nonorm with zero-init SN heads: gain(y)=0, bias(y)=0 → out == x·(1+0)+0
    mod = CCBN(8, norm_style="nonorm")
    variables = mod.init(jax.random.PRNGKey(1), x, y, True)
    zeroed = jax.tree.map(jnp.zeros_like, variables["params"])
    out, _ = mod.apply(
        {"params": zeroed, "batch_stats": variables["batch_stats"]},
        x, y, True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_gd_pair_matches_separate_calls(rng):
    """GDPair's one-dispatch cat(fake, real) forward must equal running G and
    D separately (the reference's rationale at `unet_discriminator.py:630-631`
    is purely about avoiding extra gathers — numerics are unchanged). Run in
    eval mode: train-mode SN u-updates intentionally differ between one
    concatenated D call and two separate ones."""
    from medical_image_editing_tpu.models.biggan_generator import (
        BigGANGenerator, GDPair,
    )
    from medical_image_editing_tpu.models import UNetDiscriminator

    G = BigGANGenerator(G_ch=8, dim_z=16, resolution=128, n_classes=5)
    D = UNetDiscriminator(D_ch=8, resolution=128, D_attn="0", n_classes=5)
    gd = GDPair(G=G, D=D)

    k = jax.random.PRNGKey(0)
    z = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
    gy = jnp.array([1, 3])
    dy = jnp.array([0, 2])
    variables = gd.init(k, z, gy, x=x, dy=dy, train=False)

    out = gd.apply(variables, z, gy, x=x, dy=dy, train=False)
    split = gd.apply(variables, z, gy, x=x, dy=dy, split_D=True, train=False)

    np.testing.assert_allclose(
        np.asarray(out["g_z"]), np.asarray(split["g_z"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["d_fake"][0]), np.asarray(split["d_fake"][0]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["d_real"][1]), np.asarray(split["d_real"][1]),
        rtol=1e-4, atol=1e-4,
    )
