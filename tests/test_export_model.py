"""Round-trip tests for the AOT StableHLO export of the serving edit path.

The exported artifact must reproduce `make_batched_edit_fn` exactly (weights
baked in as constants), accept any batch size via the symbolic batch dim, and
deserialize/execute with no model code in scope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.cli.edit_batch import make_batched_edit_fn
from medical_image_editing_tpu.cli.export_model import (
    export_edit_artifact,
    load_edit_artifact,
    save_edit_artifact,
)
from medical_image_editing_tpu.models import UNetDecoder
from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

FILTERS = (4, 8, 16, 32, 64)


def _setup():
    enc = EncoderWithVQ(filters=FILTERS, dict_size=6)
    dec = UNetDecoder(out_channels=1, filters=FILTERS, dropped_skip_layers=())
    x0 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                        q, train=False)
    return dec, dec_vars, vq


@pytest.mark.slow
def test_export_roundtrip_matches_direct(tmp_path, rng):
    dec, dec_vars, vq = _setup()
    data = export_edit_artifact(
        dec, dec_vars, vq, image_size=32, platforms=("cpu",)
    )
    path = str(tmp_path / "edit.jaxexport")
    save_edit_artifact(path, data)

    call = load_edit_artifact(path)
    direct = make_batched_edit_fn(dec)

    # symbolic batch: the one artifact serves different batch sizes
    for b in (1, 3):
        ids = jnp.asarray(rng.integers(0, 7, (b, 32, 32)).astype(np.int32))
        got = np.asarray(call(ids))
        want = np.asarray(direct(dec_vars, vq, ids))
        assert got.shape == (b, 32, 32)
        # 1e-4, not 1e-5: the deserialized StableHLO artifact and the direct
        # jit go through different XLA:CPU compile pipelines whose fusion
        # choices differ at the last-ulp level — measured on this host
        # (round 5): 7/3072 elements at ≤1.6e-5, reproducible at the
        # round-4 tree too (environmental, not a code regression).
        np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_export_uint8_output(tmp_path, rng):
    dec, dec_vars, vq = _setup()
    data = export_edit_artifact(
        dec, dec_vars, vq, image_size=32, platforms=("cpu",),
        output_dtype="uint8",
    )
    path = str(tmp_path / "edit_u8.jaxexport")
    save_edit_artifact(path, data)
    call = load_edit_artifact(path)
    ids = jnp.asarray(rng.integers(0, 7, (2, 32, 32)).astype(np.int32))
    got = np.asarray(call(ids))
    assert got.dtype == np.uint8
    want = np.asarray(
        make_batched_edit_fn(dec, output_dtype="uint8")(dec_vars, vq, ids)
    )
    np.testing.assert_array_equal(got, want)
