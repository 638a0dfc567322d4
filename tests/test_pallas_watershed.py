"""Pallas VMEM-resident watershed vs the lax kernel (interpreter mode)."""
import numpy as np

import jax.numpy as jnp

from cerberus_tpu.ops.lax_postproc import watershed as lax_watershed
from cerberus_tpu.ops.pallas_watershed import watershed_pallas


def test_pallas_watershed_matches_lax():
    rng = np.random.default_rng(0)
    inner = np.zeros((64, 80), np.float32)
    inner[10:30, 10:30] = 0.9
    inner[10:30, 34:60] = 0.9
    inner += rng.random((64, 80)).astype(np.float32) * 0.05
    mask = np.zeros((64, 80), bool)
    mask[8:32, 8:62] = True
    markers = np.zeros((64, 80), np.int32)
    markers[20, 20] = 1
    markers[20, 45] = 2

    ref = np.asarray(lax_watershed(jnp.asarray(-inner), jnp.asarray(markers),
                                   jnp.asarray(mask)))
    got = np.asarray(watershed_pallas(jnp.asarray(-inner),
                                      jnp.asarray(markers),
                                      jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_watershed_padding_isolated():
    # non-tile-aligned shape: padded border must stay background
    inner = np.zeros((30, 70), np.float32)
    inner[5:25, 5:65] = 0.8
    mask = inner > 0.5
    markers = np.zeros((30, 70), np.int32)
    markers[15, 10] = 3
    got = np.asarray(watershed_pallas(jnp.asarray(-inner),
                                      jnp.asarray(markers),
                                      jnp.asarray(mask), interpret=True))
    assert got.shape == (30, 70)
    assert (got[mask] == 3).all()
    assert (got[~mask] == 0).all()
