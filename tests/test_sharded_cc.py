"""Row-sharded connected components over an 8-device mesh: halo exchange
must produce bit-identical labels to the single-device kernel."""
import numpy as np
import pytest

import conftest

import jax.numpy as jnp

from cerberus_tpu.ops.lax_postproc import connected_components
from cerberus_tpu.ops.sharded_cc import connected_components_sharded
from cerberus_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    from cerberus_tpu.ops.sharded_cc import AXIS

    return make_mesh(conftest.cpu_mesh_devices(), AXIS)


@pytest.mark.parametrize("seed", [0, 1])
def test_sharded_matches_single_device(mesh, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((64, 96)) > 0.55
    ref = np.asarray(connected_components(jnp.asarray(mask)))
    got = connected_components_sharded(mask, mesh)
    np.testing.assert_array_equal(got, ref)


def test_sharded_components_crossing_many_shards(mesh):
    # one vertical bar spanning all 8 shards + per-shard blobs: the bar must
    # get ONE global id (halo merges chain across every boundary)
    mask = np.zeros((64, 32), bool)
    mask[:, 5] = True
    for s in range(8):
        mask[s * 8 + 2: s * 8 + 5, 20:25] = True
    ref = np.asarray(connected_components(jnp.asarray(mask)))
    got = connected_components_sharded(mask, mesh)
    np.testing.assert_array_equal(got, ref)
    assert len(np.unique(got)) == 1 + 1 + 8  # bg + bar + 8 blobs


def test_sharded_watershed_basins_across_shards(mesh):
    from cerberus_tpu.ops.lax_postproc import watershed
    from cerberus_tpu.ops.sharded_cc import watershed_sharded

    # two tall basins separated by a vertical ridge spanning all 8 shards
    h, w = 64, 48
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    image = -np.minimum(np.abs(xx - 10), np.abs(xx - 36))  # valleys at 10, 36
    mask = np.ones((h, w), bool)
    markers = np.zeros((h, w), np.int32)
    markers[:, 10] = 1
    markers[:, 36] = 2

    ref = np.asarray(watershed(jnp.asarray(image), jnp.asarray(markers),
                               jnp.asarray(mask)))
    got = watershed_sharded(image, markers, mask, mesh)
    # identical away from the single contested ridge column; full coverage
    assert (got[mask] > 0).all()
    assert (got[:, :20] == 1).all() and (got[:, 28:] == 2).all()
    disagree = (got != ref).mean()
    assert disagree < 0.05  # plateau ties only (documented tolerance)
