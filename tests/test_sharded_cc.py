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
