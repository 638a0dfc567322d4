"""Pallas VMEM-resident connected components vs the lax/scipy oracles
(interpreter mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cerberus_tpu.ops import cc_cpu
from cerberus_tpu.ops.pallas_cc import connected_components_pallas


def _label_isomorphic(a, b):
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    if (a > 0).sum() != (b > 0).sum():
        return False
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    return len(pairs) == len({p[0] for p in pairs}) == len(
        {p[1] for p in pairs})


@pytest.mark.parametrize("seed,hw", [(0, (64, 64)), (1, (96, 130)),
                                     (2, (40, 257))])
def test_pallas_cc_matches_scipy(seed, hw):
    rng = np.random.default_rng(seed)
    mask = rng.random(hw) > 0.55
    ref, _ = cc_cpu.label(mask)
    got = np.asarray(connected_components_pallas(jnp.asarray(mask),
                                                 interpret=True))
    assert _label_isomorphic(ref, got)


def test_pallas_cc_id_space_matches_lax():
    from cerberus_tpu.ops.lax_postproc import connected_components

    mask = np.zeros((20, 150), bool)  # forces width padding to 256
    mask[2:6, 2:6] = True
    mask[10:15, 120:145] = True
    a = np.asarray(connected_components(jnp.asarray(mask)))
    b = np.asarray(connected_components_pallas(jnp.asarray(mask),
                                               interpret=True))
    np.testing.assert_array_equal(a, b)  # exact same ids, not just isomorphic


def test_blocked_cc_matches_scipy_interpret():
    """Blocked strip kernel (pallas_cc_blocked): exact min-index ids across
    strip boundaries, interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from cerberus_tpu.ops import cc_cpu
    from cerberus_tpu.ops.pallas_cc_blocked import (
        connected_components_pallas_blocked as ccb,
    )

    r = np.random.default_rng(7)
    yy, xx = np.ogrid[:384, :256]
    mask = np.zeros((384, 256), bool)
    for _ in range(40):
        cy, cx = r.integers(10, 370), r.integers(10, 246)
        rad = r.integers(4, 14)
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rad ** 2
    got = np.asarray(ccb(jnp.asarray(mask), interpret=True))
    ref, n = cc_cpu.label(mask)
    pairs = set(zip(ref.ravel().tolist(), got.ravel().tolist()))
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})
    flat = np.arange(mask.size).reshape(mask.shape) + 1
    for comp in range(1, n + 1):
        sel = ref == comp
        assert (got[sel] == flat[sel].min()).all()


def test_blocked_cc_vertical_snake_across_strips():
    """A single component threading every strip converges to one id."""
    import numpy as np
    import jax.numpy as jnp
    from cerberus_tpu.ops import cc_cpu
    from cerberus_tpu.ops.pallas_cc_blocked import (
        connected_components_pallas_blocked as ccb,
    )

    snake = np.zeros((512, 128), bool)
    snake[:, 0] = True
    snake[-1, :] = True
    snake[:, -1] = True
    snake[0, 64:] = True
    got = np.asarray(ccb(jnp.asarray(snake), interpret=True))
    assert len(np.unique(got[snake])) == 1
    assert (got[~snake] == 0).all()
