"""Direct coverage for the small platform utilities that the e2e tests only
exercise implicitly: viz_info loading (reference misc/viz_utils.py:191-192
reads dataset.yml relative to cwd) and the debug/deterministic modes
(SURVEY §5 sanitizers)."""
import os

import numpy as np

from cerberus_tpu.utils import debug as D
from cerberus_tpu.utils.viz import DEFAULT_VIZ_INFO, load_viz_info


def test_load_viz_info_defaults_when_absent(tmp_path):
    assert load_viz_info(str(tmp_path / "missing.yml")) is DEFAULT_VIZ_INFO


def test_load_viz_info_merges_dataset_yml(tmp_path):
    yml = tmp_path / "dataset.yml"
    yml.write_text(
        "gland:\n"
        "  img_dir: x\n"
        "  viz_info:\n"
        "    line_width: 7\n"
        "    type_names: ['nolabel', 'custom']\n"
        "lumen:\n"
        "  img_dir: y\n"   # no viz_info -> default
    )
    info = load_viz_info(str(yml))
    assert info["gland"]["line_width"] == 7
    assert info["gland"]["type_names"] == ["nolabel", "custom"]
    # tissues without a viz_info block (or absent entirely) fall back
    assert info["lumen"] == DEFAULT_VIZ_INFO["lumen"]
    assert info["nuclei"] == DEFAULT_VIZ_INFO["nuclei"]


def test_debug_mode_requested_env():
    old = os.environ.pop("CERBERUS_DEBUG", None)
    try:
        assert not D.debug_mode_requested()
        os.environ["CERBERUS_DEBUG"] = "0"
        assert not D.debug_mode_requested()
        os.environ["CERBERUS_DEBUG"] = "1"
        assert D.debug_mode_requested()
    finally:
        if old is None:
            os.environ.pop("CERBERUS_DEBUG", None)
        else:
            os.environ["CERBERUS_DEBUG"] = old


def test_deterministic_mode_reproduces():
    import jax.numpy as jnp

    with D.deterministic_mode(7) as key1:
        a = np.random.rand(4)
        m1 = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    with D.deterministic_mode(7) as key2:
        b = np.random.rand(4)
        m2 = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key2))
