import os
import sys

# Tests run on a virtual 8-device CPU mesh: sharding layouts, collectives and
# the full pipeline are validated without TPU hardware (SURVEY.md §4 item 4).
if not os.environ.get("CERBERUS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


# The axon TPU plugin ignores JAX_PLATFORMS and installs itself as default
# backend; pin the default device to CPU so the suite is hermetic (mesh tests
# pass explicit CPU device lists anyway).
if not os.environ.get("CERBERUS_TEST_TPU"):
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_mesh_devices():
    """The 8 virtual CPU devices for sharding tests. Some environments force
    an accelerator plugin as default backend regardless of JAX_PLATFORMS, so
    request the cpu backend explicitly."""
    import jax

    return jax.devices("cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def add_reference_to_path():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
