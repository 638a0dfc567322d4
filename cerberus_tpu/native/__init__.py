"""Native (C++) runtime components, loaded via ctypes.

``patch_gather``: GIL-free threaded window gather from slide-scale uint8
arrays into contiguous network batches — the data-plane hot loop that the
reference delegates to torch DataLoader worker processes. Compiled on first
use (cc -O3 -shared); every caller has a pure-numpy fallback, so missing
toolchains only cost speed, never correctness.
"""
from .patch_gather import gather_patches, native_available
