"""Host codec: vectorized (NumPy) implementation of the ZXC v7 block codecs.

This is the correctness-oracle and CLI path. It is deliberately structured
as the same three-phase parallel pipeline the TPU device kernels use
(section parse -> prefix sums -> gather/scatter resolution) rather than the
reference's serial per-sequence loop, so the device path in
:mod:`zxc_tpu.ops` is a shape-for-shape port of this code onto jnp/Pallas.
"""
# Import the native runtime eagerly on the importing thread: the codec
# modules use `from .. import runtime` inside hot functions, and a lazy
# first import racing across MT-pipeline worker threads raises
# ImportError ("partially initialized module") in the losers, silently
# dropping those blocks to the pure-Python fallback — valid archives,
# but nondeterministic bytes (observed: -T 4 CLI encodes flipping block
# sizes run to run).
from .. import runtime as _runtime  # noqa: F401,E402

