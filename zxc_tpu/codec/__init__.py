"""Host codec: vectorized (NumPy) implementation of the ZXC v7 block codecs.

This is the correctness-oracle and CLI path. It is deliberately structured
as the same three-phase parallel pipeline the TPU device kernels use
(section parse -> prefix sums -> gather/scatter resolution) rather than the
reference's serial per-sequence loop, so the device path in
:mod:`zxc_tpu.ops` is a shape-for-shape port of this code onto jnp/Pallas.
"""
