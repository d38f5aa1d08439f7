"""Host-side wire-format layer: headers, checksums, varints, dictionaries.

Everything in this package is pure host code (NumPy / Python ints): it
parses and emits the fixed-size navigation structures of the ZXC v7
bitstream. The byte-heavy payload work lives in :mod:`zxc_tpu.codec`
(vectorized host path) and :mod:`zxc_tpu.ops` (TPU device path).
"""
from .hashes import hash8, hash16, rapidhash32, rapidhash64, global_hash_update
from .varint import varint_encode, varint_decode, varint_decode_array
from . import headers
