"""zxc_tpu — TPU-native implementation of the ZXC v7 lossless codec.

Bit-exact with the reference C library (hellobertrand/zxc) on the wire;
architected for TPU: block decode as batched prefix-sum/gather kernels
(zxc_tpu.ops), multi-chip scale-out over jax.sharding meshes
(zxc_tpu.parallel), host NumPy oracle codec (zxc_tpu.codec).

Public API parity map (reference include/ -> here):
  zxc_buffer.h   one-shot:  compress / decompress / compress_bound /
                 get_decompressed_size / get_dict_id
  zxc_buffer.h   contexts:  Cctx / Dctx  (zxc_tpu.context)
  zxc_stream.h   streaming: stream_compress / stream_decompress
  zxc_pstream.h  push:      CStream / DStream  (zxc_tpu.codec.pstream)
  zxc_seekable.h            Seekable  (zxc_tpu.codec.seekable)
  zxc_dict.h                Dictionary / train_dict / train_dict_huf /
                            dict_train  (zxc_tpu.codec.dict_train)
  zxc_error.h               ZxcError / error_name / ERROR_*
"""
from . import constants  # noqa: F401
from .errors import ZxcError, error_name  # noqa: F401
from .errors import *  # noqa: F401,F403
from .codec.frame import (compress, decompress, get_decompressed_size,  # noqa: F401
                          get_dict_id, EncodeOpts, DecodeOpts)
from .constants import compress_bound, compress_block_bound  # noqa: F401
from .context import Cctx, Dctx  # noqa: F401
from .codec.pstream import (CStream, DStream, stream_compress,  # noqa: F401
                            stream_decompress)
from .codec.stream import (compress_file, decompress_file,  # noqa: F401
                           stream_get_decompressed_size)
from .codec.frame import (decompress_inplace,  # noqa: F401
                          decompress_inplace_bound)
from .codec.seekable import Seekable, is_seekable  # noqa: F401
from .format.dictionary import Dictionary  # noqa: F401
from .codec.dict_train import train_dict, train_dict_huf, dict_train  # noqa: F401

__version__ = "0.1.0"
FORMAT_VERSION = constants.FORMAT_VERSION
