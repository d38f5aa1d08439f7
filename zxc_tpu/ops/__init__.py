"""Device (JAX/XLA/Pallas) compute path: batched block decode kernels."""
from . import expand, batch  # noqa: F401
from .batch import decompress, plan_frame, decode_plan_device  # noqa: F401
from . import pallas_decode  # noqa: F401
from . import encode  # noqa: F401
from .encode import (compress_device, find_matches_device,  # noqa: F401
                     find_matches_device_lcp, parse_compact_walk)
from . import pallas_encode  # noqa: F401
from . import device_pipeline  # noqa: F401
from . import pivco_device  # noqa: F401
from .device_pipeline import decompress_e2e  # noqa: F401
from . import hints  # noqa: F401
from .hints import write_hints, HintFile  # noqa: F401
