from gsalign_tpu.index.suffix_array import (  # noqa: F401
    build_suffix_array_np, build_suffix_array_jax, build_suffix_array,
)
from gsalign_tpu.index.fmindex import FMIndex, build_fmindex  # noqa: F401
from gsalign_tpu.index.io import save_index, load_index  # noqa: F401
