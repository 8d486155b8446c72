"""TPU-native ternary image/video codec framework.

A ground-up JAX/XLA/Pallas rebuild of the balanced-ternary Word27 codec
(reference: Nico59000/Ternary-image-codec).  Device compute (trit math,
GF(27), RS(26,k), interleave, scramble, quantization, transforms) is
expressed as batched XLA ops and Pallas kernels; host glue (containers,
security policy, CLI) is Python with byte-exact file formats.
"""

from . import config  # noqa: F401
from .config import (  # noqa: F401
    ProfileID, RSParams, rs_params_for, UEPLayout, uep_uniform,
    uep_luma_priority, Tile2D, ScramblerSeed, SparseBeaconCfg, CosetID,
    SubwordMode, std_res_for, centered_window, EncoderConfig,
    SuperframeHeader, TRITS_PER_WORD, SYM_PER_WORD, NUM_BANDS,
)

__version__ = "0.1.0"
