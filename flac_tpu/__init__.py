"""flac_tpu — a TPU-native FLAC codec built on JAX/XLA/Pallas.

Brand-new implementation with the capabilities of xiph/flac (reference
layout mapped in SURVEY.md): batched frame encoding as one jitted candidate
grid search, vectorized bit packing, parallel CRC, data-parallel scaling
over device meshes.
"""

import jax

# LPC analysis (autocorrelation / Levinson / quantization) matches the
# reference's double precision; x64 must be enabled before first jax use.
jax.config.update("jax_enable_x64", True)

from .config import EncoderConfig            # noqa: E402
from .encoder import StreamEncoder, encode_file_to_flac  # noqa: E402

__all__ = ["EncoderConfig", "StreamEncoder", "encode_file_to_flac"]
__version__ = "0.1.0"
