"""phdslam_tpu — TPU-native Rao-Blackwellized (C)PHD-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference CUDA implementation (Nat-zewge/cuda-PHDSLAM); see SURVEY.md.
"""

from .config import SlamConfig, load_config
from .types import FilterState, GMState, init_state

__all__ = ["SlamConfig", "load_config", "FilterState", "GMState",
           "init_state"]
__version__ = "0.1.0"
