"""fcd_tpu: TPU-native framework for FCD lesion segmentation in 3D brain MRI.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch+MONAI pipeline (mehdirabiee/fcd): data pipeline, 3D
model zoo, composite losses, trainer, sliding-window inference engine,
post-processing and voxel/lesion-wise metrics — built channels-last,
bf16-first, and mesh-shardable from day one.
"""

from fcd_tpu.config import get_default_params

__version__ = "0.1.0"

__all__ = ["get_default_params", "__version__"]
