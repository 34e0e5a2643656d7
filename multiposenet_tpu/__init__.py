"""multiposenet_tpu — TPU-native multi-person 2D pose estimation.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
TropComplique/MultiPoseNet (see SURVEY.md): MobileNet depthwise-separable
backbone → FPN → 17-channel COCO keypoint heatmaps + RetinaNet-style person
detector, on-device heatmap decoding (Gaussian peak-NMS, sub-pixel
refinement) and Pose Residual Network keypoint-to-person assignment, all
compiled into one XLA program and sharded data-parallel over ICI.
"""

from multiposenet_tpu.config import (
    Config,
    DecodeConfig,
    DetectorConfig,
    MeshConfig,
    ModelConfig,
    PRNConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "ModelConfig",
    "DetectorConfig",
    "PRNConfig",
    "DecodeConfig",
    "TrainConfig",
    "MeshConfig",
    "__version__",
]
