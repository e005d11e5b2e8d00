"""foundpose_tpu: TPU-native 6DoF pose estimation for unseen objects.

A ground-up JAX/XLA/Pallas re-design with the capabilities of FoundPose
(ECCV 2024, training-free pose estimation from frozen DINOv2 features).
The full online path — feature extraction, tf-idf template retrieval, cyclic
buddy matching and RANSAC-PnP — compiles to a single batched jitted function
over detection crops, shardable across a TPU mesh.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules on package import)."""
    if name == "PoseEngine":
        from foundpose_tpu.engine import PoseEngine

        return PoseEngine
    if name == "ObjectRepre":
        from foundpose_tpu.repre import ObjectRepre

        return ObjectRepre
    if name == "load_repre":
        from foundpose_tpu.repre import load_repre

        return load_repre
    if name == "InferenceConfig":
        from foundpose_tpu.pipeline.inference import InferenceConfig

        return InferenceConfig
    if name == "PinholeCamera":
        from foundpose_tpu.structs import PinholeCamera

        return PinholeCamera
    raise AttributeError(f"module 'foundpose_tpu' has no attribute '{name}'")
