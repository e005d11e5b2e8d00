"""foundpose_tpu: TPU-native 6DoF pose estimation for unseen objects.

A ground-up JAX/XLA/Pallas re-design with the capabilities of FoundPose
(ECCV 2024, training-free pose estimation from frozen DINOv2 features).
The full online path — feature extraction, tf-idf template retrieval, cyclic
buddy matching and RANSAC-PnP — compiles to a single batched jitted function
over detection crops, shardable across a TPU mesh.
"""

__version__ = "0.1.0"
