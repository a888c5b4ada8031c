"""multiplanarunet_tpu: TPU-native multi-planar U-Net segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
perslev/MultiPlanarUNet (mpunet): fully-autonomous 3D medical image
segmentation via a single 2D U-Net trained on isotropic scanner-space slices
sampled along multiple random view axes, with per-view full-volume prediction
and a learned per-class-per-view fusion model.
"""

__version__ = "0.1.0"
