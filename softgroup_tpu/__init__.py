"""softgroup_tpu — a TPU-native (JAX/XLA/Pallas) framework for 3D point-cloud
instance / semantic / panoptic segmentation with the capabilities of
SoftGroup / SoftGroup++ (reference: /root/reference, thangvubk/SoftGroup).

Built from scratch for TPU: the sparse 3D U-Net backbone runs as padded,
blocked gather-GEMM-scatter over a sort-based voxel hash; soft grouping is a
grid-hash ball query + label-propagation connected components executed inside
the jitted step; all shapes are static with validity masks so XLA can tile
everything onto the MXU.
"""

__version__ = "0.1.0"
