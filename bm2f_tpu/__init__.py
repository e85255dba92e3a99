"""bm2f_tpu — a TPU-native (JAX / Flax / Pallas / pjit) universal segmentation
framework with the capabilities of wenhe-jia/BM2F (a Mask2Former fork):

- universal image segmentation (semantic / instance / panoptic),
- video instance segmentation (YouTubeVIS),
- box-supervised weak supervision (projection + pairwise + DINOv2-temporal),
- a Pallas multi-scale deformable-attention kernel replacing the CUDA op.

This is a ground-up TPU-first design, not a port: static shapes everywhere,
functional Flax modules, pjit/shard_map data parallelism over a device mesh,
XLA collectives instead of NCCL, and orbax checkpointing.
"""

__version__ = "0.1.0"
