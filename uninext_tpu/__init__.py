"""UNINEXT-TPU: a TPU-native (JAX/Flax/pjit/Pallas) universal instance-perception framework.

Re-designs the capabilities of UNINEXT ("Universal Instance Perception as Object
Discovery and Retrieval", CVPR 2023) for TPU hardware: one prompt-conditioned
Deformable-DETR model solving 10 instance-perception tasks (object detection,
instance segmentation, REC, RES, SOT, VOS, R-VOS, MOT, MOTS, VIS).

Design stance (not a port):
  * one functional model: (image_tokens, prompt_tokens, prompt_mask)
      -> (logits = query/prompt-token alignment, boxes, masks, embeds, ious)
  * static shapes everywhere (padded prompts, fixed query count, bucketed images)
  * jit-compiled train/inference steps; SPMD data parallelism over a jax Mesh
  * multi-scale deformable attention as a fused XLA/Pallas sampling op
"""

__version__ = "0.1.0"
