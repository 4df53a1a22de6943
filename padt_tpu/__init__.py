"""PaDT-TPU: TPU-native rebuild of PaDT (Patch-as-Decodable-Token multimodal LLM).

A brand-new JAX/XLA/Pallas framework with the capability surface of
Gorilla-Lab-SCUT/PaDT: Visual Reference Tokens on Qwen2.5-VL, a DETR-style
perception decoder for boxes/scores/masks, SFT training, and OVD/REC/RES/RIC
evaluation — designed for TPU (SPMD meshes, static shapes, fused decode loop).
"""

from .config import PaDTConfig, VisionConfig, TextConfig, DecoderConfig, padt_3b, padt_7b, padt_tiny

__version__ = "0.1.0"
