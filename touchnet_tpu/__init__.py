# Copyright (c) 2026 touchnet_tpu authors.
# touchnet_tpu: a TPU-native JAX/XLA framework for multimodal (text + audio)
# LLM training, with the capabilities of TouchNet (see SURVEY.md).

__version__ = "0.1.0"
