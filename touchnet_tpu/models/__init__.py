# Model family registry: importing this package registers every TrainSpec
# (reference touchnet/__init__.py:35-123 registers llama, touch_audio,
# qwen2_audio, kimi_audio).

import touchnet_tpu.models.llama  # noqa: F401
import touchnet_tpu.models.touch_audio  # noqa: F401
import touchnet_tpu.models.qwen2_audio  # noqa: F401
import touchnet_tpu.models.kimi_audio  # noqa: F401
