# Model family registry: importing this package registers every TrainSpec
# (reference touchnet/__init__.py:35-123 registers llama, touch_audio,
# qwen2_audio, kimi_audio).

import touchnet_tpu.models.llama  # noqa: F401

for _name in ("touch_audio", "qwen2_audio", "kimi_audio"):
    try:  # families land incrementally; tolerate partial builds
        __import__(f"touchnet_tpu.models.{_name}")
    except ImportError:
        pass
