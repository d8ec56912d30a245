# Copyright (c) 2026 touchnet_tpu authors.
# Loss registry (reference touchnet/loss/__init__.py:7-28 keeps compiled
# losses; under jax.jit every loss is compiled, so this is a plain registry).

from touchnet_tpu.loss.cross_entropy import (  # noqa: F401
    IGNORE_INDEX,
    accuracy,
    cross_entropy_loss,
    per_position_cross_entropy,
)

LOSSES = {"ce": cross_entropy_loss}
