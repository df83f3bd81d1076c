from ggad_tpu.train.losses import bce_with_logits, ggad_losses
from ggad_tpu.train.full_batch import FullBatchTrainer, TrainResult

__all__ = [
    "bce_with_logits",
    "ggad_losses",
    "FullBatchTrainer",
    "TrainResult",
]
