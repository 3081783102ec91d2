from .segmentation import (
    TrainState,
    make_train_state,
    pit_bce_loss,
    train_step,
)

__all__ = ["TrainState", "make_train_state", "pit_bce_loss", "train_step"]
