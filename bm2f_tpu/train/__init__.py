from bm2f_tpu.train.optim import make_optimizer
from bm2f_tpu.train.trainer import TrainState, Trainer, make_train_step

__all__ = ["make_optimizer", "TrainState", "Trainer", "make_train_step"]
