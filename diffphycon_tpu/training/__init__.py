from diffphycon_tpu.training.train_state import (
    EMAConfig,
    TrainState,
    make_optimizer,
    torch_cosine_annealing,
    multistep_lr,
)
from diffphycon_tpu.training.trainer import Trainer, TrainerConfig
