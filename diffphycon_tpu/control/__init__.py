from diffphycon_tpu.control.guidance import (
    ddpm_guidance_loss,
    make_nabla_j,
    mse_dist_reg,
)
from diffphycon_tpu.control.metrics import (burgers_metric,
    jellyfish_objective, mse_deviation)
