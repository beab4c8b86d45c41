from diffphycon_tpu.diffusion.schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    make_guidance_schedule,
    GUIDANCE_SCHEDULES,
)
from diffphycon_tpu.diffusion.core import (
    DiffusionConstants,
    GaussianDiffusion,
    CondSpec,
    GuidanceSpec,
)
from diffphycon_tpu.diffusion.conditioning import (
    burgers_cond_spec,
    burgers_derive_cond,
    get_proj_ep_orthogonal,
)
