from diffphycon_tpu.physics.fluids.grids import (
    staggered_divergence,
    staggered_gradient,
    staggered_at_centers,
    staggered_at_faces,
    advect_centered,
    advect_staggered,
    resample_linear,
)
from diffphycon_tpu.physics.fluids.pressure import (
    FluidDomain,
    masked_laplacian,
    solve_pressure_cg,
    divergence_free,
)
